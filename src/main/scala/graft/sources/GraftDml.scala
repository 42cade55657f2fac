package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.LongType

import graft.operators.RowLevel

/** SQL DML for graft tables — `DELETE FROM` / `UPDATE` / `MERGE INTO`
  * via plain `spark.sql` (the Delta statement surface behind ref
  * COPY_MSQL_TO_SILVER.py:195-196; Spark parses all three natively but
  * resolves them only for DataSource-v2 tables).
  *
  * Spark's parser produces [[DeleteFromTable]] / [[UpdateTable]] /
  * [[MergeIntoTable]]; for a v1 source the analyzer then rejects them
  * ("only supported with v2 tables"). This rule — injected in the hints
  * batch like [[GraftTimeTravelRule]], i.e. BEFORE relation resolution —
  * substitutes a runnable command when the target is a graft table
  * (registered `USING graft` identifier or a `graft.`/path`` literal)
  * and leaves every other target for Spark's own resolution.
  *
  * DELETE and UPDATE execute through [[RowLevel]] (stats-pruned
  * copy-on-write); MERGE maps onto [[graft.operators.MergeBuilder]].
  * The supported MERGE surface is the Delta-common shape the reference
  * itself uses (ref :200-209):
  *
  *   ON: a conjunction of same-named key equalities (`t.k = s.k`)
  *   WHEN MATCHED THEN UPDATE SET *            → whenMatchedUpdateAll
  *   WHEN MATCHED [AND c] THEN DELETE          → whenMatchedDelete(c)
  *   WHEN NOT MATCHED THEN INSERT *            → whenNotMatchedInsertAll
  *
  * Column-level MERGE assignments, clause conditions on UPDATE/INSERT,
  * and WHEN NOT MATCHED BY SOURCE raise a loud unsupported error at
  * parse-analysis time rather than computing something subtly different.
  */
class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case DeleteFromTable(t, cond) if graftTarget(spark, t).isDefined =>
        val (root, quals) = graftTarget(spark, t).get
        GraftDeleteCommand(root, DmlTrees(cond = Some(strip(cond, quals))))

      case UpdateTable(t, assignments, cond) if graftTarget(spark, t).isDefined =>
        val (root, quals) = graftTarget(spark, t).get
        val set = assignments.map { case Assignment(k, v) =>
          keyName(k, quals) -> strip(v, quals)
        }
        GraftUpdateCommand(root, DmlTrees(
          cond = Some(strip(cond.getOrElse(Literal.TrueLiteral), quals)),
          assigns = set))

      case MergeIntoTable(tgt, src, onCond, matched, notMatched, nmbs, _)
          if graftTarget(spark, tgt).isDefined =>
        val (root, tq) = graftTarget(spark, tgt).get
        if (nmbs.nonEmpty) throw unsupported(
          "WHEN NOT MATCHED BY SOURCE", "no by-source clause")
        val pkCols = pkColsOf(onCond)
        var updateAll = false
        var insertAll = false
        var delCond: Option[Expression] = None
        val sq = sourceQuals(src)
        matched.foreach {
          case UpdateStarAction(None) => updateAll = true
          case DeleteAction(c) =>
            val raw = c.getOrElse(Literal.TrueLiteral)
            // The builder evaluates the delete condition against the
            // SOURCE row only (the Delta-common "source says delete"
            // shape, ref :200-209). A target-qualified ref (`t.flag`)
            // would — if its qualifier were stripped — silently read the
            // source's post-image instead of the target's pre-image, so
            // it gets this file's loud unsupported error instead.
            raw.foreach {
              case a: UnresolvedAttribute if a.nameParts.length > 1 &&
                  tq.contains(a.nameParts.head.toLowerCase) =>
                throw unsupported(
                  s"WHEN MATCHED AND ... THEN DELETE condition referencing " +
                    s"the TARGET row (${a.sql})",
                  "a condition over SOURCE columns only")
              case _ => ()
            }
            delCond = Some(strip(raw, sq))
          case a => throw unsupported(s"WHEN MATCHED action $a",
            "UPDATE SET * or [AND cond] DELETE")
        }
        notMatched.foreach {
          case InsertStarAction(None) => insertAll = true
          case a => throw unsupported(s"WHEN NOT MATCHED action $a", "INSERT *")
        }
        GraftMergeCommand(root, pkCols, updateAll, insertAll,
          DmlTrees(cond = delCond, source = Some(src)))
    }
}

object GraftDml {

  /** Opaque holder for the unresolved trees a DML command carries: they
    * resolve against the LIVE table at run time, and exposing them
    * through the command's reflective `expressions` walk would fail the
    * analyzer's `resolved` check (the whole point is that these are not
    * resolvable in the statement's own plan).
    */
  case class DmlTrees(
      cond: Option[Expression] = None,
      assigns: Seq[(String, Expression)] = Nil,
      source: Option[LogicalPlan] = None)

  /** The statement target as (graft root, strippable qualifiers) when —
    * and only when — it is a graft table; None sends the statement to
    * Spark's own (v2) resolution untouched.
    */
  private[graft] def graftTarget(
      spark: SparkSession, p: LogicalPlan): Option[(String, Set[String])] = {
    val (rel, alias) = p match {
      case SubqueryAlias(id, u: UnresolvedRelation) => (u, Some(id.name))
      case u: UnresolvedRelation => (u, None)
      case _ => return None
    }
    GraftSqlParser.rootOfParts(spark, rel.multipartIdentifier).map { root =>
      val quals = (alias.toSeq ++ rel.multipartIdentifier.lastOption.toSeq)
        .map(_.toLowerCase).toSet
      (root, quals)
    }
  }

  /** Drop a leading alias/table qualifier so the tree resolves against
    * the raw table scan (`t.v` → `v`); unqualified refs pass through.
    */
  private[graft] def strip(e: Expression, quals: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
          quals.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  private[sources] def keyName(k: Expression, quals: Set[String]): String =
    strip(k, quals) match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => a.nameParts.head
      case other => throw unsupported(s"UPDATE SET target $other",
        "a plain column name")
    }

  /** MERGE ON → MergeBuilder pk columns: each conjunct must equate the
    * SAME column name on both sides (the builder joins by name).
    */
  private[sources] def pkColsOf(cond: Expression): Seq[String] =
    RowLevel.splitConjunctive(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw unsupported(s"MERGE ON conjunct $other",
        "same-named key equalities (t.k = s.k [AND ...])")
    }

  private[sources] def sourceQuals(p: LogicalPlan): Set[String] = p match {
    case SubqueryAlias(id, child) =>
      Set(id.name.toLowerCase) ++ sourceQuals(child)
    case u: UnresolvedRelation =>
      u.multipartIdentifier.lastOption.map(_.toLowerCase).toSet
    case _ => Set.empty
  }

  private[sources] def unsupported(what: String, want: String) =
    new IllegalArgumentException(
      s"unsupported for graft tables: $what (supported: $want)")

  private[graft] val versionOutput: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
}

/** `DELETE FROM <graft table> [WHERE cond]` → [[RowLevel.deleteExpr]];
  * returns the committed version (unchanged when nothing matched).
  */
case class GraftDeleteCommand(root: String, trees: GraftDml.DmlTrees)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable(spark, root)
    Seq(Row(RowLevel.deleteExpr(t,
      trees.cond.get, changeFeed = false, None, None, mor = t.dvEnabled)))
  }
}

/** `UPDATE <graft table> SET ... [WHERE cond]` → [[RowLevel.updateExpr]]. */
case class GraftUpdateCommand(root: String, trees: GraftDml.DmlTrees)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable(spark, root)
    Seq(Row(RowLevel.updateExpr(t,
      trees.assigns, trees.cond.get, changeFeed = false, None, None,
      mor = t.dvEnabled)))
  }
}

/** `MERGE INTO <graft table> USING <source> ON ... WHEN ...` →
  * [[graft.operators.MergeBuilder]]. The source plan (relation or
  * subquery) analyzes at run time through [[PlanBridge.ofRows]].
  */
case class GraftMergeCommand(
    root: String, pkCols: Seq[String], updateAll: Boolean,
    insertAll: Boolean, trees: GraftDml.DmlTrees)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val source = PlanBridge.ofRows(spark, trees.source.get)
    var b = GraftTable(spark, root).merge(source, pkCols)
    if (updateAll) b = b.whenMatchedUpdateAll()
    if (insertAll) b = b.whenNotMatchedInsertAll()
    trees.cond.foreach(c => b = b.whenMatchedDelete(
      org.apache.spark.sql.graftbridge.ColumnBridge.toColumn(c)))
    Seq(Row(b.execute()))
  }
}
