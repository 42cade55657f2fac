package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregates (Delta OptimizeMetadataOnlyQuery parity):
  * a global `count(*)` — and `min`/`max` of stats-covered columns —
  * over an unfiltered graft scan is answered from the MANIFEST, zero
  * data files opened. At 100 TB this is the difference between a
  * sub-millisecond catalog read and a full-table scan for the most
  * common monitoring query there is.
  *
  * Soundness gates:
  *  - grouping must be empty, no filter anywhere under the aggregate
  *    (only column-pruning Projects and aliases are walked through);
  *  - `count` must be the literal `count(*)`/`count(1)` form — never
  *    `count(col)` (null counts are not in the manifest) and never
  *    DISTINCT / FILTER variants;
  *  - `min`/`max` only for integral and date columns (their manifest
  *    stat strings round-trip exactly; parquet writers may TRUNCATE
  *    string stats, which would fabricate a max that is not a value),
  *    only when EVERY live file — inline entries and chunk refs alike,
  *    no chunk is opened — carries a range for the column, and never
  *    on a DV-carrying snapshot (a deletion vector may mask the
  *    extreme row; such plans are rewritten to anti-joins by
  *    [[GraftDvMaskRule]] before this rule could even match, the guard
  *    here is belt-and-braces). Row counts are DV-aware by
  *    construction ([[Manifest.allRows]] sums live rows).
  *
  * Column mapping is handled by walking the alias Project
  * [[GraftColumnMapRule]] inserts: the attribute chain resolves each
  * aggregated logical column back to the PHYSICAL name the stats are
  * keyed by.
  */
class GraftMetadataAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if grouping.isEmpty && aggExprs.nonEmpty =>
      unwrap(child) match {
        case Some((index, byExprId)) =>
          val m = index.currentManifest
          val values = aggExprs.map(answer(_, m, byExprId))
          if (values.forall(_.isDefined))
            LocalRelation(
              agg.output, Seq(InternalRow.fromSeq(values.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** Walk pass-through nodes down to a graft relation; returns the file
    * index plus (exprId -> physical column name) for every attribute
    * visible at the top of the walked chain.
    */
  private def unwrap(plan: LogicalPlan)
      : Option[(GraftFileIndex, Map[Long, String])] = plan match {
    case SubqueryAlias(_, inner) => unwrap(inner)
    case Project(projectList, inner) =>
      unwrap(inner).flatMap { case (idx, inMap) =>
        // only alias/attr projections are transparent; any computed
        // column means this is not a bare scan
        val out = projectList.map {
          case a: AttributeReference =>
            inMap.get(a.exprId.id).map(a.exprId.id -> _)
          case Alias(ar: AttributeReference, _) =>
            // the column-map Project: logical alias over physical attr
            inMap.get(ar.exprId.id) match {
              case Some(phys) => Some(-1L -> phys) // re-keyed below
              case None => None
            }
          case _ => None
        }
        if (out.exists(_.isEmpty)) None
        else {
          val keyed = projectList.zip(out.map(_.get)).map {
            case (ne, (_, phys)) => ne.exprId.id -> phys
          }.toMap
          Some((idx, keyed))
        }
      }
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, isStreaming, _)
        if !isStreaming && fs.location.isInstanceOf[GraftFileIndex] =>
      val idx = fs.location.asInstanceOf[GraftFileIndex]
      // relation attrs carry the PHYSICAL names (GraftFileIndex serves
      // the physical schema; pv partition attrs are identity-named)
      Some((idx, lr.output.map(a => a.exprId.id -> a.name).toMap))
    case _ => None
  }

  /** Answer one aggregate output from the manifest; None = not
    * answerable (the whole rewrite is then abandoned).
    */
  private def answer(
      ne: org.apache.spark.sql.catalyst.expressions.NamedExpression,
      m: Manifest, byExprId: Map[Long, String]): Option[Any] = ne match {
    case Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null => Some(m.allRows)
        case Min(ar: AttributeReference) => extremum(m, byExprId, ar, lo = true)
        case Max(ar: AttributeReference) => extremum(m, byExprId, ar, lo = false)
        case _ => None
      }
    case _ => None
  }

  /** Exact min/max of a column from per-file + per-chunk stat ranges —
    * integral/date only, full coverage required, no DVs.
    */
  private def extremum(
      m: Manifest, byExprId: Map[Long, String],
      ar: AttributeReference, lo: Boolean): Option[Any] = {
    val exactTypes: PartialFunction[DataType, Unit] = {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: DateType =>
    }
    if (!exactTypes.isDefinedAt(ar.dataType)) return None
    if (m.hasDv) return None
    val phys = byExprId.getOrElse(ar.exprId.id, return None)
    // a pv partition column's values live in pv metadata, not ranges —
    // its min/max comes from the per-file tuples instead
    val pvCol = m.partitionCols.getOrElse(Nil)
      .find(_.equalsIgnoreCase(phys)).filter(_ => m.hasPv)

    val fileVals: Seq[String] = pvCol match {
      case Some(c) =>
        val vs = m.files.map(_.pv.flatMap(_.collectFirst {
          case (k, v) if k.equalsIgnoreCase(c) => v
        }))
        // NULL-slice values and chunked pv files make the extremum
        // unknowable without opening chunks — bail
        if (m.chunks.getOrElse(Nil).nonEmpty) return None
        if (vs.exists(v => v.isEmpty ||
          v.contains(GraftTable.HiveDefaultPartition))) return None
        vs.flatten
      case None =>
        val inline = m.files.map(f => StatsPruning.fileRanges(f).get(phys))
        if (inline.exists(_.isEmpty)) return None
        val chunks = m.chunks.getOrElse(Nil)
          .map(r => StatsPruning.chunkRanges(r).get(phys))
        if (chunks.exists(_.isEmpty)) return None
        (inline.flatten ++ chunks.flatten).map(r => if (lo) r._1 else r._2)
    }
    if (fileVals.isEmpty) return None // zero-file table — NULL would be
    // the true answer, but abandoning is simpler and just as sound
    ar.dataType match {
      case _: DateType =>
        // pv partition values are VERBATIM Hive directory names, which
        // CONVERT imports may leave unpadded (`day=2024-9-5`) — there
        // lexicographic order is NOT date order ('2024-9-5' > '2024-10-01').
        // Cast every candidate to the internal day count FIRST and
        // compare the casted values; any non-castable stat abandons.
        val casted = fileVals.map { v =>
          Option(Cast(Literal(UTF8String.fromString(v), StringType),
            ar.dataType, Some(java.time.ZoneOffset.UTC.getId))
            .eval(InternalRow.empty)).map(_.asInstanceOf[Int])
        }
        if (casted.exists(_.isEmpty)) return None
        val days = casted.flatten
        Some(if (lo) days.min else days.max)
      case _ =>
        // exact comparison: BigDecimal for the integral family (the
        // generic stats cmp goes through Double and loses precision
        // past 2^53)
        def cmpExact(a: String, b: String): Int =
          BigDecimal(a).compare(BigDecimal(b))
        val best =
          try fileVals.reduce((a, b) => if ((cmpExact(a, b) <= 0) == lo) a else b)
          catch { case _: NumberFormatException => return None }
        // string → internal value through Spark's own cast (exact for
        // the gated types); a corrupt stat abandons the rewrite
        Option(Cast(Literal(UTF8String.fromString(best), StringType),
          ar.dataType, Some(java.time.ZoneOffset.UTC.getId)).eval(InternalRow.empty))
    }
  }
}
