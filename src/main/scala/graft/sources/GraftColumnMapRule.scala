package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Column-mapping read path (Delta column-mapping parity, re-expressed
  * as Catalyst plan substitution): a `graft` relation whose manifest
  * carries a logical→physical column mapping serves its files' PHYSICAL
  * schema (that is what the vectorized parquet reader must request), and
  * this rule aliases it back to the LOGICAL names every consumer speaks:
  *
  * {{{ Project(physical_i AS logical_i, scan(physical, marked)) }}}
  *
  * Runs in the MAIN resolution batch (fixpoint): the substituted Project
  * introduces the logical attribute names, and the analyzer's later
  * iterations resolve user references against them. User predicates push
  * straight through the Project (alias substitution), arriving at the
  * scan under physical names — which is exactly how the manifest keys
  * file/chunk min-max stats and bloom sidecars, so pruning, parquet
  * pushdown and whole-stage codegen all survive a rename untouched.
  *
  * Identity tables (no rename ever — `Manifest.mapping` empty) match
  * nothing here and plan exactly as before. The `graft.physicalNames`
  * reader option is the recursion marker: the rewritten scan carries it,
  * so each relation is wrapped exactly once. [[GraftDvMaskRule]] (post-
  * hoc) later sees the marked PHYSICAL relation and masks it
  * position-for-position — alias and anti-join compose.
  */
class GraftColumnMapRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr: LogicalRelation if mappable(lr).isDefined =>
      val (fsr, idx) = mappable(lr).get
      val logical = StructType.fromDDL(idx.currentManifest.schema)
      val marked = lr.copy(relation = fsr.copy(
        options = fsr.options + (GraftColumnMapRule.Marker -> "true"))(spark))
      // alias BY NAME, not position: a pv relation's output is
      // dataSchema ++ partitionSchema, which can reorder columns
      // relative to the logical schema (schema evolution lands new
      // columns around the partition block) — a positional zip would
      // silently serve one column's values under another's name
      val m = idx.currentManifest
      val byPhys = marked.output.map(a => a.name.toLowerCase -> a).toMap
      Project(logical.fields.toIndexedSeq.map { lf =>
        val po = byPhys.getOrElse(m.physicalOf(lf.name).toLowerCase,
          throw new IllegalStateException(
            s"graft column mapping: physical column " +
              s"${m.physicalOf(lf.name)} (logical ${lf.name}) missing " +
              s"from scan output ${marked.output.map(_.name).mkString(", ")}"))
        Alias(po, lf.name)()
      }, marked)
  }

  private def mappable(lr: LogicalRelation): Option[(HadoopFsRelation, GraftFileIndex)] =
    lr.relation match {
      case fsr: HadoopFsRelation => fsr.location match {
        case idx: GraftFileIndex
            if !fsr.options.keys.exists(_.equalsIgnoreCase(GraftColumnMapRule.Marker)) &&
              idx.currentManifest.mapping.nonEmpty => Some((fsr, idx))
        case _ => None
      }
      case _ => None
    }
}

object GraftColumnMapRule {
  /** Reader-option recursion marker: "this scan deliberately serves
    * physical names" (set by the rule itself, or by an internal reader
    * that wants the raw physical relation).
    */
  val Marker = "graft.physicalNames"
}
