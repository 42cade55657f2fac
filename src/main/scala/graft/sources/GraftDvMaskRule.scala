package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Applies deletion-vector masks to `graft` datasource scans (the Delta
  * DV read path, re-expressed as Catalyst plan substitution): a relation
  * over a version whose manifest carries DVs is rewritten into
  *
  * {{{ scan(pinned, marked) LEFT ANTI JOIN dvEntries ON (rel, pos) }}}
  *
  * projected back to the relation's own output attributes, so every
  * consumer — `spark.sql` over registered tables, `spark.read.format
  * ("graft")`, time-travel reads, MERGE source subqueries — sees masked
  * rows without any caller opting in.
  *
  * The inner scan is still a genuine graft relation: manifest-backed
  * file listing, min/max stats pruning against pushed-down predicates,
  * Spark's vectorized parquet reader and whole-stage codegen all
  * survive (user predicates on data columns push through the anti-join
  * to the scan side; the DV side broadcasts while small and degrades to
  * a shuffled anti-join only when the mask is genuinely huge). Tables
  * without DVs match nothing here and plan exactly as before —
  * `Manifest.hasDv` is O(1) off the cached manifest, so the no-DV
  * common case pays one map lookup per analysis.
  *
  * Post-hoc resolution batch: the relation must already be resolved
  * (the rule reads its output attributes), and the substituted subtree
  * is itself fully analyzed. The `graft.dvMasked` reader option is the
  * recursion marker — the inner scan carries it, so the rule rewrites
  * each relation exactly once.
  */
class GraftDvMaskRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr: LogicalRelation if maskable(lr).isDefined =>
      val idx = maskable(lr).get
      val table = GraftTable(spark, idx.tableRoot)
      val masked = table.maskedScanDF(idx.currentManifest).queryExecution.analyzed
      // re-expose the masked plan under the relation's own attribute ids
      // so parents' references resolve unchanged
      Project(masked.output.zip(lr.output).map { case (n, o) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }, masked)
  }

  private def maskable(lr: LogicalRelation): Option[GraftFileIndex] =
    lr.relation match {
      case fsr: HadoopFsRelation => fsr.location match {
        case idx: GraftFileIndex
            if !fsr.options.keys.exists(_.equalsIgnoreCase("graft.dvMasked")) &&
              idx.currentManifest.hasDv => Some(idx)
        case _ => None
      }
      case _ => None
    }
}
