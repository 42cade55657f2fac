package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** Incremental aggregate maintenance — the NRT gold-table pattern the
  * reference's nightly rebuild approximates (ref README.md:4: silver is
  * "snapshotted over to bronze overnight"; a gold aggregate there is
  * recomputed from scratch each cycle). Here the gold table is kept
  * fresh from the silver table's STORED change feed instead: each cycle
  * folds one feed slice into per-key running aggregates, costing
  * O(changed keys) — at 100 TB silver with a few-thousand-row CDC
  * batch, the nightly full `GROUP BY` becomes a point-merge.
  *
  * Semantics: gold holds `keys..., n, sum_<m>..., nn_<m>...` where `n`
  * is the live row count of the group, `sum_<m>` the running sum of
  * each measure (avg = sum/nn downstream) and `nn_<m>` the live count
  * of NON-NULL values of that measure. The non-null count is what keeps
  * NULL semantics exact: `sum_<m>` is stored as NULL precisely when
  * `nn_<m>` is zero — the same answer a from-scratch NULL-ignoring SQL
  * `sum` gives — which a bare sum-of-deltas cannot reproduce (it cannot
  * tell "sum is 0" from "no non-null values left"). Feed rows
  * contribute signed deltas:
  * insert/update_postimage = +1, delete/update_preimage = -1 — an
  * update's pre+post pair nets to a pure value delta, an insert/delete
  * pair moves the count. A group whose count reaches zero is DELETED
  * from gold (merge delete-mode), so gold never accretes dead keys.
  *
  * Exactness: sums are computed with the MEASURE's own type. Integral
  * and decimal measures fold exactly (gold equals a from-scratch
  * `GROUP BY` bit-for-bit — spec- and oracle-verified); float/double
  * measures accumulate rounding in a different order than a full
  * rescan, which is inherent to any incremental float aggregation.
  *
  * Scale shape: one narrow groupBy of the batch (shuffle is O(batch)),
  * one pruned read of gold for the touched keys — point-ish key sets
  * push an IN-list into manifest range + bloom pruning, larger sets
  * degrade to a broadcast semi-join — then the engine's pruned merge.
  * No full gold scan, no silver scan at all.
  */
object IncrementalAgg {

  /** Ids above this collect into an `isin` pushdown; past it, the
    * touched-key read degrades to a broadcast semi-join (same contract
    * as StreamingDedupIngest's candidate lookup).
    */
  val MaxIsinKeys: Int = 10000

  /** Fold one change-feed slice (`_change_type`-carrying rows) into
    * `gold`. Bootstraps the table if it doesn't exist yet. Returns the
    * committed gold version (the current one when the slice is empty —
    * no version churn on idle cycles).
    *
    * `txn` carries an idempotent-writer identity (appId, batchVersion):
    * a replayed slice whose marker already committed is skipped — what
    * [[maintainStream]] relies on for exactly-once across restarts.
    */
  def applyChanges(
      gold: GraftTable, changes: DataFrame, keys: Seq[String],
      measures: Seq[String],
      txn: Option[(String, Long)] = None): Long = {
    require(keys.nonEmpty, "incremental aggregate needs group keys")
    val replayed = txn.exists { case (app, v) =>
      gold.exists && gold.lastTxn(app).exists(_ >= v) }
    if (replayed || changes.isEmpty)
      return gold.latestVersion.getOrElse(-1L)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(lit(0L))
    def sumName(c: String) = s"sum_$c"
    def nnName(c: String) = s"nn_$c"
    // Per measure: the signed value delta (NULL-ignoring, so an all-NULL
    // slice yields a NULL delta — folded as zero below) AND a signed
    // NON-NULL count. The count is what makes NULL semantics exact: a
    // from-scratch NULL-ignoring sum is NULL iff the group holds zero
    // non-null values, which a pure sum-of-deltas cannot distinguish
    // from a sum that happens to be 0.
    val deltaAggs = sum(col("__sign")).as("__dn") +:
      (measures.map(c => sum(col(s"`$c`") * col("__sign")).as(s"__d_$c")) ++
        measures.map(c => sum(when(col(s"`$c`").isNotNull, col("__sign"))
          .otherwise(lit(0L))).as(s"__dnn_$c")))
    val delta = changes.withColumn("__sign", sign)
      .groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)

    if (!gold.exists) {
      // bootstrap: __d_<c> is already NULL exactly when the group has no
      // non-null values (sum over an all-NULL insert slice)
      val init = delta.filter(col("__dn") > 0).select(
        keys.map(col) ++ Seq(col("__dn").as("n")) ++
          measures.map(c => col(s"__d_$c").as(sumName(c))) ++
          measures.map(c => col(s"__dnn_$c").as(nnName(c))): _*)
      return gold.overwriteStats(init, keys,
        txn = txn.map { case (a, v) => s"$a:$v" }, txnApp = txn.map(_._1))
    }

    // current gold rows for the touched keys only. A single-key batch
    // under the cap pushes an IN-list into the scan (manifest range +
    // bloom file pruning fire); otherwise a broadcast semi-join reads
    // gold once with no shuffle of the big side.
    val touched = delta.select(keys.map(col): _*).distinct()
    val current = {
      val base = gold.scan
      if (keys.size == 1) {
        val vals = touched.limit(MaxIsinKeys + 1).collect().map(_.get(0))
        if (vals.length <= MaxIsinKeys && vals.nonEmpty)
          base.filter(col(keys.head).isin(vals.toIndexedSeq: _*))
        else base.join(broadcast(touched), keys, "left_semi")
      } else base.join(broadcast(touched), keys, "left_semi")
    }

    // new absolute values per touched key; a group with no gold row
    // starts from zero. Types: n is long; each sum keeps the measure's
    // sum type (exact for integral/decimal). BOTH sides of the sum fold
    // are coalesced — a slice whose rows for a group all carry NULL
    // measures has a NULL __d_<c> (sum over all-NULL), which must fold
    // as +0, not poison the running sum to NULL. The stored sum is then
    // masked back to NULL exactly when the surviving non-null count is
    // zero, matching a from-scratch NULL-ignoring GROUP BY sum.
    val merged = delta.join(current, keys, "left").select(
      keys.map(col) ++
        Seq((coalesce(col("n"), lit(0L)) + col("__dn")).as("n")) ++
        measures.flatMap { c =>
          val dt = delta.schema(s"__d_$c").dataType
          val zero = lit(0).cast(dt)
          val nnNew = coalesce(col(s"`${nnName(c)}`"), lit(0L)) +
            col(s"`__dnn_$c`")
          val sumRaw = coalesce(col(s"`${sumName(c)}`"), zero) +
            coalesce(col(s"`__d_$c`"), zero)
          Seq(when(nnNew > 0, sumRaw).otherwise(lit(null).cast(dt))
            .as(sumName(c)))
        } ++
        measures.map { c =>
          (coalesce(col(s"`${nnName(c)}`"), lit(0L)) + col(s"`__dnn_$c`"))
            .as(nnName(c))
        }: _*)

    // one merge: surviving groups upsert, zero-count groups delete (and
    // are never inserted — merge's delete mode guarantees both)
    val mb = gold.merge(merged, keys)
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .whenMatchedDelete("n <= 0")
    txn.foreach { case (a, v) => mb.withTxn(a, v) }
    mb.execute()
  }

  /** LIVE gold maintenance: tail the silver table's stored change feed
    * as a structured stream and fold every micro-batch into `gold`
    * exactly once. Identity follows the sink convention (checkpoint-
    * keyed appId + batch id as txn version), so a crash-replayed batch
    * skips instead of double-folding, and a restart from the same
    * checkpoint resumes where it left off. The silver side needs
    * writers that publish the feed (`appendWithChangeFeed` /
    * `.withChangeFeed()` merges) — this is the streaming twin of the
    * per-cycle [[applyChanges]].
    */
  def maintainStream(
      gold: GraftTable, silver: GraftTable, keys: Seq[String],
      measures: Seq[String], checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val appId = s"gold-agg:ckpt:$checkpointDir"
    silver.readChangeStream()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyChanges(gold, batch, keys, measures, txn = Some((appId, batchId)))
        ()
      }
      .start()
  }
}
