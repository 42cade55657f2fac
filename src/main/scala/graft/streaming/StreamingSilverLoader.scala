package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sources.GraftTable

/** The genuinely-streaming version of the NRT loop: where the reference
  * re-runs a batch notebook on a schedule (README.md:4), this subscribes
  * to the change-feed directory with Structured Streaming and merges each
  * micro-batch into the silver [[GraftTable]] via `foreachBatch` —
  * SURVEY §2.9's "Spark mapping" for the watermark protocol:
  *
  *  - offsets/progress = the streaming checkpoint (replaces the
  *    Watermarks table's role for this path),
  *  - effectively-once = checkpointed offsets + idempotent pk-merge
  *    (a replayed batch upserts the same rows),
  *  - deletes = op-aware merge, reference or corrected mode.
  *
  * Feed rows carry the entity's full payload + SYS_CHANGE_OPERATION
  * (I/U/D) — the Debezium/Delta-CDF shape. At scale the feed dir is a
  * partitioned append-only log; maxFilesPerTrigger bounds batch size.
  */
class StreamingSilverLoader(
    spark: SparkSession,
    feedDir: String,
    feedSchema: StructType,
    target: GraftTable,
    pkCols: Seq[String],
    checkpointDir: String,
    correctedDeletes: Boolean = true,
    publishChangeFeed: Boolean = false,
    // Idempotent-writer identity. MUST change together with the
    // checkpoint: batchIds restart at 0 when a checkpoint is deleted and
    // recreated, and a stale appId would make the replay guard skip the
    // re-listed batches as "already processed" — silently dropping data
    // (same contract as Delta's txnAppId). Defaulting to checkpointDir
    // ties the two for the common case of a NEW checkpoint path.
    txnAppId: Option[String] = None) {

  private def appId: String = txnAppId.getOrElse(checkpointDir)

  // one history scan per loader lifetime, then tracked in memory — the
  // guard runs on every micro-batch and a full newest-first manifest
  // scan per batch would be O(history) I/O on the hot path
  private var lastCommitted: Option[Long] = None

  def start(maxFilesPerTrigger: Int = 100): StreamingQuery =
    spark.readStream
      .schema(feedSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId)
      }
      .start()

  /** One micro-batch: dedupe to the latest op per key (a batch may carry
    * several changes for one key), audit-stamp, merge.
    */
  private[graft] def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
    // foreachBatch is at-least-once: a crash after the merge commit but
    // before the checkpoint records the offset replays this batch. The
    // table merge alone would be idempotent, but the replayed rows carry
    // a NEW SyncDateTime stamp (every row diffs as changed) and the
    // change feed would publish the batch a second time — so the commit
    // records a txn marker and replays skip here. The skip check runs
    // BEFORE the emptiness probe: it is driver-only metadata, while
    // isEmpty evaluates the batch plan — a replay must not pay for a
    // batch it is about to skip.
    if (lastCommitted.isEmpty && target.exists)
      lastCommitted = target.lastTxn(appId)
    if (lastCommitted.exists(_ >= batchId)) {
      // the skipped batch's merge committed, but a crash may have landed
      // between that commit and its change-feed publication — a replay
      // that just returns would preserve the feed gap forever. Mirror the
      // batch SilverLoader's landedAt branch: backfill from the version
      // the skipped batch committed (repair is first-wins, so racing an
      // intact feed is a no-op).
      if (publishChangeFeed)
        target.txnVersion(appId, s"$appId:$batchId")
          .foreach(v => target.repairChangeFeed(pkCols, sinceVersion = v))
      return
    }
    if (batch.isEmpty) return
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pkCols.map(col): _*)
      .orderBy(col("SYS_CHANGE_VERSION").desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "SYS_CHANGE_VERSION")
      .withColumn("SyncDateTime", current_timestamp())
      .withColumnRenamed("SYS_CHANGE_OPERATION", "SyncOperation")
    if (!target.exists) {
      target.overwriteStats(
        if (correctedDeletes) latest.filter(col("SyncOperation") =!= "D") else latest,
        Seq(pkCols.head), txn = Some(s"$appId:$batchId"), txnApp = Some(appId))
      // first load: publish the initial snapshot so a downstream hop
      // bootstrapped from readChangeStream sees the (usually largest)
      // first batch, not just subsequent deltas
      if (publishChangeFeed) target.publishInitialSnapshot()
    } else {
      val m = target.merge(latest, pkCols)
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      val m2 = if (correctedDeletes) m.whenMatchedDelete("SyncOperation = 'D'") else m
      // chain the stream: this loader's own changes become the next
      // hop's readChangeStream input (bronze→silver→gold NRT)
      (if (publishChangeFeed) m2.withChangeFeed() else m2)
        .withTxn(appId, batchId).execute()
    }
    lastCommitted = Some(batchId)
  }
}
