package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.sources.GraftTable

/** End-to-end NRT latency measurement: the reference's whole point is
  * near-real-time arrival (its loop re-runs a batch notebook on a
  * schedule, so its floor is the schedule period), while this engine's
  * floor is the streaming pipeline itself — feed-file discovery by the
  * file source, micro-batch planning, pk-merge, manifest commit. This
  * harness measures that floor: it writes N single-file feed batches,
  * and for each one clocks `feed file landed → merge commit visible`
  * (visibility = the batch's txn marker readable from the table's commit
  * log, i.e. the moment a reader sees the rows).
  *
  * The bootstrap batch (table creation) is excluded from the quantiles —
  * it measures overwrite, not the steady-state hop — but reported
  * separately. Batches are written only after the previous one lands, so
  * each sample isolates one hop of the bronze→silver chain rather than
  * queueing effects; this is the per-batch latency number, not a
  * throughput run.
  */
object StreamingLatencyBench {

  /** p50/p95 over the steady-state batches + the bootstrap latency. */
  case class LatencyStats(
      p50: Double, p95: Double, max: Double, bootstrap: Double, batches: Int)

  private def quantile(sorted: Seq[Double], q: Double): Double =
    if (sorted.isEmpty) -1.0
    else sorted(math.min(sorted.size - 1, (q * sorted.size).toInt))

  /** `preload`: an (id, v, SYS_CHANGE_VERSION, SYS_CHANGE_OPERATION)
    * corpus served as batch 0 — the steady-state hop then merges into a
    * TABLE OF THAT SIZE, making the latency number scale-dependent (the
    * synthetic default's table is ~rowsPerBatch rows, which proves the
    * pipeline floor but nothing about merging into an sf-sized silver).
    * Steady batches update the LOW end of the key space, so the merge's
    * stats/bloom pruning — not a full rewrite — is what's on the clock,
    * the honest NRT hot path.
    */
  def run(spark: SparkSession, nBatches: Int = 12, rowsPerBatch: Int = 100,
      timeoutMs: Long = 60000,
      preload: Option[org.apache.spark.sql.DataFrame] = None): LatencyStats = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream-lat").toString
    val (feedDir, ckpt, tableRoot) = (s"$tmp/feed", s"$tmp/ckpt", s"$tmp/table")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("SYS_CHANGE_VERSION", LongType),
      StructField("SYS_CHANGE_OPERATION", StringType)))
    val target = GraftTable(spark, tableRoot)
    val loader = new StreamingSilverLoader(
      spark, feedDir, schema, target, Seq("id"), ckpt)
    Files.createDirectories(java.nio.file.Paths.get(feedDir))
    val query = loader.start()
    val appId = ckpt // loader defaults txnAppId to the checkpoint dir
    try {
      val lats = (0 until nBatches).map { b =>
        // steady-state update pattern: each batch upserts the same key
        // range with a new version — the incremental-merge hot path
        val batch =
          if (b == 0 && preload.isDefined) preload.get.coalesce(8)
          else (0 until rowsPerBatch)
            .map(i => (i.toLong + 1, s"b$b-$i", b.toLong,
              if (b == 0) "I" else "U"))
            .toDF("id", "v", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
            .coalesce(1)
        batch.write.mode("append").parquet(feedDir)
        val t0 = System.nanoTime()
        val deadline = t0 + timeoutMs * 1000000L
        // visibility: the batch's idempotence marker is in the commit log,
        // so any subsequent reader sees the merged rows
        while (target.txnVersion(appId, s"$appId:$b").isEmpty) {
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"streaming batch $b not visible after ${timeoutMs}ms")
          Thread.sleep(5)
        }
        (System.nanoTime() - t0) / 1e9
      }
      val steady = lats.drop(1).sorted
      LatencyStats(quantile(steady, 0.50), quantile(steady, 0.95),
        if (steady.nonEmpty) steady.last else -1.0, lats.head, nBatches)
    } finally {
      query.stop()
      query.awaitTermination(10000)
    }
  }
}
