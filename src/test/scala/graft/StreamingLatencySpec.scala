package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingLatencyBench

/** Bounds for the NRT latency harness: the numbers must be real
  * measurements (positive, ordered quantiles) and the steady-state hop
  * must stay within an order of magnitude of interactive — a regression
  * that turns the per-batch merge into an O(table) scan or breaks feed
  * discovery shows up here long before a throughput benchmark notices.
  */
class StreamingLatencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("steady-state batch-to-visible latency is measured and bounded") {
    val stats = StreamingLatencyBench.run(spark, nBatches = 6, rowsPerBatch = 50)
    assert(stats.batches == 6)
    assert(stats.bootstrap > 0.0, "bootstrap batch must be clocked")
    assert(stats.p50 > 0.0 && stats.p95 > 0.0, s"quantiles must be real: $stats")
    assert(stats.p50 <= stats.p95 && stats.p95 <= stats.max,
      s"quantiles must be ordered: $stats")
    // generous local[32] bound — steady-state file-discovery + pk-merge +
    // commit on a 50-row batch; seconds, not minutes
    assert(stats.p95 < 30.0, s"steady-state hop regressed: $stats")
  }

  test("preloaded corpus: steady-state merges into the big table, not a toy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val pre = (1L to 50000L).toDF("id")
      .withColumn("v", lit("seed"))
      .withColumn("SYS_CHANGE_VERSION", lit(0L))
      .withColumn("SYS_CHANGE_OPERATION", lit("I"))
    val stats = StreamingLatencyBench.run(
      spark, nBatches = 4, rowsPerBatch = 50, preload = Some(pre))
    assert(stats.batches == 4 && stats.p50 > 0.0)
    assert(stats.bootstrap > 0.0, "the preload bootstrap is clocked separately")
    assert(stats.p95 < 30.0, s"preloaded steady-state hop regressed: $stats")
  }
}
