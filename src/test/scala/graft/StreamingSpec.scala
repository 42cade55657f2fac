package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Streaming ≡ batch equivalence: the watermarked streaming operators
  * must converge to the batch answers once the watermark passes all data.
  * Files are appended to a monitored directory; a far-future sentinel
  * event pushes the watermark so every window/session seals.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val SentinelUser = -1L

  private def eventsAsFileRows =
    // events in the raw file shape (ts as micros NTZ since the 2026-08
    // testdata regeneration) for the stream source
    spark.read.parquet(s"$sf/events.parquet")

  private def sentinelRows(eventId: Long) =
    Seq((eventId, java.time.LocalDateTime.of(2500, 1, 1, 0, 0),
      SentinelUser, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("streaming tumbling window converges to the batch aggregate") {
    val dir = Files.createTempDirectory("graft-stream").toString
    eventsAsFileRows.write.parquet(s"$dir/batch0.parquet")
    // sentinel: one far-future event to push the watermark past all data
    // (ts as micros NTZ — the shape the generated event files carry)
    sentinelRows(999999L).write.parquet(s"$dir/sentinel.parquet")

    val stream = Streams.readEventsStream(spark, s"$dir/*.parquet")
    val q = Streams.tumblingAgg(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("tumbling_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("tumbling_out")
      .filter(col("event_type") =!= "sentinel")
      .select("window_start", "event_type", "n", "sum_value")
    val want = RelationalQueries.q12TumblingWindow(spark, sf)
      .withColumn("window_start", col("window_start").cast("timestamp"))
    assert(got.count() == want.count(), "window count mismatch")
    assert(got.exceptAll(want.select("window_start", "event_type", "n", "sum_value")).count() == 0,
      "streaming windows must equal batch windows")
  }

  test("streaming sliding window converges to the batch aggregate") {
    val dir = Files.createTempDirectory("graft-stream-slide").toString
    eventsAsFileRows.write.parquet(s"$dir/batch0.parquet")
    sentinelRows(999998L).write.parquet(s"$dir/sentinel.parquet")

    val stream = Streams.readEventsStream(spark, s"$dir/*.parquet")
    val q = Streams.slidingAgg(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sliding_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("sliding_out")
      .filter(col("event_type") =!= "sentinel")
      .select("window_start", "event_type", "n", "sum_value")
    val want = RelationalQueries.q42SlidingWindow(spark, sf)
      .withColumn("window_start", col("window_start").cast("timestamp"))
    assert(got.count() == want.count(), "window count mismatch")
    assert(got.exceptAll(want.select("window_start", "event_type", "n", "sum_value")).count() == 0,
      "streaming sliding windows must equal batch windows")
  }

  test("streaming dedup drops in-flight duplicates") {
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    // duplicate half the events (same event_id + ts)
    val base = eventsAsFileRows
    base.write.parquet(s"$dir/b0.parquet")
    base.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/b1.parquet")

    val stream = Streams.readEventsStream(spark, s"$dir/*.parquet")
    val q = Streams.dedupStream(stream, Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("dedup_out").count() == base.count(),
      "each event_id must survive exactly once")
  }

  test("stream-stream interval join matches the batch join") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    eventsAsFileRows.write.parquet(s"$dir/b0.parquet")
    // two streams from the same source: purchases join signups of the
    // same user within the preceding hour (watermarked interval join)
    def stream() = Streams.readEventsStream(spark, s"$dir/*.parquet")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 minute")
    val signups = stream().filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"), col("event_id").as("s_id"))
      .withWatermark("s_ts", "1 minute")
    val joined = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"))
      .select("p_id", "s_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val ev = Tables.table(spark, sf, "events")
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val bs = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"), col("event_id").as("s_id"))
    val want = bp.join(bs,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"))
      .select("p_id", "s_id")
    val got = spark.table("ssj_out")
    assert(got.count() == want.count(),
      s"stream-stream join rows ${got.count()} != batch ${want.count()}")
    assert(got.exceptAll(want).count() == 0)
  }

  test("stateful sessionization converges to the batch sessionize query") {
    val dir = Files.createTempDirectory("graft-sess").toString
    eventsAsFileRows.write.parquet(s"$dir/batch0.parquet")
    sentinelRows(999998L).write.parquet(s"$dir/sentinel.parquet")

    val stream = Streams.readEventsStream(spark, s"$dir/*.parquet")
      .withColumn("ts", date_trunc("second", col("ts")))
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .as[Streams.SessionEvent]
    val q = Streams.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("sessions_out")
      .filter(col("user_id") =!= SentinelUser)
      .select(col("user_id"), col("session_start").cast("timestamp_ntz"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
    val want = PipelineQueries.q31Sessionize(spark, sf)
      .select(col("user_id"), col("session_start"),
        col("n_events"), col("sum_value"))
    assert(got.count() == want.count(),
      s"session count mismatch: got ${got.count()} want ${want.count()}")
    assert(got.exceptAll(want).count() == 0,
      "streaming sessions must equal batch sessions")
  }

  test("footer probe: missing dir falls back to micros, other errors surface") {
    // an empty dir (files land later) → micros-NTZ declaration, no throw
    val empty = Files.createTempDirectory("graft-probe").toString
    val s = Streams.readEventsStream(spark, empty)
    assert(s.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)

    // a legacy long-ts dir probed from a session WITHOUT nanosAsLong must
    // fail loudly with the actionable build-time-conf message, not later
    // with an opaque parquet type error
    val legacyDir = Files.createTempDirectory("graft-probe-legacy").toString
    eventsAsFileRows
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000)
      .write.mode("overwrite").parquet(s"$legacyDir/batch0.parquet")
    val bare = spark.newSession()
    bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = intercept[IllegalStateException] {
      Streams.readEventsStream(bare, s"$legacyDir/*.parquet")
    }
    assert(e.getMessage.contains("nanosAsLong"))
  }
}
