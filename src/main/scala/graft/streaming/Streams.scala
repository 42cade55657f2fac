package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.9 extension): the reference
  * achieves NRT by re-running a batch notebook; this module provides the
  * genuinely streaming equivalents — watermarked tumbling-window
  * aggregation and stateful sessionization — over the same event shape.
  *
  * Scale: state is partitioned by the grouping key across executors;
  * watermarks bound state size (late events beyond the allowance are
  * dropped), so state per executor is O(active keys), not O(stream).
  */
object Streams {

  /** The events-table schema in the LEGACY raw file shape (parquet
    * TIMESTAMP(NANOS), which Spark reads as a nanos long under
    * `nanosAsLong` — see graft.Tables for the batch-side handling).
    */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The events-table schema in the plain micros-NTZ shape (what
    * Spark-written event files carry, and what the driver's generator
    * emits from 2026-08 on).
    */
  val eventsFileSchemaMicros: StructType = StructType(
    eventsFileSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))

  /** File-source stream of events with a proper event-time column.
    * A stream's schema must be declared up front, and the event files
    * exist in two shapes (legacy TIMESTAMP(NANOS)-as-long vs micros
    * NTZ) — one batch footer probe of the same path picks the right
    * declaration; both arrive as a session-zone timestamp (UTC-pinned),
    * so downstream watermarks/windows are shape-independent.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val legacyNanos =
      try spark.read.parquet(dir).schema.fields
        .exists(f => f.name == "ts" && f.dataType == LongType)
      catch {
        // ONLY a missing/empty path falls back to the micros-NTZ
        // declaration (the shape the driver's generator emits from
        // 2026-08 on — the documented default for dirs that fill later).
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("PATH_NOT_FOUND") ||
                c.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          false
        // Legacy TIMESTAMP(NANOS) files probed WITHOUT the nanosAsLong
        // session conf make inference itself fail — surface the
        // actionable build-time-conf message instead of the opaque
        // parquet type error.
        case e: Exception
            if Option(e.getMessage).exists(_.toUpperCase.contains("NANOS")) =>
          graft.GraftSession.requireNanosAsLong(spark); throw e
      }
    if (legacyNanos) {
      graft.GraftSession.requireNanosAsLong(spark)
      spark.readStream.schema(eventsFileSchema).parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else
      spark.readStream.schema(eventsFileSchemaMicros).parquet(dir)
        .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Watermarked event-time window aggregation shared by the tumbling
    * and sliding variants (one agg/output contract, so they cannot
    * drift).
    */
  private def windowedAgg(
      events: DataFrame, size: String, slide: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.OracleMath.stableSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked tumbling-window aggregation — the streaming twin of the
    * batch q12 (counts + value sums per hour × event_type).
    */
  def tumblingAgg(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    windowedAgg(events, "1 hour", "1 hour", lateness)

  /** Watermarked sliding (hopping) window aggregation — the streaming
    * twin of the batch q42 (1-hour windows every 30 minutes).
    */
  def slidingAgg(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    windowedAgg(events, "1 hour", "30 minutes", lateness)

  /** Streaming exact dedup: drops repeated keys in-flight; the watermark
    * bounds the dedup state (keys older than the allowance are forgotten,
    * so state is O(keys within the watermark window), not O(stream)).
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
      tsCol: String = "ts", lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicates(keys :+ tsCol)

  // ---- stateful sessionization ----

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSessions(sessions: Seq[(Long, Long, Long, Double)]) // start,last,n,sum
  case class SessionOut(
      user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, sum_value: Double)

  /** Sessionize a stream per user with an inactivity gap: sessions are
    * held in [[GroupState]] and emitted once the event-time watermark
    * passes their end + gap (i.e. they can no longer grow).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapSeconds: Long = 1800L,
      lateness: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[OpenSessions]) =>
          val gapMs = gapSeconds * 1000L
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          // fold new events into the open session set: an event may land
          // in ANY open session (in-allowance late data), not just the
          // latest — find its session by range, extend it, and merge
          // sessions the extension bridges. Lists are tiny (open sessions
          // per key), so the linear scan is fine.
          val incoming = it.toSeq.sortBy(_.ts.getTime)
          var sessions = prior.sortBy(_._1)
          for (e <- incoming) {
            val t = e.ts.getTime
            val i = sessions.indexWhere { case (st, last, _, _) =>
              t >= st - gapMs && t <= last + gapMs
            }
            sessions =
              if (i >= 0) {
                val (st, last, n, sum) = sessions(i)
                sessions.updated(i,
                  (math.min(st, t), math.max(last, t), n + 1, sum + e.value))
              } else {
                (sessions :+ ((t, t, 1L, e.value))).sortBy(_._1)
              }
            // merge adjacent sessions the new event may have bridged
            sessions = sessions.foldLeft(List.empty[(Long, Long, Long, Double)]) {
              case (acc :+ prev, cur) if cur._1 - prev._2 <= gapMs =>
                acc :+ ((prev._1, math.max(prev._2, cur._2),
                  prev._3 + cur._3, prev._4 + cur._4))
              case (acc, cur) => acc :+ cur
            }
          }
          // emit sessions the watermark has sealed; keep the rest
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = sessions.partition { case (_, last, _, _) =>
            last + gapMs < wm
          }
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            state.setTimeoutTimestamp(open.map(_._2).max + gapMs + 1)
          }
          closed.iterator.map { case (st, _, n, sum) =>
            SessionOut(userId, new java.sql.Timestamp(st), n, sum)
          }
      }
  }
}
