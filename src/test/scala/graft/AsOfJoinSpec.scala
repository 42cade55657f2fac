package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2024-01-01 10:00:30"), 101.0),
      (3L, "B", ts("2024-01-01 10:00:10"), 50.0),
      (4L, "A", ts("2024-01-01 09:00:00"), 99.0)) // before any quote
      .toDF("trade_id", "sym", "ts", "px")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:30"), 2.0), // tie with trade 2 → matches (<=)
      ("B", ts("2024-01-01 10:00:09"), 3.0))
      .toDF("sym", "ts", "quote")

    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts")
      .select("trade_id", "quote").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(
      1L -> Some(1.0), // 10:00:00 quote
      2L -> Some(2.0), // the == ts quote wins over the 10:00:00 one
      3L -> Some(3.0),
      4L -> None))     // no quote yet → null
  }

  test("as-of attaches the whole latest right row, not per-column last non-null") {
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:10"), 1.0))
      .toDF("trade_id", "sym", "ts", "px")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:01"), java.lang.Double.valueOf(10.0), java.lang.Long.valueOf(5L)),
      ("A", ts("2024-01-01 10:00:05"), null.asInstanceOf[java.lang.Double], java.lang.Long.valueOf(7L)))
      .toDF("sym", "ts", "quote", "qty")
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts")
      .select("quote", "qty").head()
    // the latest quote row has quote=NULL, qty=7 — stitching quote=10.0
    // from the older row with qty=7 would fabricate a row that never existed
    assert(got.isNullAt(0), s"expected NULL quote from the latest row, got ${got.get(0)}")
    assert(got.getLong(1) == 7L)
  }

  test("CT extraction nets multiple changes per key to the latest (CHANGETABLE semantics)") {
    import graft.pipeline.Extractor
    val changes = Seq(
      (1L, 2L, "U"), (1L, 3L, "U"), (2L, 2L, "I"))
      .toDF("id", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
    val snapshot = Seq((1L, "one"), (2L, "two")).toDF("id", "v")
    val got = Extractor.ctExtract(changes, snapshot, Seq("id"), oldVersion = 1L)
    assert(got.count() == 2, "one net row per changed key")
    assert(got.filter(col("id") === 1L).count() == 1)
  }

  test("as-of join equals a brute-force max-subquery formulation on events") {
    val dir = "/root/testdata/sf0.001"
    val got = PipelineQueries.q35AsofJoin(spark, dir)
    // brute force: for each purchase, max signup ts <= purchase ts, then join
    val ev = Tables.table(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("pts"), col("value"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("u"), col("ts").as("sts"), col("value").as("signup_value"))
    val best = p.join(s, Seq("u"), "left")
      .filter(col("sts").isNull || col("sts") <= col("pts"))
      .groupBy("event_id").agg(max("sts").as("best_ts"))
    val want = p.join(best, Seq("event_id"), "left")
      .join(s.withColumnRenamed("sts", "best_ts"),
        Seq("u", "best_ts"), "left")
      .select(col("event_id"), col("signup_value"))
    val gotMap = got.select("event_id", "signup_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val wantMap = want.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotMap.size == wantMap.size)
    assert(gotMap == wantMap)
  }
}
