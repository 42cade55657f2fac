package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import graft.sources.GraftTable

/** Incremental gold-aggregate maintenance: after every cycle, the gold
  * table must equal a from-scratch GROUP BY of the silver snapshot —
  * bit-for-bit (integral measures).
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-iagg").toString

  private def goldOf(silver: GraftTable): DataFrame =
    silver.snapshot.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))

  private def assertConverged(gold: GraftTable, silver: GraftTable): Unit = {
    val got = gold.scan.select("grp", "n", "sum_cents")
      .orderBy("grp").collect().toSeq
    val want = goldOf(silver).orderBy("grp").collect().toSeq
    assert(got == want, s"gold diverged from batch GROUP BY")
  }

  test("gold tracks silver exactly across insert/update/delete cycles") {
    val silver = GraftTable(spark, tmp())
    val gold = GraftTable(spark, tmp())

    // cycle 1: bootstrap from the initial insert feed
    silver.appendWithChangeFeed(
      (1L to 300L).map(i => (i, i % 7, i * 10)).toDF("id", "grp", "cents"),
      Seq("id"))
    IncrementalAgg.applyChanges(gold, silver.changeFeed(1), Seq("grp"), Seq("cents"))
    assertConverged(gold, silver)

    // cycle 2: updates (value moves), deletes, inserts — including a
    // GROUP MOVE (id 10's grp changes), the case where the pre/post pair
    // shifts count across two groups
    val batch =
      Seq((10L, 5L, 123L, "U"), (11L, 11L % 7, 999L, "U")) ++ // 10 moves grp 3→5
        (20L to 40L).map(i => (i, i % 7, 0L, "D")) ++
        (1001L to 1020L).map(i => (i, i % 7, i, "I"))
    silver.merge(batch.toDF("id", "grp", "cents", "op"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
    IncrementalAgg.applyChanges(gold, silver.changeFeed(2), Seq("grp"), Seq("cents"))
    assertConverged(gold, silver)

    // cycle 3: delete EVERY row of grp 5 — the gold row must vanish, not
    // linger at n=0
    val grp5 = silver.snapshot.filter("grp = 5")
      .select(col("id"), col("grp"), col("cents"), lit("D").as("op"))
    silver.merge(grp5, Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
    IncrementalAgg.applyChanges(gold, silver.changeFeed(3), Seq("grp"), Seq("cents"))
    assert(gold.scan.filter("grp = 5").count() == 0,
      "a zero-count group must be deleted from gold")
    assertConverged(gold, silver)
  }

  test("randomized cycles converge (seeded)") {
    val rnd = new scala.util.Random(42)
    val silver = GraftTable(spark, tmp())
    val gold = GraftTable(spark, tmp())
    silver.appendWithChangeFeed(
      (1L to 200L).map(i => (i, i % 11, rnd.nextInt(1000).toLong))
        .toDF("id", "grp", "cents"), Seq("id"))
    IncrementalAgg.applyChanges(gold, silver.changeFeed(1), Seq("grp"), Seq("cents"))
    var nextId = 201L
    for (cycle <- 2 to 6) {
      val live = silver.snapshot.select("id").as[Long].collect().toSet.toSeq.sorted
      val upd = rnd.shuffle(live).take(20)
        .map(i => (i, rnd.nextInt(11).toLong, rnd.nextInt(1000).toLong, "U"))
      val del = rnd.shuffle(live.filterNot(upd.map(_._1).contains)).take(10)
        .map(i => (i, 0L, 0L, "D"))
      val ins = (nextId until nextId + 15)
        .map(i => (i, rnd.nextInt(11).toLong, rnd.nextInt(1000).toLong, "I"))
      nextId += 15
      silver.merge((upd ++ del ++ ins).toDF("id", "grp", "cents", "op"), Seq("id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
        .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
      IncrementalAgg.applyChanges(
        gold, silver.changeFeed(cycle.toLong), Seq("grp"), Seq("cents"))
      assertConverged(gold, silver)
    }
  }

  test("live stream maintains gold exactly once across a restart") {
    val silver = GraftTable(spark, tmp())
    val gold = GraftTable(spark, tmp())
    val ckpt = tmp()
    silver.appendWithChangeFeed(
      (1L to 100L).map(i => (i, i % 5, i)).toDF("id", "grp", "cents"),
      Seq("id"))
    val q = IncrementalAgg.maintainStream(
      gold, silver, Seq("grp"), Seq("cents"), ckpt)
    try q.processAllAvailable() finally q.stop()
    assertConverged(gold, silver)
    val vAfterBoot = gold.latestVersion.get

    // more silver changes while the stream is DOWN; a restart from the
    // same checkpoint folds exactly the missed slice
    silver.merge(
      (Seq((1L, 2L, 999L, "U"), (2L, 0L, 0L, "D")) ++
        (201L to 210L).map(i => (i, i % 5, i, "I")))
        .toDF("id", "grp", "cents", "op"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
    val q2 = IncrementalAgg.maintainStream(
      gold, silver, Seq("grp"), Seq("cents"), ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assertConverged(gold, silver)

    // idle restart: no new feed data → no gold version churn
    val vIdle = gold.latestVersion.get
    val q3 = IncrementalAgg.maintainStream(
      gold, silver, Seq("grp"), Seq("cents"), ckpt)
    try q3.processAllAvailable() finally q3.stop()
    assert(gold.latestVersion.get == vIdle,
      "an idle stream restart must not commit empty gold versions")
    assert(vAfterBoot < vIdle)
  }

  test("composite keys and multiple measures") {
    val silver = GraftTable(spark, tmp())
    val gold = GraftTable(spark, tmp())
    silver.appendWithChangeFeed(
      (1L to 100L).map(i => (i, i % 4, i % 3, i * 10, i))
        .toDF("id", "g1", "g2", "cents", "units"), Seq("id"))
    IncrementalAgg.applyChanges(
      gold, silver.changeFeed(1), Seq("g1", "g2"), Seq("cents", "units"))
    val got = gold.scan
      .select("g1", "g2", "n", "sum_cents", "sum_units")
      .orderBy("g1", "g2").collect().toSeq
    val want = silver.snapshot.groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        sum("units").as("sum_units"))
      .select("g1", "g2", "n", "sum_cents", "sum_units")
      .orderBy("g1", "g2").collect().toSeq
    assert(gold.scan.columns.toSeq ==
      Seq("g1", "g2", "n", "sum_cents", "sum_units", "nn_cents", "nn_units"))
    assert(got == want)
  }

  test("NULL measures fold exactly (all-NULL slices, NULL-only groups)") {
    val silver = GraftTable(spark, tmp())
    val gold = GraftTable(spark, tmp())
    // grp 0: only NULL measures (from-scratch sum = NULL); grp 1: mixed;
    // grp 2: all non-null
    def cents(i: Long): Option[Long] =
      if (i % 3 == 0) None
      else if (i % 3 == 1 && i % 2 == 0) None
      else Some(i * 10)
    silver.appendWithChangeFeed(
      (1L to 90L).map(i => (i, i % 3, cents(i))).toDF("id", "grp", "cents"),
      Seq("id"))
    IncrementalAgg.applyChanges(gold, silver.changeFeed(1), Seq("grp"), Seq("cents"))
    assertConverged(gold, silver)
    assert(gold.scan.filter("grp = 0").select("sum_cents")
      .collect().head.isNullAt(0),
      "an all-NULL group's running sum must be NULL, not 0")

    // cycle 2: a change slice whose rows for grp 1 ALL carry NULL
    // measures (the advisory case — sum over all-NULL is NULL and must
    // fold as +0, not poison the running sum)
    silver.merge(
      (1001L to 1010L).map(i => (i, 1L, None: Option[Long], "I"))
        .toDF("id", "grp", "cents", "op"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
    IncrementalAgg.applyChanges(gold, silver.changeFeed(2), Seq("grp"), Seq("cents"))
    assertConverged(gold, silver)
    assert(!gold.scan.filter("grp = 1").select("sum_cents")
      .collect().head.isNullAt(0),
      "an all-NULL slice must not overwrite a live sum with NULL")

    // cycle 3: delete EVERY non-null-measure row of grp 2 while leaving
    // NULL-measure rows alive — the running sum must flip back to NULL
    // (sum of zero non-null values), exactly like a from-scratch rescan
    silver.merge(
      silver.snapshot.filter("grp = 2 AND cents IS NOT NULL")
        .select(col("id"), col("grp"), col("cents"), lit("D").as("op"))
        .unionByName((2002L to 2006L).map(i => (i, 2L, None: Option[Long], "I"))
          .toDF("id", "grp", "cents", "op")), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
    IncrementalAgg.applyChanges(gold, silver.changeFeed(3), Seq("grp"), Seq("cents"))
    assertConverged(gold, silver)
    assert(gold.scan.filter("grp = 2").select("sum_cents")
      .collect().head.isNullAt(0),
      "deleting the last non-null value must return the sum to NULL")
  }
}
