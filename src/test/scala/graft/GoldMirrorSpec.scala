package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable
import graft.streaming.StreamingGoldMirror

/** [[StreamingGoldMirror]] — the identity-keyed silver→gold streaming
  * hop: the gold table stays an exact mirror of a tracked silver through
  * key-changing updates (the case key-paired consumers get wrong),
  * deletes, linked appends and compactions, with checkpoint-restart
  * replay safety.
  */
class GoldMirrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-goldmirror").toString

  private def rowsOf(t: GraftTable): Set[(Long, String)] =
    t.snapshot.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("gold mirror stays exact across key changes, deletes, appends, compaction") {
    val dir = tmp()
    val silver = GraftTable(spark, s"$dir/silver")
    silver.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Some("k"))
    silver.enableRowTracking()
    def drain(): Unit = {
      // a NEW mirror instance each time = a restart from the checkpoint
      val m = new StreamingGoldMirror(
        spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt")
      val q = m.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // bootstrap: initial snapshot
    val gold = GraftTable(spark, s"$dir/gold")
    assert(rowsOf(gold) == rowsOf(silver))

    // THE exactness case: a key-changing update. A key-paired mirror
    // would upsert the new key and keep the stale k=2 row forever (no
    // delete row ever arrives for it); identity merges in place.
    silver.update(Map("k" -> "20"), "k = 2", changeFeed = true)
    drain()
    assert(rowsOf(gold) == Set((1L, "a"), (20L, "b"), (3L, "c")),
      s"stale old-key row must not survive: ${rowsOf(gold)}")
    assert(gold.snapshot.count() == 3)

    // a MOR delete's feed row carries its id — the mirror drops the row
    silver.delete("k = 3", changeFeed = true, deletionVectors = Some(true))
    drain()
    assert(rowsOf(gold) == Set((1L, "a"), (20L, "b")))

    // linked appends flow as inserts with manifest-derived ids
    silver.appendWithChangeFeed(Seq((4L, "d"), (5L, "e")).toDF("k", "v"), Seq("k"))
    drain()
    assert(rowsOf(gold) == rowsOf(silver))

    // compaction publishes no change rows — the mirror must not commit
    val goldV = gold.latestVersion
    silver.compact(targetFileRows = 100L)
    drain()
    assert(gold.latestVersion == goldV,
      "a silver compaction must be invisible to the mirror")
    assert(rowsOf(gold) == rowsOf(silver))

    // a second drain with nothing new is a no-op (replay safety)
    drain()
    assert(gold.latestVersion == goldV)
  }

  test("same-commit delete+insert of one identity (key-assigning merge) nets to the live row") {
    val dir = tmp()
    val silver = GraftTable(spark, s"$dir/silver")
    silver.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"))
    silver.enableRowTracking()
    def drain(): Unit = {
      val m = new StreamingGoldMirror(
        spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt")
      val q = m.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    // a MERGE whose matched-update assigns the pk: diffFrames pairs by
    // pk, so ONE commit emits delete(k=2) + insert(k=20) BOTH carrying
    // the same _row_id. The mirror's within-commit tiebreak must let
    // the non-delete image win — the commit's net effect is the row
    // surviving under its new key, never a dropped live row.
    silver.merge(Seq((2L, 20L, "b2")).toDF("k", "nk", "nv"), Seq("k"))
      .whenMatchedUpdate(Seq("k" -> "s.nk", "v" -> "s.nv"))
      .withChangeFeed()
      .execute()
    drain()
    val gold = GraftTable(spark, s"$dir/gold")
    assert(rowsOf(gold) == Set((1L, "a"), (20L, "b2")),
      s"the delete half of a same-commit key rewrite must not win: ${rowsOf(gold)}")
    assert(rowsOf(gold) == rowsOf(silver))
  }

  test("silver ADD COLUMN mid-stream: running stream fails loudly, restart evolves gold") {
    val dir = tmp()
    val silver = GraftTable(spark, s"$dir/silver")
    silver.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"))
    silver.enableRowTracking()
    def freshMirror() = new StreamingGoldMirror(
      spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt")
    val q0 = freshMirror().start()
    try q0.processAllAvailable() finally () // keep running for the mid-flight case
    val gold = GraftTable(spark, s"$dir/gold")
    assert(gold.snapshot.columns.toSet == Set("k", "v", GraftTable.RowIdOut))

    // evolve silver mid-stream: ADD COLUMN + a merge feeding it. The
    // RUNNING stream (schema fixed at start) must fail loudly instead of
    // serving the change rows without `note` — silently dropping the new
    // column's values would diverge the mirror until the rows change again
    silver.addColumn("note", "STRING")
    silver.merge(
      Seq((2L, "b2", "n2"), (9L, "z", "n9")).toDF("k", "v", "note"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withChangeFeed().execute()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q0.processAllAvailable()
    }
    q0.stop()
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    assert(rootMsg(err).contains("restart the stream"),
      s"must name the recovery, got: ${rootMsg(err)}")

    // the failed batch was never committed: a RESTART replays it under
    // the evolved schema and the merge's clause evolution widens gold —
    // nullable backfill on pre-evolution rows, values on the new ones
    val q1 = freshMirror().start()
    try q1.processAllAvailable() finally q1.stop()
    val got = gold.snapshot.select("k", "v", "note").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b2", Some("n2")),
      (9L, "z", Some("n9"))), s"got $got")

    // identity pairing continues across the evolution: a key rewrite
    // after the ADD COLUMN still merges in place
    silver.update(Map("k" -> "20"), "k = 2", changeFeed = true)
    val q2 = freshMirror().start()
    try q2.processAllAvailable() finally q2.stop()
    val after = gold.snapshot.select("k", "v", "note").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(after == Set((1L, "a", None), (20L, "b2", Some("n2")),
      (9L, "z", Some("n9"))), s"stale old-key row must not survive: $after")
    assert(gold.snapshot.count() == 3)
  }

  test("supervised mirror heals an ADD COLUMN mid-stream with zero manual intervention") {
    val dir = tmp()
    val silver = GraftTable(spark, s"$dir/silver")
    silver.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"))
    silver.enableRowTracking()
    val m = new StreamingGoldMirror(
      spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt")
    val s = m.startSupervised()
    try {
      s.processAllAvailable() // bootstrap
      val gold = GraftTable(spark, s"$dir/gold")
      assert(gold.snapshot.columns.toSet == Set("k", "v", GraftTable.RowIdOut))

      // drift mid-stream: the raw query fails on the named stop; the
      // supervisor restarts it and the replay lands under the evolved
      // schema — the caller sees ONE successful drain, no intervention
      silver.addColumn("note", "STRING")
      silver.merge(
        Seq((2L, "b2", "n2"), (9L, "z", "n9")).toDF("k", "v", "note"), Seq("k"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
        .withChangeFeed().execute()
      s.processAllAvailable()
      assert(s.restartCount == 1, s"one drift = one restart, got ${s.restartCount}")
      val got = gold.snapshot.select("k", "v", "note").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(got == Set((1L, "a", None), (2L, "b2", Some("n2")),
        (9L, "z", Some("n9"))), s"got $got")

      // the healed stream keeps consuming normally
      silver.update(Map("k" -> "20"), "k = 2", changeFeed = true)
      s.processAllAvailable()
      assert(s.restartCount == 1, "no spurious restart on a normal batch")
      val after = gold.snapshot.select("k", "v", "note").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(after == Set((1L, "a", None), (20L, "b2", Some("n2")),
        (9L, "z", Some("n9"))), s"got $after")
    } finally s.stop()
  }

  test("supervisor propagates non-drift failures instead of restart-looping") {
    val dir = tmp()
    val silver = GraftTable(spark, s"$dir/silver")
    silver.overwrite(Seq((1L, "a")).toDF("k", "v"), Some("k"))
    silver.enableRowTracking()
    silver.update(Map("v" -> "'a2'"), "k = 1", changeFeed = true)
    val s0 = new StreamingGoldMirror(
      spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt").startSupervised()
    try s0.processAllAvailable() finally s0.stop()
    // versions land and are vacuumed while the stream is DOWN: the
    // checkpointed restart lags the retention horizon. That stop is NOT
    // mechanical-restart-recoverable (the checkpoint must be dropped /
    // startingVersion moved) — the supervisor must surface it, not burn
    // restarts on it
    silver.update(Map("v" -> "'a3'"), "k = 1", changeFeed = true)
    silver.update(Map("v" -> "'a4'"), "k = 1", changeFeed = true)
    silver.vacuum(keepVersions = 1, minAgeMs = 0L)
    val s1 = new StreamingGoldMirror(
      spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt").startSupervised()
    try {
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        s1.processAllAvailable()
      }
      def rootMsg(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      assert(rootMsg(err).contains("retention"),
        s"the named retention error must surface, got: ${rootMsg(err)}")
      assert(s1.restartCount == 0, "no restarts burned on a non-drift failure")
    } finally s1.stop()
  }

  test("mirror applies several commits for one row in one batch correctly") {
    val dir = tmp()
    val silver = GraftTable(spark, s"$dir/silver")
    silver.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"))
    silver.enableRowTracking()
    def drain(): Unit = {
      val m = new StreamingGoldMirror(
        spark, s"$dir/silver", s"$dir/gold", s"$dir/ckpt")
      val q = m.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // bootstrap the mirror on the base snapshot
    // three commits land BETWEEN drains: value update, key-change, then
    // delete of the other row — ONE tail batch carries all of them, so
    // the per-identity latest-image reduction must order across commits
    silver.update(Map("v" -> "'b2'"), "k = 2", changeFeed = true)
    silver.update(Map("k" -> "20"), "k = 2", changeFeed = true)
    silver.delete("k = 1", changeFeed = true)
    drain()
    val gold = GraftTable(spark, s"$dir/gold")
    assert(rowsOf(gold) == Set((20L, "b2")),
      s"latest image per identity must win: ${rowsOf(gold)}")
  }
}
