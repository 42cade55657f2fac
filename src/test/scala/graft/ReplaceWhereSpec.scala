package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** [[GraftTable.overwriteWhere]] — Delta `replaceWhere` parity: one
  * atomic commit replacing exactly the predicate's rows, O(touched
  * files) via the DELETE pruning machinery, per-row predicate
  * enforcement on the incoming batch, change-feed publication.
  */
class ReplaceWhereSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dayTable(): GraftTable = {
    val t = GraftTable(spark, Files.createTempDirectory("graft-rw").toString)
    t.overwritePartitioned(
      (1L to 30L).map(i => (i, s"2020-01-0${(i % 3) + 1}", i * 1.0))
        .toDF("id", "day", "amt"),
      Seq("day"), Seq("id"))
    t
  }

  test("replaces exactly the matching slice in one commit") {
    val t = dayTable()
    val v = t.overwriteWhere(
      Seq((101L, "2020-01-02", 9.0), (102L, "2020-01-02", 8.0))
        .toDF("id", "day", "amt"),
      "day = '2020-01-02'")
    assert(v == 2L, "one atomic commit")
    val now = t.scan
    assert(now.filter("day = '2020-01-02'").collect().map(_.getLong(0)).toSet
      == Set(101L, 102L))
    assert(now.filter("day <> '2020-01-02'").count() == 20,
      "other slices untouched")
    assert(t.snapshotAt(1).count() == 30, "old version intact")
  }

  test("prunes: only the matching slice's files are rewritten") {
    val t = dayTable()
    val beforeFiles = t.filesOf(t.latestManifest.get).map(_.path).toSet
    t.overwriteWhere(
      Seq((200L, "2020-01-03", 1.0)).toDF("id", "day", "amt"),
      "day = '2020-01-03'")
    val afterFiles = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val untouched = beforeFiles.intersect(afterFiles)
    assert(untouched.nonEmpty,
      "files of non-matching slices must ride by reference, not rewrite: " +
        s"before=$beforeFiles after=$afterFiles")
  }

  test("incoming rows violating the predicate fail loudly, atomically") {
    val t = dayTable()
    val e = intercept[Exception](t.overwriteWhere(
      Seq((300L, "2020-01-01", 1.0), (301L, "2099-12-31", 2.0))
        .toDF("id", "day", "amt"),
      "day = '2020-01-01'"))
    assert(e.getMessage.contains("replaceWhere") ||
      e.getCause != null, e.getMessage)
    assert(t.latestManifest.get.version == 1L, "failed replace commits nothing")
    assert(t.scan.count() == 30)
  }

  test("empty batch clears the slice; no-match predicate + empty is a no-op") {
    val t = dayTable()
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "day", "amt")
    val v = t.overwriteWhere(empty, "day = '2020-01-01'")
    assert(v == 2L)
    assert(t.scan.filter("day = '2020-01-01'").count() == 0)
    assert(t.scan.count() == 20)
    // nothing matches AND nothing incoming → current version, no commit
    val v2 = t.overwriteWhere(empty, "day = '1999-01-01'")
    assert(v2 == 2L)
  }

  test("change feed publishes deletes of the old slice and inserts of the new") {
    val t = dayTable()
    t.overwriteWhere(
      Seq((400L, "2020-01-01", 5.0)).toDF("id", "day", "amt"),
      "day = '2020-01-01'", changeFeed = true)
    val feed = t.changeFeed(sinceVersion = 2L)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.get("delete").contains(10L), s"feed: $byType")
    assert(byType.get("insert").contains(1L), s"feed: $byType")
  }

  test("concurrent append into the replaced slice conflicts; disjoint lands") {
    // disjoint: an append touching OTHER slices between the replace's
    // base read and its commit must rebase cleanly (no lost rows)
    val t = dayTable()
    val racer = new Thread(() =>
      t.append(Seq((900L, "2020-01-03", 1.0)).toDF("id", "day", "amt")))
    racer.start(); racer.join()
    t.overwriteWhere(
      Seq((101L, "2020-01-02", 9.0)).toDF("id", "day", "amt"),
      "day = '2020-01-02'")
    val now = t.scan
    assert(now.filter("id = 900").count() == 1, "disjoint append survives")
    assert(now.filter("day = '2020-01-02'").count() == 1)
    // overlapping: two replaces of the SAME slice from the same base —
    // exactly one lands, the loser surfaces a conflict (its output
    // depends on the base snapshot, so a blind rebase would be wrong)
    val t2 = dayTable()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    val threads = Seq(40L, 50L).map { base =>
      new Thread(() =>
        try results.add(Right(t2.overwriteWhere(
          Seq((base, "2020-01-01", 1.0)).toDF("id", "day", "amt"),
          "day = '2020-01-01'")))
        catch { case e: Throwable => results.add(Left(e)) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (losers, winners) = results.asScala.toSeq.partition(_.isLeft)
    assert(winners.size == 1 && losers.size == 1,
      s"exactly one same-slice replace may land per base: ${results.asScala}")
    assert(t2.scan.filter("day = '2020-01-01'").count() == 1)
  }

  test("NULL-slice replace via null-safe equality") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-rwn").toString)
    t.overwrite(Seq((1L, "a"), (2L, null), (3L, null))
      .toDF("id", "grp"), Some("id"))
    t.overwriteWhere(
      Seq((20L, Option.empty[String])).toDF("id", "grp"), "grp <=> NULL")
    val now = t.scan.collect()
    assert(now.map(_.getLong(0)).toSet == Set(1L, 20L))
  }
}
