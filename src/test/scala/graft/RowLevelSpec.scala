package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Row-level DELETE / UPDATE (Delta statement parity): copy-on-write that
  * rewrites only the files holding matching rows, SQL NULL-verdict
  * semantics, change-feed publication, and no-op short-circuits.
  */
class RowLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-dml").toString

  test("delete removes matching rows and leaves non-matching files untouched") {
    val t = GraftTable(spark, tmp())
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val v1 = t.overwriteStats(df.repartitionByRange(4, col("id")), Seq("id"))
    val before = t.filesOf(t.manifest(v1)).map(_.path).toSet
    assert(before.size == 4)

    val v2 = t.delete("id BETWEEN 10 AND 15")
    assert(v2 == v1 + 1)
    val after = t.filesOf(t.manifest(v2)).map(_.path).toSet
    // 10..15 lives in one range file: exactly one file replaced, the
    // other three ride into v2 by reference (identical path = same file)
    assert((before & after).size == 3)
    assert((after -- before).size == 1)
    assert(t.scan.count() == 94)
    assert(t.scan.filter("id BETWEEN 10 AND 15").count() == 0)
  }

  test("row-level ops work under a table root containing a space") {
    // `_metadata.file_path` arrives percent-ENCODED (SparkPath URI), so
    // the scan-side rel path must URI-decode before stripping the root
    // prefix — without that, matchedPaths is empty and DELETE/UPDATE
    // (COW and MOR alike) silently no-op on such roots.
    val root = Files.createTempDirectory("graft dml enc").toString
    assert(root.contains(" "))
    val t = GraftTable(spark, root)
    t.overwriteStats((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(2, col("id")), Seq("id"))
    t.delete("id <= 5")                              // copy-on-write
    assert(t.scan.count() == 35)
    t.delete("id = 6", deletionVectors = Some(true)) // merge-on-read
    assert(t.scan.count() == 34)
    assert(t.fastCount == 34)
    t.update(Map("v" -> "'x'"), "id = 40")
    assert(t.scan.filter("v = 'x'").count() == 1)
  }

  test("delete keeps NULL-verdict rows; update leaves them unchanged") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, Some(1)), (2L, None), (3L, Some(9)))
      .toDF("id", "score"), Some("id"))
    t.delete("score > 5")                  // NULL > 5 is NULL → kept
    assert(t.scan.select("id").as[Long].collect().toSet == Set(1L, 2L))
    t.update(Map("score" -> "score + 100"), "score < 5") // NULL stays NULL
    val rows = t.scan.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(rows == Set((1L, Some(101)), (2L, None)))
  }

  test("no-match delete/update is a no-op: no new version, no empty commit") {
    val t = GraftTable(spark, tmp())
    val v1 = t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    assert(t.delete("id = 999") == v1)
    assert(t.update(Map("v" -> "'x'"), "id = 999") == v1)
    assert(t.latestVersion.contains(v1))
  }

  test("update applies assignments only where the condition holds, with cast") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 10L).map(i => (i, i * 10)).toDF("id", "n"), Some("id"))
    t.update(Map("n" -> "n / 2 + 0.4"), "id <= 3") // double expr cast back to long
    val got = t.scan.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 5L && got(2L) == 10L && got(3L) == 15L)
    assert((4L to 10L).forall(i => got(i) == i * 10))
  }

  test("change feed: delete rows and only-actually-changed update postimages") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "d"))
      .toDF("id", "v"), Some("id"))
    val vDel = t.delete("id = 4", changeFeed = true)
    // id=2 already holds 'b' → matching but unchanged → NOT in the feed
    val vUpd = t.update(Map("v" -> "'b'"), "id <= 2", changeFeed = true)
    val feed = t.changeFeed(sinceVersion = vDel)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(feed == Set(
      (4L, "d", "delete", vDel),
      (1L, "a", "update_preimage", vUpd),
      (1L, "b", "update_postimage", vUpd)))
  }

  test("delete preserves per-file stats so later merges keep pruning") {
    val t = GraftTable(spark, tmp())
    t.overwriteStats((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(2, col("id")), Seq("id"))
    t.delete("id = 5")
    val files = t.filesOf(t.manifest(t.latestVersion.get))
    assert(files.forall(f =>
      graft.sources.StatsPruning.fileRanges(f).contains("id")))
    // and the rewritten file's range tightened away from the deleted row
    assert(t.scan.filter("id = 5").count() == 0)
  }

  test("partitioned delete rewrites only partitions with matches") {
    val t = GraftTable(spark, tmp())
    val df = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c"), (4L, "2024-01-03", "d"))
      .toDF("id", "day", "v")
    val v1 = t.overwritePartitioned(df, Seq("day"), Seq("id"))
    val before = t.filesOf(t.manifest(v1)).map(_.path).toSet
    val v2 = t.delete("day = '2024-01-01' AND id = 1")
    val after = t.filesOf(t.manifest(v2)).map(_.path).toSet
    assert(t.scan.count() == 3)
    // the 01-02 and 01-03 files are untouched
    assert((before & after).size >= 2)
    val m = t.manifest(v2)
    assert(m.partitionCols.contains(Seq("day")))
  }

  test("delete with a txn marker replays idempotently") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), Some("id"))
    val v2 = t.delete("id <= 2", txn = Some("batch-7"), txnApp = Some("dml"))
    assert(t.txnVersion("dml", "batch-7").contains(v2))
    assert(v2 > 1 && t.scan.count() == 8)
  }

  test("cross-type delete never wrongly stats-prunes (string col vs numeric literal)") {
    val t = GraftTable(spark, tmp())
    // byte order puts "9" ABOVE "10": a bound rendered from the numeric
    // literal under the column's string stats order would prune the file
    // holding "9" even though runtime coercion (cast to number) matches it
    t.overwriteStats(Seq((1L, "9"), (2L, "50")).toDF("id", "k"), Seq("k"))
    t.delete("k < 10") // numeric compare at runtime: 9 < 10 deletes id=1
    assert(t.scan.select("id").as[Long].collect().toSet == Set(2L))
  }

  test("cross-type update never wrongly stats-prunes (timestamp col vs string literal)") {
    val t = GraftTable(spark, tmp())
    val mid = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val later = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    t.overwriteStats(Seq((1L, mid, "x"), (2L, later, "x"))
      .toDF("id", "ts", "v"), Seq("ts"))
    // the full-precision stats rendering "2024-01-01 00:00:00" byte-compares
    // ABOVE the cut "2024-01-01", but runtime coercion makes them EQUAL —
    // a byte-order bound would prune the file and skip the matching row
    t.update(Map("v" -> "'hit'"), "ts <= '2024-01-01'")
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == Map(1L -> "hit", 2L -> "x"))
  }
}
