package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Stored change feed (Delta CDF + readStream parity): merges run with
  * `.withChangeFeed()` land row-level changes under `_changes/`, batch
  * readers slice by commit version, and a file-source stream tails the
  * directory across commits.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cdf").toString

  test("stored change feed equals the after-the-fact version diff") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), Some("id"))
    t.merge(
      Seq((2L, "b2", "U"), (4L, "d", "I"), (3L, "c", "D"))
        .toDF("id", "v", "op"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'")
      .withChangeFeed().execute()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "_change_type").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    val stored = canon(t.changeFeed(sinceVersion = 2))
    val diffed = canon(t.changesBetween(1, 2, Seq("id")))
    assert(stored == diffed)
    assert(stored.exists(_._3 == "insert") && stored.exists(_._3 == "delete") &&
      stored.exists(_._3 == "update_postimage"))
    // the commit version rides every stored row
    assert(t.changeFeed(2).select("_commit_version").distinct().head().getLong(0) == 2L)
  }

  test("change stream tails changes across successive merges") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), Some("id"))
    t.merge(Seq((1L, "u1"), (11L, "n11")).toDF("id", "v"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withChangeFeed().execute() // v2
    val q = t.readChangeStream()
      .writeStream.outputMode("append")
      .format("memory").queryName("cdf_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_out").count() == 2)
      // a merge landing AFTER the stream started is picked up too
      t.merge(Seq((2L, "u2")).toDF("id", "v"), Seq("id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
        .withChangeFeed().execute() // v3
      q.processAllAvailable()
      val rows = spark.table("cdf_out")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, "update_postimage", 2L), (11L, "insert", 2L),
        (2L, "update_postimage", 3L)))
    } finally q.stop()
  }

  test("vacuum ages out old change-feed versions") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    t.merge(Seq((2L, "b")).toDF("id", "v"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withChangeFeed().execute() // v2
    t.merge(Seq((3L, "c")).toDF("id", "v"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withChangeFeed().execute() // v3
    assert(t.changeFeedVersions == Seq(2L, 3L))
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.changeFeedVersions == Seq(3L),
      "v2's change data must age out with its version")
    assert(t.changeFeed(1L).select("id").head().getLong(0) == 3L)
  }
}
