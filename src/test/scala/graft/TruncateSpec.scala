package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** TRUNCATE TABLE / unconditioned DELETE: one metadata-only
  * empty-manifest commit — no data file read, written or deleted; old
  * versions stay readable; schema/layout/properties survive.
  */
class TruncateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-trunc").toString

  import scala.jdk.CollectionConverters._

  private def dataFileCount(root: String): Long = {
    val walk = Files.walk(Paths.get(root))
    try walk.iterator().asScala
      .count(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_graft"))
    finally walk.close()
  }

  test("TRUNCATE is metadata-only: zero files touched, history survives") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), Some("k"))
    t.append((101L to 120L).map(i => (i, s"v$i")).toDF("k", "v"), Some("k"))
    val filesBefore = dataFileCount(root)

    spark.sql(s"TRUNCATE TABLE graft.`$root`")
    assert(t.scan.count() == 0, "all rows gone")
    // METADATA-only: every data file still on disk, none added
    assert(dataFileCount(root) == filesBefore, "no data file written or deleted")
    assert(t.latestManifest.get.allFiles == 0, "empty manifest")
    assert(t.history.head.operation == "truncate")
    // old versions stay readable and restorable
    assert(spark.read.format("graft").option("versionAsOf", "2")
      .load(root).count() == 120)
    t.restore(2L)
    assert(t.scan.count() == 120, "restore resurrects the truncated data")
  }

  test("unconditioned DELETE routes to truncate; WHERE-true too") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite((1L to 50L).map(i => (i, i * 2.0)).toDF("k", "v"), Some("k"))
    spark.sql(s"DELETE FROM graft.`$root`")
    assert(t.scan.count() == 0)
    assert(t.history.head.operation == "truncate",
      "no-WHERE DELETE must take the metadata path")

    t.append(Seq((1L, 1.0)).toDF("k", "v"), Some("k"))
    spark.sql(s"DELETE FROM graft.`$root` WHERE true")
    assert(t.scan.count() == 0)
    assert(t.history.head.operation == "truncate")
    // a CONDITIONED delete still walks the row-level path
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Some("k"))
    spark.sql(s"DELETE FROM graft.`$root` WHERE k = 1")
    assert(t.scan.count() == 1)
    assert(t.history.head.operation == "delete")
  }

  test("schema, partition declaration and properties survive; append works") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwritePartitioned(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "day", "amt"),
      Seq("day"), Seq("k"))
    t.setProperty("graft.bloomFilterColumns", "k")
    t.truncate()
    assert(t.partitionCols == Seq("day"), "partition declaration survives")
    assert(t.properties.get("graft.bloomFilterColumns").contains("k"))
    assert(t.latestManifest.get.schema.contains("day"))
    // empty truncate is a no-op (same as a DELETE matching nothing)
    val v = t.latestVersion.get
    assert(t.truncate() == v, "truncate of empty table is a no-op")
    // the table keeps working: append lands under the kept layout
    t.append(Seq((3L, "c", 3.0)).toDF("k", "day", "amt"), Some("k"))
    assert(t.scan.count() == 1)
  }

  test("TRUNCATE PARTITION clears exactly the slice, atomically") {
    val t = graft.sources.GraftTable(spark, tmp())
    t.overwritePartitioned(
      (1L to 30L).map(i => (i, (i % 3).toString)).toDF("id", "part"),
      Seq("part"), Seq("id"))
    val out = spark.sql(
      s"TRUNCATE TABLE graft.`${t.root}` PARTITION (part='1')").collect()
    assert(out.head.getLong(0) == 2L, "one commit")
    assert(t.scan.filter("part = '1'").count() == 0)
    assert(t.scan.count() == 20, "other slices intact")
    assert(t.snapshotAt(1).count() == 30, "old version time-travels")
    // unknown partition column errors loudly, commits nothing
    val e = intercept[Exception](spark.sql(
      s"TRUNCATE TABLE graft.`${t.root}` PARTITION (nope='1')"))
    assert(e.getMessage.contains("nope"), e.getMessage)
    assert(t.latestManifest.get.version == 2L)
  }

  test("TRUNCATE PARTITION (k=null) clears the NULL slice; 'null' the string") {
    val t = graft.sources.GraftTable(spark, tmp())
    t.overwritePartitioned(
      Seq((1L, "a"), (2L, null), (3L, null), (4L, "null"), (5L, "b"))
        .toDF("id", "part"),
      Seq("part"), Seq("id"))
    // unquoted null → the NULL slice only; the literal string 'null' rides
    spark.sql(s"TRUNCATE TABLE graft.`${t.root}` PARTITION (part=null)")
    assert(t.scan.collect().map(_.getLong(0)).toSet == Set(1L, 4L, 5L))
    // quoted 'null' → the three-letter string slice, NULLs untouched
    t.overwritePartitioned(
      Seq((1L, "a"), (2L, null), (4L, "null")).toDF("id", "part"),
      Seq("part"), Seq("id"))
    spark.sql(s"TRUNCATE TABLE graft.`${t.root}` PARTITION (part='null')")
    assert(t.scan.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // a typed (INT) partition column with unquoted null must not try to
    // CAST('null' AS INT) — under ANSI that throws instead of matching
    val t2 = graft.sources.GraftTable(spark, tmp())
    t2.overwritePartitioned(
      Seq((1L, Some(7)), (2L, None), (3L, Some(8))).toDF("id", "bucket"),
      Seq("bucket"), Seq("id"))
    spark.sql(s"TRUNCATE TABLE graft.`${t2.root}` PARTITION (bucket=null)")
    assert(t2.scan.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("truncate(changeFeed = true) stages every live row as a delete") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"), Some("k"))
    val v = t.truncate(changeFeed = true)
    val feed = t.changeFeed(sinceVersion = v)
    val rows = feed.filter(col("_commit_version") === v).collect()
    assert(rows.length == 10 &&
      rows.forall(_.getAs[String]("_change_type") == "delete"),
      s"expected 10 delete change rows, got ${rows.length}")
  }
}
