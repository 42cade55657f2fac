package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** CONVERT TO GRAFT: in-place import of an existing parquet directory —
  * no file rewritten, footer-built stats, and the converted table is a
  * full citizen (time travel, DML, merge, SQL statement surface).
  */
class ConvertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-conv").toString

  private def plainParquet(dir: String, n: Long = 1000L): Unit =
    (1L to n).map(i => (i, s"v$i", i * 1.5)).toDF("k", "v", "amt")
      .repartitionByRange(4, col("k"))
      .write.parquet(dir)

  private def listParquet(dir: String): Set[(String, Long)] = {
    val walk = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis))
        .toSet
    } finally walk.close()
  }

  test("convert in place: same files, footer stats, content identical") {
    val dir = s"${tmp()}/t"
    plainParquet(dir)
    val before = listParquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"))
    // zero rewrite: exactly the same files with the same mtimes
    assert(listParquet(dir) == before, "convert must not touch any data file")
    assert(t.scan.count() == 1000)
    assert(t.scan.agg(sum("k")).head().getLong(0) == (1L to 1000L).sum)
    // footer stats landed: every file carries a k-range, so pruning works
    val m = t.latestManifest.get
    assert(m.operation.contains("convert"))
    val files = t.filesOf(m)
    assert(files.nonEmpty && files.forall(f =>
      f.ranges.exists(_.contains("k")) || (f.min.isDefined && f.max.isDefined)))
    // range-clustered input → a point DELETE rewrites a strict subset
    val v2 = t.delete("k = 10")
    assert(v2 == 2 && t.scan.count() == 999)
    val survivors = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val originals = files.map(_.path).toSet
    assert((originals & survivors).nonEmpty,
      s"stats pruning must keep untouched imported files: $survivors")
  }

  test("converted table supports time travel, merge and streaming reads") {
    val dir = s"${tmp()}/t"
    plainParquet(dir, 100L)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"))
    t.merge(Seq((1L, "V1", 0.0), (101L, "new", 1.0)).toDF("k", "v", "amt"),
      Seq("k")).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.scan.count() == 101)
    assert(t.snapshotAt(1).count() == 100, "v1 pins the imported state")
    val got = spark.read.format("graft").load(dir)
      .filter(col("k") === 1L).head().getString(1)
    assert(got == "V1")
  }

  test("SQL statement: CONVERT TO GRAFT parquet.`path` STATS (...)") {
    val dir = s"${tmp()}/t"
    plainParquet(dir, 50L)
    val r = spark.sql(s"CONVERT TO GRAFT parquet.`$dir` STATS (k)").head()
    assert(r.getString(0) == dir && r.getLong(1) == 1L && r.getLong(2) > 0L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) == 50)
    // converting twice errors loudly
    val e = intercept[Exception](spark.sql(s"CONVERT TO GRAFT parquet.`$dir`"))
    assert(e.getMessage.contains("already a graft table"))
  }

  test("timestamp stats column falls back to the Spark pass") {
    val dir = s"${tmp()}/t"
    (1 to 200).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2026-02-${i % 28 + 1}%02d 00:00:00")))
      .toDF("k", "ts").repartitionByRange(3, col("k")).write.parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k", "ts"))
    val files = t.filesOf(t.latestManifest.get)
    assert(files.forall(_.ranges.exists(r => r.contains("k") && r.contains("ts"))),
      s"fallback pass must produce ranges for both columns: $files")
    assert(t.scan.count() == 200)
  }

  test("unknown stats column and empty directory error loudly") {
    val dir = s"${tmp()}/t"
    plainParquet(dir, 10L)
    val e1 = intercept[IllegalArgumentException](
      GraftTable.convertParquet(spark, dir, Seq("nope")))
    assert(e1.getMessage.contains("stats column"))
    val empty = s"${tmp()}/empty"
    Files.createDirectories(Paths.get(empty))
    val e2 = intercept[IllegalArgumentException](
      GraftTable.convertParquet(spark, empty))
    assert(e2.getMessage.contains("no parquet files"))
  }

  test("Hive-partitioned directory is refused, not silently de-columned") {
    val dir = s"${tmp()}/t"
    Seq((1L, "a", "2020-01-01"), (2L, "b", "2020-01-02"))
      .toDF("k", "v", "date")
      .write.partitionBy("date").parquet(dir)
    // the partition column lives in `date=.../` path segments, not the
    // leaf files — an in-place convert cannot represent it
    val e = intercept[IllegalArgumentException](
      GraftTable.convertParquet(spark, dir))
    assert(e.getMessage.contains("Hive-style partition") &&
      e.getMessage.contains("date="), e.getMessage)
  }
}
