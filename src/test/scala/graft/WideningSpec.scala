package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftTable, BloomSkipping}

/** ALTER COLUMN TYPE — lossless type widening as a metadata-only commit
  * (Delta type-widening parity). Old files keep their narrow physical
  * encoding; Spark 4's parquet reader up-casts at scan time; new writes
  * land wide. Nothing is rewritten — at 100 TB that is the whole point.
  */
class WideningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-widen").toString

  test("int->long widen: metadata-only, both eras readable, stats prune") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.overwriteStats((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v")), Seq("k"))
    val filesBefore = t.filesOf(t.latestManifest.get).map(_.path).toSet

    val v = spark.sql(s"ALTER TABLE graft.`${t.root}` ALTER COLUMN k TYPE BIGINT")
      .head().getLong(0)
    assert(v == 2)
    // not one data file touched
    assert(t.filesOf(t.latestManifest.get).map(_.path).toSet == filesBefore)
    // live schema is wide; old values read exactly
    assert(t.scan.schema("k").dataType == LongType)
    assert(t.scan.agg(sum("k")).head().getLong(0) == 5050L)
    // appends land values only the wide type can hold; eras mix in one scan
    t.appendStats(Seq((4_000_000_000L, "big")).toDF("k", "v"), Seq("k"))
    assert(t.scan.count() == 101)
    assert(t.scan.filter(col("k") > Int.MaxValue.toLong).count() == 1)
    // range pruning still works across the boundary: a point DELETE in
    // the narrow era rewrites a strict subset of files
    val all = t.filesOf(t.latestManifest.get).map(_.path).toSet
    t.delete("k = 7")
    val after = t.filesOf(t.latestManifest.get).map(_.path).toSet
    assert((all & after).nonEmpty, "stats pruning must survive the widen")
    // time travel: the pre-widen version still reads (and is narrow)
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(t.root)
    assert(v1.schema("k").dataType == IntegerType)
    assert(v1.count() == 100)
  }

  test("decimal growth, date->timestamp_ntz, float->double all read back") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.overwrite(
      spark.sql(
        """SELECT CAST(1.50 AS DECIMAL(5,2)) d, DATE'2020-01-02' dt,
          |CAST(2.5 AS FLOAT) f""".stripMargin))
    spark.sql(s"ALTER TABLE graft.`${t.root}` ALTER COLUMN d TYPE DECIMAL(12,4)")
    spark.sql(s"ALTER TABLE graft.`${t.root}` ALTER COLUMN dt TYPE TIMESTAMP_NTZ")
    spark.sql(s"ALTER TABLE graft.`${t.root}` CHANGE COLUMN f TYPE DOUBLE")
    val r = t.scan.head()
    assert(r.getDecimal(0) == new java.math.BigDecimal("1.5000"))
    assert(r.getAs[java.time.LocalDateTime](1) ==
      java.time.LocalDateTime.of(2020, 1, 2, 0, 0))
    assert(r.getDouble(2) == 2.5)
    assert(t.history.count(_.operation == "widen column") == 3)
  }

  test("narrowing and lossy changes refuse loudly") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.overwrite(spark.sql(
      "SELECT CAST(1 AS BIGINT) k, CAST(1.5 AS DECIMAL(10,2)) d, 'x' s"))
    for (bad <- Seq(
        "ALTER COLUMN k TYPE INT",           // narrowing
        "ALTER COLUMN s TYPE BIGINT",        // string -> numeric
        "ALTER COLUMN d TYPE DECIMAL(10,4)", // loses integer digits
        "ALTER COLUMN k TYPE DECIMAL(18,0)", // bigint needs 20 digits
        "ALTER COLUMN k TYPE DOUBLE"))       // not exact for all longs
      intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`${t.root}` $bad")
      }
    // same-type no-op refuses too (nothing to commit)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`${t.root}` ALTER COLUMN k TYPE BIGINT")
    }
    assert(t.latestVersion.contains(1L), "no refused change may commit")
  }

  test("widen sheds stale bloom sidecars (hash domain changed), stays correct") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.setProperty(GraftTable.BloomProperty, "k")
    t.overwriteStats((1 to 50).map(i => (i, i * 2)).toDF("n", "j")
      .select(col("n").cast("int").as("k"), col("j")), Seq("n"))
    val m0 = t.latestManifest.get
    assert(t.filesOf(m0).forall(_.bloom.isDefined), "fixture needs sidecars")
    spark.sql(s"ALTER TABLE graft.`${t.root}` ALTER COLUMN k TYPE BIGINT")
    // every sidecar indexed the widened column -> every ref must drop:
    // XxHash64(int x) != XxHash64(long x), so a kept sidecar would
    // unsoundly SKIP files on post-widen point probes
    assert(t.filesOf(t.latestManifest.get).forall(_.bloom.isEmpty))
    // and the point probe that would have hit the stale bloom is correct
    assert(t.scan.filter(col("k") === 17L).count() == 1)
    // future writes rebuild sidecars under the wide type
    t.appendStats(Seq((9_000_000_000L, 1)).toDF("k", "j"), Seq("k"))
    val fresh = t.filesOf(t.latestManifest.get).filter(_.bloom.isDefined)
    assert(fresh.nonEmpty)
    assert(t.scan.filter(col("k") === 9_000_000_000L).count() == 1)
  }

  test("widening a pv partition column of a converted table") {
    val dir = s"${tmp()}/t"
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 10)).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"), Seq("p" -> "INT"))
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN p TYPE BIGINT")
    // pv values live as strings in file metadata; they re-parse wide
    assert(t.scan.schema("p").dataType == LongType)
    assert(t.scan.filter(col("p") === 10L).count() == 2)
    assert(spark.sql(s"SHOW PARTITIONS graft.`$dir`").collect()
      .map(_.getString(0)).toSeq == Seq("p=10", "p=20"))
    // and DML keeps routing through the pv funnel afterwards
    t.delete("p = 20")
    assert(t.scan.count() == 2)
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
  }
}
