package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** COPY INTO (idempotent per-file parquet onboarding append) and DEEP
  * CLONE (byte-copy backup clone).
  */
class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cpy").toString

  test("fast path: matching schema links files in, footers-only, stats kept") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"), Some("k"))
    // source dir written by a vanilla Spark job, same schema
    (51L to 90L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(s"$dir/incoming")

    val v = spark.sql(
      s"COPY INTO graft.`$dir/t` FROM parquet.`$dir/incoming` STATS (k)")
      .head().getLong(0)
    assert(v == 2L)
    assert(t.scan.count() == 90)
    assert(t.history.head.operation == "append")
    // footer path: the new entries carry ranges for pruning
    val m = t.latestManifest.get
    val imported = t.filesOf(m).filter(_.path.startsWith("imports-"))
    assert(imported.size == 2 &&
      imported.forall(_.ranges.exists(_.contains("k"))), s"$imported")
    // the source directory's own files are untouched
    assert(spark.read.parquet(s"$dir/incoming").count() == 40)

    // IDEMPOTENT: a re-run copies nothing and commits nothing
    val v2 = t.copyInto(s"$dir/incoming", Seq("k"))
    assert(v2 == v && t.scan.count() == 90, "re-run must be a no-op")
    // a GROWN directory copies only the new files
    Seq((91L, 91.0)).toDF("k", "v").write.mode("append")
      .parquet(s"$dir/incoming")
    t.copyInto(s"$dir/incoming", Seq("k"))
    assert(t.scan.count() == 91)
  }

  test("general path: casting by name, NULL backfill; extra columns loud") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a", 1.5)).toDF("k", "v", "amt"), Some("k"))
    // source has k (as INT, needs cast) and v but no amt, different order
    Seq((2, "b"), (3, "c")).toDF("k", "v")
      .select("v", "k").write.parquet(s"$dir/in2")
    t.copyInto(s"$dir/in2", Seq("k"))
    val rows = t.scan.orderBy("k").collect()
    assert(rows.length == 3)
    assert(rows(2).getLong(0) == 3L && rows(2).isNullAt(2),
      "cast by name + NULL backfill for the missing column")
    // extra source column errors loudly
    Seq((4L, "d", 9, 9)).toDF("k", "v", "amt", "nope").write.parquet(s"$dir/in3")
    val e = intercept[IllegalArgumentException](t.copyInto(s"$dir/in3"))
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("superseded import links vacuum away; live ones and sources survive") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 20L).map(i => (i, "base")).toDF("k", "v"), Some("k"))
    (21L to 40L).map(i => (i, "imp")).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(s"$dir/incoming")
    t.copyInto(s"$dir/incoming", Seq("k"))
    def importLinks(): Seq[java.nio.file.Path] = {
      val w = Files.walk(Paths.get(s"$dir/t"))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(p => Files.isRegularFile(p) &&
          p.toString.contains("imports-") &&
          p.toString.endsWith(".parquet")).toSeq
      } finally w.close()
    }
    assert(importLinks().size == 2)
    // rewrite the whole imported range: both import links superseded
    t.merge((21L to 40L).map(i => (i, "new")).toDF("k", "v"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    // age the import dir past the cutoff (its mtime guards in-flight
    // copies; the test simulates time passing)
    Files.list(Paths.get(s"$dir/t")).forEach { p =>
      if (p.getFileName.toString.startsWith("imports-"))
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 10000))
    }
    t.vacuum(keepVersions = 1, minAgeMs = 1000L)
    assert(importLinks().isEmpty, "superseded import links must vacuum")
    // the user's source directory is untouched and the table intact
    assert(spark.read.parquet(s"$dir/incoming").count() == 20)
    assert(t.scan.count() == 40)
    assert(t.scan.filter(col("v") === "new").count() == 20)
  }

  test("DEEP CLONE owns independent bytes; SQL form registers") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 30L).map(i => (i, s"x$i")).toDF("k", "v"), Some("k"))
    t.append(Seq((31L, "y")).toDF("k", "v"), Some("k"))
    spark.sql("CREATE DATABASE IF NOT EXISTS cpy")
    spark.sql("DROP TABLE IF EXISTS cpy.deep_t")
    spark.sql(
      s"""CREATE TABLE cpy.deep_t DEEP CLONE graft.`$dir/t`
         |LOCATION '$dir/deep'""".stripMargin)
    val d = GraftTable(spark, s"$dir/deep")
    assert(d.scan.count() == 31)
    // independent bytes: no data file of the clone shares an inode with
    // the source (hard-link count == 1), unlike a shallow clone
    val deepFiles = d.filesOf(d.latestManifest.get)
    assert(deepFiles.forall { f =>
      Files.getAttribute(
        Paths.get(d.root, f.path), "unix:nlink").asInstanceOf[Int] == 1
    }, "deep clone files must not be hard links")
    val s2 = t.cloneAt(t.latestVersion.get, s"$dir/shallow")
    assert(s2.filesOf(s2.latestManifest.get).forall { f =>
      Files.getAttribute(
        Paths.get(s2.root, f.path), "unix:nlink").asInstanceOf[Int] >= 2
    }, "shallow clone files share inodes")
    // a post-clone change to the source never reaches the deep clone
    t.delete("k <= 10")
    assert(t.scan.count() == 21 && d.scan.count() == 31)
  }

  test("COPY INTO a Hive-converted (pv) table lands tuple-pure files") {
    val dir = tmp()
    // converted table: partition values live in file metadata
    (1L to 60L).map(i => (i, s"v$i", (i % 3).toInt))
      .toDF("k", "v", "p").repartition(2)
      .write.partitionBy("p").parquet(s"$dir/t")
    val t = GraftTable.convertParquet(spark, s"$dir/t", Seq("k"),
      Seq("p" -> "INT"))
    assert(t.latestManifest.get.hasPv)
    // incoming files carry the partition column AS DATA (exactly the
    // schema the table declares) — the link path would land plain files
    // a pv relation cannot serve; the funnel must route them through
    // the pv write instead
    (61L to 80L).map(i => (i, s"v$i", (i % 3).toInt))
      .toDF("k", "v", "p").write.parquet(s"$dir/incoming")
    val before = t.filesOf(t.latestManifest.get).map(_.path).toSet
    t.copyInto(s"$dir/incoming", Seq("k"))
    val m = t.latestManifest.get
    assert(m.hasPv)
    // every live file — old and copied — carries its partition tuple
    assert(t.filesOf(m).forall(_.pv.isDefined),
      "COPY INTO a pv table must never land plain (value-carrying) files")
    assert(t.filesOf(m).map(_.path).toSet != before)
    // both read paths serve the partition column for ALL rows
    assert(t.scan.count() == 80 && t.snapshot.count() == 80)
    assert(t.scan.filter(col("p").isNull).count() == 0)
    assert(t.scan.filter(col("p") === 1).count() ==
      (1L to 80L).count(_ % 3 == 1))
    assert(t.scan.filter(col("k") === 70L).head().getInt(2) == (70 % 3))
    // idempotence holds on the pv path too
    val v = t.latestManifest.get.version
    assert(t.copyInto(s"$dir/incoming", Seq("k")) == v)
    assert(t.scan.count() == 80)
  }
}
