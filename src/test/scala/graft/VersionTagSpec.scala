package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftTable}

/** Version tags (Iceberg-style named refs): pin a table version under a
  * stable name — the training-data reproducibility primitive. Tags
  * resolve everywhere a version does, and protect their version from
  * vacuum until dropped.
  */
class VersionTagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-tag").toString

  test("tags resolve through Scala, reader option and SQL time travel") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 50L).map(i => (i, s"a$i")).toDF("id", "v"), Some("id"))
    t.createTag("train-v1")
    t.overwrite((1L to 10L).map(i => (i, s"b$i")).toDF("id", "v"), Some("id"))
    assert(t.tags == Map("train-v1" -> 1L))
    // Scala
    assert(t.snapshotAt("train-v1").count() == 50)
    // reader option
    assert(spark.read.format("graft")
      .option("versionAsOf", "train-v1").load(t.root).count() == 50)
    // SQL VERSION AS OF 'tag' on a registered table
    GraftCatalog.register(spark, "demo", "tag_t", t)
    assert(spark.sql(
      "SELECT count(*) FROM demo.tag_t VERSION AS OF 'train-v1'")
      .head().getLong(0) == 50)
    assert(spark.sql("SELECT count(*) FROM demo.tag_t").head().getLong(0) == 10)
  }

  test("a tag pins its version through vacuum; dropping it releases it") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 40L).map(i => (i, s"a$i")).toDF("id", "v"), Some("id"))
    t.createTag("pinned") // v1
    t.overwrite((1L to 40L).map(i => (i, s"b$i")).toDF("id", "v"), Some("id"))
    t.overwrite((1L to 40L).map(i => (i, s"c$i")).toDF("id", "v"), Some("id"))
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    // v2 (untagged, superseded) is gone; v1 (tagged) survives intact
    intercept[Exception] { t.snapshotAt(2L).count() }
    assert(t.snapshotAt("pinned").filter(col("v") === "a7").count() == 1)
    assert(t.snapshotAt("pinned").count() == 40)
    // dropping the tag releases the version to the next vacuum
    t.deleteTag("pinned")
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    intercept[Exception] { t.snapshotAt(1L).count() }
    assert(t.snapshot.count() == 40) // latest untouched
  }

  test("SQL surface: CREATE TAG / SHOW TAGS / DROP TAG") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    t.append(Seq((2L, "b")).toDF("id", "v"), Some("id"))
    spark.sql(s"ALTER TABLE graft.`${t.root}` CREATE TAG base AS OF VERSION 1")
    spark.sql(s"ALTER TABLE graft.`${t.root}` CREATE TAG tip")
    val shown = spark.sql(s"SHOW TAGS graft.`${t.root}`")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(shown == Seq(("base", 1L), ("tip", 2L)))
    spark.sql(s"ALTER TABLE graft.`${t.root}` DROP TAG base")
    assert(t.tags == Map("tip" -> 2L))
  }

  test("RESTORE and SHALLOW CLONE accept tag refs") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 20L).map(i => (i, s"a$i")).toDF("id", "v"), Some("id"))
    t.createTag("golden")
    t.overwrite(Seq((1L, "junk")).toDF("id", "v"), Some("id"))
    // clone the tagged snapshot (Scala ref overload)
    val c = t.cloneAt("golden", tmp())
    assert(c.snapshot.count() == 20)
    // SQL clone from the tag
    val cloneRoot = tmp() + "/c2"
    spark.sql(s"CREATE TABLE graft.`$cloneRoot` SHALLOW CLONE " +
      s"graft.`${t.root}` VERSION AS OF 'golden'")
    assert(GraftTable(spark, cloneRoot).snapshot.count() == 20)
    // SQL restore to the tag
    spark.sql(s"RESTORE TABLE graft.`${t.root}` TO VERSION AS OF 'golden'")
    assert(t.snapshot.count() == 20)
    assert(t.snapshot.filter("v = 'junk'").count() == 0)
  }

  test("tag guards: duplicates, digits-only names, unknown refs") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    t.createTag("x")
    intercept[IllegalArgumentException](t.createTag("x"))
    intercept[IllegalArgumentException](t.createTag("123")) // shadows versions
    intercept[IllegalArgumentException](t.deleteTag("nope"))
    intercept[IllegalArgumentException](t.resolveVersionRef("ghost"))
    intercept[Exception](t.createTag("dead", Some(99L))) // unknown version
  }
}
