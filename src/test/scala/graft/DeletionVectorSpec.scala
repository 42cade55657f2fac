package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Merge-on-read deletion vectors (Delta DV parity): DELETE/UPDATE that
  * rewrite NO data file, masks applied by every read funnel (snapshot,
  * time travel, the `graft` datasource / SQL scans via GraftDvMaskRule,
  * merge), stacking, materialization (compact / purge / COW / merge),
  * vacuum + clone + restore interplay, change feed rows, and the
  * concurrent-mask conflict contract.
  */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-dv").toString

  private def freshTable(n: Long = 100L, files: Int = 4): GraftTable = {
    val t = GraftTable(spark, tmp())
    val df = (1L to n).map(i => (i, s"v$i")).toDF("id", "v")
    t.overwriteStats(df.repartitionByRange(files, col("id")), Seq("id"))
    t
  }

  test("MOR delete rewrites no data file; snapshot, scan and fastCount mask") {
    val t = freshTable()
    val v1 = t.latestVersion.get
    val before = t.filesOf(t.manifest(v1)).map(_.path).toSet

    val v2 = t.delete("id BETWEEN 10 AND 15", deletionVectors = Some(true))
    assert(v2 == v1 + 1)
    val m2files = t.filesOf(t.manifest(v2))
    // every data file of v1 is still a data file of v2 — nothing rewritten
    assert(m2files.map(_.path).toSet == before)
    val masked = m2files.filter(_.dv.isDefined)
    assert(masked.size == 1 && masked.head.dvRows.contains(6L))
    assert(t.snapshot.count() == 94)
    assert(t.scan.count() == 94)
    assert(t.scan.filter("id BETWEEN 10 AND 15").count() == 0)
    assert(t.fastCount == 94) // metadata count subtracts dvRows
  }

  test("masks stack: a second MOR delete unions the file's prior entries") {
    val t = freshTable()
    t.delete("id IN (10, 11)", deletionVectors = Some(true))
    def fileCovering(id: Long) = t.filesOf(t.latestManifest.get)
      .find(f => f.min.get.toLong <= id && id <= f.max.get.toLong).get
    val dvBefore = fileCovering(10L).dv
    assert(dvBefore.isDefined)
    t.delete("id IN (12, 40)", deletionVectors = Some(true))
    val f10 = fileCovering(10L)
    assert(f10.dv != dvBefore) // pointer moved to the stacked dataset
    assert(f10.dvRows.exists(_ >= 3L)) // 10,11 + 12 (and 40 iff co-filed)
    val fs = t.filesOf(t.latestManifest.get)
    assert(fs.flatMap(_.dvRows).sum == 4L)
    assert(t.scan.count() == 96)
    assert(t.scan.filter("id IN (10,11,12,40)").count() == 0)
    assert(t.fastCount == 96)
  }

  test("stacked masks dedup entries shared across old DV datasets") {
    // op1 masks A+B into one dataset; op2 re-masks B alone, MIGRATING
    // B's op1 entries into its new dataset while A keeps the old one
    // alive (still holding B's entries); op3 masks A+B together, so B's
    // op1 entries arrive from BOTH datasets. The DV is a set — without
    // dedup B's dvRows double-counts, liveRows goes <= 0 and the
    // fully-masked filter silently drops a file that still has live
    // rows. Masks are sized so the buggy count crosses B's row count.
    val t = freshTable(100L, 2)
    val fs0 = t.filesOf(t.latestManifest.get).sortBy(_.min.get.toLong)
    val Seq(a, b) = fs0
    val am = a.min.get.toLong
    val bm = b.min.get.toLong
    assert(b.rows >= 45, s"range split put only ${b.rows} rows in B")

    t.delete(s"id = $am OR id BETWEEN $bm AND ${bm + 19}",
      deletionVectors = Some(true))          // A:1, B:20 -> shared dataset
    t.delete(s"id BETWEEN ${bm + 20} AND ${bm + 34}",
      deletionVectors = Some(true))          // B alone: +15, migrates 20
    t.delete(s"id = ${am + 1} OR id BETWEEN ${bm + 35} AND ${bm + 39}",
      deletionVectors = Some(true))          // A+B: both datasets read

    val fs = t.filesOf(t.latestManifest.get)
    // B has 40 of its rows masked but >=5 live — it MUST survive
    assert(fs.map(_.path).toSet == fs0.map(_.path).toSet)
    val bNow = fs.find(_.path == b.path).get
    assert(bNow.dvRows.contains(40L), s"B dvRows = ${bNow.dvRows}")
    assert(fs.find(_.path == a.path).get.dvRows.contains(2L))
    assert(t.scan.count() == 100L - 42L)
    assert(t.fastCount == 100L - 42L)
    // the landed dataset itself holds each (path, pos) exactly once
    val dvRel = bNow.dv.get
    val pairs = spark.read.parquet(s"${t.root}/$dvRel")
    assert(pairs.count() == pairs.dropDuplicates("path", "pos").count())
  }

  test("a fully-masked file is dropped from the manifest, not scanned") {
    val t = freshTable()
    val before = t.filesOf(t.latestManifest.get)
    // mask EXACTLY the first range file, boundary taken from its stats
    val f0 = before.minBy(_.min.get.toLong)
    t.delete(s"id BETWEEN ${f0.min.get} AND ${f0.max.get}",
      deletionVectors = Some(true))
    val after = t.filesOf(t.latestManifest.get)
    assert(after.size == before.size - 1)
    assert(!after.exists(_.path == f0.path))
    assert(t.scan.count() == 100 - f0.rows)
  }

  test("MOR update masks pre-images and appends post-image files") {
    val t = freshTable()
    val before = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val v = t.update(Map("v" -> "concat(v, '!')"), "id <= 3",
      deletionVectors = Some(true))
    val fs = t.filesOf(t.manifest(v))
    // original files all survive (one now masked) + >=1 post-image file
    assert(before.subsetOf(fs.map(_.path).toSet))
    assert(fs.exists(f => f.dv.isDefined && f.dvRows.contains(3L)))
    assert(fs.map(_.path).toSet.size > before.size)
    assert(t.scan.count() == 100)
    assert(t.scan.filter("id <= 3").select("v").as[String].collect().toSet ==
      Set("v1!", "v2!", "v3!"))
    assert(t.scan.filter("id = 50").select("v").as[String].head() == "v50")
  }

  test("time travel: the pre-delete version reads unmasked") {
    val t = freshTable()
    val v1 = t.latestVersion.get
    t.delete("id <= 50", deletionVectors = Some(true))
    assert(t.snapshotAt(v1).count() == 100)
    assert(t.snapshot.count() == 50)
    assert(spark.read.format("graft").option("versionAsOf", v1)
      .load(t.root).count() == 100)
  }

  test("SQL scans over a registered table mask, and pushdown still prunes") {
    val t = freshTable(1000L, 8)
    spark.sql(s"CREATE TABLE dv_sql_t USING graft LOCATION '${t.root}'")
    try {
      t.delete("id BETWEEN 100 AND 110", deletionVectors = Some(true))
      assert(spark.sql("SELECT count(*) FROM dv_sql_t").as[Long].head() == 989L)
      assert(spark.sql(
        "SELECT count(*) FROM dv_sql_t WHERE id BETWEEN 90 AND 120")
        .as[Long].head() == 20L)
      // manifest stats pruning survives the mask rewrite: the pushed
      // id=500 bound prunes the (still manifest-backed) data-scan side
      // to fewer than all 8 range files
      val q = spark.sql("SELECT * FROM dv_sql_t WHERE id = 500")
      q.collect()
      // AQE hides the final plan behind AdaptiveSparkPlanExec — descend
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allScans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allScans(qs.plan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        }.flatten
      val scans = allScans(q.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      val dataScanFiles = scans.map(_.metrics("numFiles").value).max
      assert(dataScanFiles < 8, s"expected pruned scan, read $dataScanFiles files")
    } finally spark.sql("DROP TABLE IF EXISTS dv_sql_t")
  }

  test("the graft.deletionVectors property routes Scala and SQL DML to MOR") {
    val t = freshTable()
    val before = t.filesOf(t.latestManifest.get).map(_.path).toSet
    spark.sql(s"ALTER TABLE graft.`${t.root}` SET TBLPROPERTIES " +
      "('graft.deletionVectors' = 'true')")
    assert(t.dvEnabled)
    t.delete("id = 1") // no explicit mode — property routes to MOR
    assert(t.filesOf(t.latestManifest.get).map(_.path).toSet == before)
    spark.sql(s"DELETE FROM graft.`${t.root}` WHERE id = 2")
    val fs = t.filesOf(t.latestManifest.get)
    assert(fs.map(_.path).toSet == before)
    assert(fs.exists(_.dvRows.contains(2L)))
    assert(t.scan.count() == 98)
    spark.sql(s"ALTER TABLE graft.`${t.root}` UNSET TBLPROPERTIES " +
      "('graft.deletionVectors')")
    assert(!t.dvEnabled)
  }

  test("REORG APPLY (PURGE) materializes only the masked files") {
    val t = freshTable()
    t.delete("id IN (3, 77)", deletionVectors = Some(true)) // two files masked
    val masked = t.filesOf(t.latestManifest.get).filter(_.dv.isDefined)
    assert(masked.size == 2)
    val untouched = t.filesOf(t.latestManifest.get)
      .filterNot(_.dv.isDefined).map(_.path).toSet
    val v = spark.sql(s"REORG TABLE graft.`${t.root}` APPLY (PURGE)")
      .as[Long].head()
    val fs = t.filesOf(t.manifest(v))
    assert(fs.forall(_.dv.isEmpty))
    assert(untouched.subsetOf(fs.map(_.path).toSet)) // clean files untouched
    assert(masked.map(_.path).toSet.intersect(fs.map(_.path).toSet).isEmpty)
    assert(t.scan.count() == 98)
    // purge with nothing masked is a version-preserving no-op
    assert(t.reorgPurge() == v)
  }

  test("compact, COW ops and merge materialize masks away") {
    val t = freshTable()
    t.delete("id <= 10", deletionVectors = Some(true))

    // COW delete on a masked file: masked rows stay deleted, DV drops
    t.delete("id = 11", deletionVectors = Some(false))
    assert(t.scan.count() == 89)
    assert(t.filesOf(t.latestManifest.get).forall(_.dv.isEmpty))

    t.delete("id BETWEEN 90 AND 95", deletionVectors = Some(true))
    // merge touching the masked file must not resurrect 90..95
    t.merge((96L to 105L).map(i => (i, s"m$i")).toDF("id", "v"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.scan.filter("id BETWEEN 90 AND 95").count() == 0)
    assert(t.scan.count() == 88)
    assert(t.filesOf(t.latestManifest.get).forall(_.dv.isEmpty))

    t.delete("id IN (20, 21)", deletionVectors = Some(true))
    t.compact(targetFileRows = 50L)
    assert(t.filesOf(t.latestManifest.get).forall(_.dv.isEmpty))
    assert(t.scan.count() == 86)
  }

  test("change feed: MOR delete/update publish the same rows as COW") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 20L).map(i => (i, i * 10)).toDF("id", "n"), Some("id"))
    val v2 = t.delete("id <= 3", changeFeed = true, deletionVectors = Some(true))
    val del = t.changeFeed(v2).filter(col("_commit_version") === v2)
    assert(del.filter("_change_type = 'delete'").select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L))
    val v3 = t.update(Map("n" -> "n + 1"), "id IN (4, 5)",
      changeFeed = true, deletionVectors = Some(true))
    val upd = t.changeFeed(v3).filter(col("_commit_version") === v3)
    assert(upd.filter("_change_type = 'update_postimage'")
      .select("n").as[Long].collect().toSet == Set(41L, 51L))
    // a no-change assignment publishes nothing (COW-parity contract)
    val v4 = t.update(Map("n" -> "n"), "id = 6",
      changeFeed = true, deletionVectors = Some(true))
    assert(t.changeFeedVersions.forall(_ != v4) ||
      t.changeFeed(v4).filter(col("_commit_version") === v4).count() == 0)
  }

  test("vacuum keeps referenced DV datasets and reclaims orphaned ones") {
    val t = freshTable()
    t.delete("id <= 5", deletionVectors = Some(true))
    val dvDir = t.filesOf(t.latestManifest.get).flatMap(_.dv).head
    // retention guard: the dataset is young, but also REFERENCED
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(Files.isDirectory(Paths.get(t.root, dvDir)))
    assert(t.scan.count() == 95)

    // purge → DV unreferenced by any kept manifest → vacuum reclaims it
    t.reorgPurge()
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(!Files.isDirectory(Paths.get(t.root, dvDir)) ||
      !Files.list(Paths.get(t.root, dvDir)).findFirst().isPresent)
    assert(t.scan.count() == 95)
  }

  test("shallow clone of a masked version stays masked; restore rewinds masks") {
    val t = freshTable()
    val v1 = t.latestVersion.get
    val v2 = t.delete("id <= 30", deletionVectors = Some(true))
    val c = t.cloneAt(v2, tmp() + "/clone")
    assert(c.scan.count() == 70)
    assert(c.scan.filter("id <= 30").count() == 0)
    // clone inherits the property file alongside the masks
    t.setProperty(GraftTable.DvProperty, "true")
    val c2 = t.cloneAt(v2, tmp() + "/clone2")
    assert(c2.dvEnabled)

    val v3 = t.restore(v1)
    assert(t.snapshotAt(v3).count() == 100) // restore re-exposes masked rows
    val v4 = t.restore(v2)
    assert(t.snapshotAt(v4).count() == 70) // and a masked version restores too
  }

  test("two masks of one file cannot silently clobber: stale-base swap conflicts") {
    val t = freshTable()
    t.delete("id = 1", deletionVectors = Some(true))
    val base = t.latestManifest.get
    t.delete("id = 2", deletionVectors = Some(true)) // moves the file's DV
    // a writer still holding `base` tries to re-mask the same file — the
    // dv-pointer move must read as remove+add, not a silent rebase
    val f = t.filesOf(base).find(_.dv.isDefined).get
    intercept[java.util.ConcurrentModificationException] {
      t.swap(Set(f.path), Seq(f.copy(dv = Some("data/bogus-dv"))),
        org.apache.spark.sql.types.StructType.fromDDL(base.schema),
        base.version, op = "delete")
    }
  }

  test("history and detail row counts are live counts under masks") {
    val t = freshTable()
    t.delete("id <= 40", deletionVectors = Some(true))
    assert(t.history.head.rows == 60L)
    assert(t.detail.select("num_rows").as[Long].head() == 60L)
  }
}
