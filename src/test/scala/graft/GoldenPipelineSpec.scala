package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ConfigStore, Entity, SilverLoader}

/** End-to-end golden replay of the reference's manual two-round scenario
  * (SURVEY §5; fixtures mirror /root/reference/dbrdemo.sql +
  * dbrDemoTransactionsData{1,2}.sql) for both watermark types, plus
  * idempotent re-run and crash recovery.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private case class Fixture(
      config: ConfigStore, loader: SilverLoader, src: String)

  private def freshPipeline(): Fixture = {
    val tmp = Files.createTempDirectory("graft-golden").toString
    val config = new ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(
      Entity(1L, "dbrDemoTransactions", "demo.dbrDemoTransactions", "src",
        "silver", "CT", None, "TransactionId"),
      Entity(2L, "dbrDemoTransactionsDt", "demo.dbrDemoTransactionsDt", "src",
        "silver", "TMSTP", Some("TransactionDatetime"), "TransactionId")))
    Fixture(config, new SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver"),
      s"$tmp/src")
  }

  // Round-1 / round-2 rows (dbrDemoTransactionsData1.sql:8-9, Data2.sql:8-9)
  private val round1 = Seq(
    (1L, "Test Tran 1", 420.69, ts("2021-01-01 10:00:00")),
    (2L, "Test Tran 2", 694.20, ts("2021-01-01 11:00:00")))
  private val round2 = round1 ++ Seq(
    (3L, "Test Tran 3", 123.45, ts("2021-01-02 10:00:00")),
    (4L, "Test Tran 4", 456.78, ts("2021-01-02 11:00:00")))
  private val cols = Seq("TransactionId", "TransactionName", "TransactionAmount", "TransactionDatetime")

  private def writeSources(f: Fixture, rows: Seq[(Long, String, Double, Timestamp)], feedVersion: Long): Unit = {
    val df = rows.toDF(cols: _*)
    df.write.mode("overwrite").parquet(s"${f.src}/dbrDemoTransactions.parquet")
    df.write.mode("overwrite").parquet(s"${f.src}/dbrDemoTransactionsDt.parquet")
    // change feed: every present row carries the version of the round that
    // inserted it (ids 1-2 → v1, ids 3-4 → v2)
    rows.map(r => (r._1, if (r._1 <= 2) 1L else 2L, "I"))
      .toDF("TransactionId", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
      .write.mode("overwrite").parquet(s"${f.src}/dbrDemoTransactions_changes.parquet")
  }

  test("two-round golden scenario: full load, then incremental merge, then no-op") {
    val f = freshPipeline()

    // round 1 → both entities full-load 2 rows, SyncOperation='I'
    writeSources(f, round1, 1L)
    val r1 = f.loader.run()
    assert(r1.map(_.action) == Seq("full", "full"))
    assert(r1.map(_.rowsExtracted) == Seq(2L, 2L))
    for (e <- f.config.entities) {
      val silver = f.loader.silverTable(e).snapshot
      assert(silver.count() == 2)
      assert(silver.select("SyncOperation").distinct().collect().map(_.getString(0)).toSeq == Seq("I"))
    }

    // round 2 → both entities incremental-load the 2 new rows → 4 total
    writeSources(f, round2, 2L)
    val r2 = f.loader.run()
    assert(r2.map(_.action) == Seq("incremental", "incremental"))
    assert(r2.map(_.rowsExtracted) == Seq(2L, 2L))
    for (e <- f.config.entities) {
      val silver = f.loader.silverTable(e).snapshot
      assert(silver.count() == 4)
      assert(silver.select("TransactionId").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    }

    // round 3 (no new data) → short-circuit, versions untouched (ref :157)
    val versionsBefore = f.config.entities.map(e => f.loader.silverTable(e).latestVersion)
    val r3 = f.loader.run()
    assert(r3.map(_.action) == Seq("skip", "skip"))
    assert(f.config.entities.map(e => f.loader.silverTable(e).latestVersion) == versionsBefore)

    // watermark audit trail: 2 closed loads per entity, none open
    val wm = f.config.watermarksTable.snapshot
    assert(wm.filter(col("LoadEndDatetime").isNull).count() == 0)
    assert(wm.count() == 4)
  }

  test("crash recovery: open watermark rows are ignored and re-extraction is idempotent") {
    val f = freshPipeline()
    writeSources(f, round1, 1L)
    f.loader.run()

    // simulate a crashed load: opened but never closed (ref :245 filter)
    f.config.openWatermark(2L, "TMSTP", "2099-01-01 00:00:00")
    val wms = f.config.entitiesWithWatermarks()
      .select("EntityId", "Watermark").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wms(2L) == "2021-01-01 11:00:00",
      "open watermark must not advance the effective mark")

    // next run re-extracts from the old mark; merge keeps it idempotent
    writeSources(f, round2, 2L)
    f.loader.run()
    for (e <- f.config.entities)
      assert(f.loader.silverTable(e).snapshot.count() == 4)
    // a second identical run must not duplicate rows either
    f.loader.run()
    for (e <- f.config.entities)
      assert(f.loader.silverTable(e).snapshot.count() == 4)
  }

  test("crash-retry of a feed-publishing load neither re-merges nor re-publishes") {
    val tmp = Files.createTempDirectory("graft-wmtxn").toString
    val config = new ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(
      Entity(2L, "dbrDemoTransactionsDt", "demo.dbrDemoTransactionsDt", "src",
        "silver", "TMSTP", Some("TransactionDatetime"), "TransactionId")))
    val f = Fixture(config,
      new SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver",
        publishChangeFeed = true), s"$tmp/src")
    writeSources(f, round1, 1L)
    f.loader.run() // v1 overwrite + initial snapshot in the feed
    writeSources(f, round2, 2L)
    f.loader.run() // v2 merge, feed published
    val e = f.config.entities.find(_.entityId == 2L).get
    val t = f.loader.silverTable(e)
    assert(t.changeFeedVersions == Seq(1L, 2L))
    val verBefore = t.latestVersion
    // the crash window: write landed, watermark never closed — the rerun
    // re-extracts the SAME range. The watermark-range txn marker makes
    // it skip the merge AND the feed publication.
    val retry = f.loader.loadEntity(e, "2021-01-01 11:00:00")
    assert(t.latestVersion == verBefore, "retry must not commit a new version")
    assert(t.changeFeedVersions == Seq(1L, 2L),
      "retry must not publish duplicate change data")
    assert(retry.version.contains(verBefore.get))
    // and the feed still reconstructs the table exactly once per row
    val applied = t.changeFeed(1).filter(col("_change_type") === "insert")
      .groupBy("TransactionId").count().filter(col("count") > 1).count()
    assert(applied == 0, "no key may appear twice as insert in the feed")
  }

  test("control-plane vacuum bounds watermark metadata across loads") {
    val f = freshPipeline()
    writeSources(f, round1, 1L)
    f.loader.run()
    writeSources(f, round2, 2L)
    f.loader.run()
    def manifests(): Int = {
      val dir = java.nio.file.Paths.get(f.config.watermarksTable.root, "_graft")
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala
        .count(_.getFileName.toString.startsWith("manifest-"))
      finally s.close()
    }
    // 2 loads × 2 entities × (open + close) = 8 versions accumulated
    assert(manifests() >= 8)
    // tighten the horizon the way a long-running orchestrator would
    // (run() itself vacuums at keepVersions=64 every cycle)
    f.config.vacuumControlPlane(keepVersions = 2, minAgeMs = 0L)
    assert(manifests() <= 2, "watermark manifest count must stay bounded")
    // the pipeline stays healthy on the truncated control plane: marks
    // unchanged, a re-run short-circuits, crash recovery still works
    val r = f.loader.run()
    assert(r.map(_.action) == Seq("skip", "skip"))
    val wm = f.config.entitiesWithWatermarks()
      .select("EntityId", "Watermark").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wm(2L) == "2021-01-02 11:00:00")
  }

  test("reference delete quirk vs corrected mode") {
    // feed a 'D' change whose key is absent from the snapshot
    val tmp = Files.createTempDirectory("graft-del").toString
    val config = new ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(
      Entity(1L, "t", "demo.t", "src", "silver", "CT", None, "TransactionId")))
    val src = s"$tmp/src"
    round1.toDF(cols: _*).write.parquet(s"$src/t.parquet")
    Seq((1L, 1L, "I"), (2L, 1L, "I"))
      .toDF("TransactionId", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
      .write.mode("overwrite").parquet(s"$src/t_changes.parquet")

    val loader = new SilverLoader(spark, config, src, s"$tmp/silver")
    loader.run() // full load

    Seq((1L, 1L, "I"), (2L, 1L, "I"), (2L, 2L, "D"))
      .toDF("TransactionId", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
      .write.mode("overwrite").parquet(s"$src/t_changes.parquet")
    // snapshot no longer contains id=2 (it was deleted upstream)
    round1.take(1).toDF(cols: _*).write.mode("overwrite").parquet(s"$src/t.parquet")
    loader.run() // reference mode: 'D' upserted as nulled row

    val e = config.entities.head
    val silver = loader.silverTable(e).snapshot
    assert(silver.count() == 2)
    val deleted = silver.filter(col("SyncOperation") === "D").collect()
    assert(deleted.length == 1 && deleted.head.getAs[Any]("TransactionName") == null,
      "reference mode upserts deletes as nulled rows (SURVEY §2.9)")

    // corrected mode on a fresh pipeline: the delete removes the row
    val tmp2 = Files.createTempDirectory("graft-del2").toString
    val config2 = new ConfigStore(spark, s"$tmp2/control")
    config2.registerEntities(Seq(
      Entity(1L, "t", "demo.t", "src", "silver", "CT", None, "TransactionId")))
    val loader2 = new SilverLoader(spark, config2, src, s"$tmp2/silver", correctedDeletes = true)
    // replay both rounds against the final feed state
    Seq((1L, 1L, "I"), (2L, 1L, "I"))
      .toDF("TransactionId", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
      .write.mode("overwrite").parquet(s"$src/t_changes.parquet")
    loader2.run()
    Seq((1L, 1L, "I"), (2L, 1L, "I"), (2L, 2L, "D"))
      .toDF("TransactionId", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
      .write.mode("overwrite").parquet(s"$src/t_changes.parquet")
    loader2.run()
    val silver2 = loader2.silverTable(config2.entities.head).snapshot
    assert(silver2.select("TransactionId").collect().map(_.getLong(0)).toSet == Set(1L),
      "corrected mode deletes the matched row")
  }
}
