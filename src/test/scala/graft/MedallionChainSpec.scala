package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ConfigStore, Entity, SilverLoader, SimulatedCrash, SyncRunner}
import graft.sources.GraftTable
import graft.streaming.StreamingGoldMirror

/** The FULL medallion chain as one pipeline (ref README.md:4):
  * source → silver (watermark-protocol loader) → gold (identity-keyed
  * streaming mirror, re-keyed so the gold is itself tracked) → mart
  * (durable-cursor sync) — two load rounds with a CRASH in every hop,
  * asserting end-state equality across all three stores. Each hop's
  * crash safety is specced in isolation elsewhere; this witnesses the
  * guarantees COMPOSING.
  */
class MedallionChainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val cols = Seq(
    "TransactionId", "TransactionName", "TransactionAmount", "TransactionDatetime")
  private val round1 = Seq(
    (1L, "Test Tran 1", 420.69, ts("2021-01-01 10:00:00")),
    (2L, "Test Tran 2", 694.20, ts("2021-01-01 11:00:00")))
  private val round2 = round1 ++ Seq(
    (3L, "Test Tran 3", 123.45, ts("2021-01-02 10:00:00")),
    (4L, "Test Tran 4", 456.78, ts("2021-01-02 11:00:00")))

  private def writeSource(src: String, rows: Seq[(Long, String, Double, Timestamp)]): Unit =
    rows.toDF(cols: _*).write.mode("overwrite")
      .parquet(s"$src/dbrDemoTransactionsDt.parquet")

  private def payload(df: DataFrame, idCol: String): Set[(Long, Long, String, Double)] =
    df.select(col(idCol), col("TransactionId"), col("TransactionName"),
      col("TransactionAmount"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  test("source→silver→gold→mart with a crash per hop: all three stores equal") {
    val tmp = Files.createTempDirectory("graft-medallion").toString
    val config = new ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(
      Entity(2L, "dbrDemoTransactionsDt", "demo.dbrDemoTransactionsDt", "src",
        "silver", "TMSTP", Some("TransactionDatetime"), "TransactionId")))
    // the mart hop keeps its own control plane (the gold zone's cursor
    // store) — its entity is not a loader source
    val martConfig = new ConfigStore(spark, s"$tmp/control-gold")
    martConfig.registerEntities(Seq(
      Entity(99L, "gold", "mart.gold", "gold", "mart", "CT", None, "_row_id")))
    val loader = new SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver",
      publishChangeFeed = true, rowTracking = true)

    // ---- round 1 through all three hops ----
    writeSource(s"$tmp/src", round1)
    loader.run()
    val silverRoot = s"$tmp/silver/demo.dbrDemoTransactionsDt"
    val silver = GraftTable(spark, silverRoot)
    assert(silver.latestManifest.exists(_.rowTracking), "loader enables tracking")

    // gold re-keys the silver identity to a NON-reserved column, so the
    // gold can be tracked of its own and serve the next hop
    def freshMirror() = new StreamingGoldMirror(
      spark, silverRoot, s"$tmp/gold", s"$tmp/ckpt",
      storedIdCol = Some("silver_sk"))
    val sup1 = freshMirror().startSupervised()
    sup1.processAllAvailable() // gold bootstrap
    sup1.stop()
    val gold = GraftTable(spark, s"$tmp/gold")
    gold.enableRowTracking()
    val mart = GraftTable(spark, s"$tmp/mart")
    new SyncRunner(spark, martConfig, gold, mart, 99L).runOnce() // mart bootstrap

    assert(payload(silver.snapshotWithRowIds(), GraftTable.RowIdOut) ==
      payload(gold.snapshot, "silver_sk"))
    assert(payload(gold.snapshot, "silver_sk") == payload(mart.snapshot, "silver_sk"))

    // ---- round 2, crashing every hop ----
    writeSource(s"$tmp/src", round2)
    loader.run() // silver merges rows 3-4, feed published

    // HOP-1 CRASH: write landed, watermark close dropped — the rerun
    // re-extracts the same range; the txn marker skips merge AND feed
    val e = config.entities.find(_.entityId == 2L).get
    val silverVer = silver.latestVersion
    val feedVs = silver.changeFeedVersions
    loader.loadEntity(e, "2021-01-01 11:00:00") // the crash-window replay
    assert(silver.latestVersion == silverVer, "replay must not re-merge")
    assert(silver.changeFeedVersions == feedVs, "replay must not re-publish")

    // HOP-2: drain the tail, then CRASH between the gold merge and the
    // checkpoint's batch commit — drop the last commit-log entry and
    // restart; the replayed batch must hit the txn-marker guard
    val sup2 = freshMirror().startSupervised()
    sup2.processAllAvailable()
    sup2.stop()
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete(), "simulate: offsets written, commit lost")
    // the local checksum FS keeps a .crc sidecar; a stale one makes the
    // replay's commit rewrite look like a concurrent writer
    new java.io.File(s"$tmp/ckpt/commits/.${commits.last.getName}.crc").delete()
    val goldVer = gold.latestVersion
    val sup3 = freshMirror().startSupervised()
    sup3.processAllAvailable() // replays the batch; marker skips re-apply
    sup3.stop()
    assert(gold.latestVersion == goldVer, "replayed batch must not double-apply")

    // HOP-3 CRASH: sync merge lands, cursor close dropped — resume
    // re-syncs idempotently from the old cursor
    val runner = new SyncRunner(spark, martConfig, gold, mart, 99L)
    intercept[SimulatedCrash] { runner.runOnceImpl(crashBeforeClose = true) }
    val r = new SyncRunner(spark, martConfig, gold, mart, 99L).runOnce()
    assert(r.action == "incremental")

    // ---- end state: the three stores agree exactly ----
    val s = payload(silver.snapshotWithRowIds(), GraftTable.RowIdOut)
    val g = payload(gold.snapshot, "silver_sk")
    val m = payload(mart.snapshot, "silver_sk")
    assert(s.map(_._2) == Set(1L, 2L, 3L, 4L))
    assert(s == g, s"silver vs gold:\n$s\n$g")
    assert(g == m, s"gold vs mart:\n$g\n$m")
    assert(silver.snapshot.count() == 4 && gold.snapshot.count() == 4 &&
      mart.snapshot.count() == 4)
  }

  test("retry after a crash between first write and tracking enablement finishes the enable") {
    val tmp = Files.createTempDirectory("graft-medallion2").toString
    val config = new ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(
      Entity(2L, "dbrDemoTransactionsDt", "demo.dbrDemoTransactionsDt", "src",
        "silver", "TMSTP", Some("TransactionDatetime"), "TransactionId")))
    writeSource(s"$tmp/src", round1)
    // the "crashed" first load: marker landed, tracking never enabled
    val untracked = new SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver",
      publishChangeFeed = true, rowTracking = false)
    untracked.run()
    val silver = GraftTable(spark, s"$tmp/silver/demo.dbrDemoTransactionsDt")
    assert(!silver.latestManifest.exists(_.rowTracking))
    // the retry (same watermark range) takes the landed-marker branch —
    // it must complete the enablement instead of skipping it forever
    val tracked = new SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver",
      publishChangeFeed = true, rowTracking = true)
    val e = config.entities.head
    tracked.loadEntity(e, graft.pipeline.Extractor.TmstpDefault)
    assert(silver.latestManifest.exists(_.rowTracking),
      "the landed-marker retry must finish the tracking enablement")
  }
}
