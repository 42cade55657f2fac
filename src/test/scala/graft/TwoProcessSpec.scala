package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ConfigStore
import graft.sources.GraftTable

/** Cross-PROCESS end-to-end: two real JVMs (spawned via ProcessBuilder,
  * each with its own SparkSession) drive the SAME control root and
  * silver table concurrently. The in-JVM thread tests prove the commit
  * algebra; this proves the claims that only hold across processes —
  * watermark ids stay disjoint with no coordinator (the id IS the
  * version its hard-link put-if-absent commit wins,
  * ControlPlane.openWatermark), concurrent merges on disjoint key
  * ranges rebase rather than conflict (GraftTable.swap), and no reader
  * ever sees a torn manifest.
  */
class TwoProcessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // same list as build.sbt — the spawned JVMs create SparkSessions
  // outside spark-submit, which normally injects these
  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs share one control plane and silver table without torn state") {
    val tmp = Files.createTempDirectory("graft-2proc").toString
    val tableRoot = s"$tmp/silver"
    val controlRoot = s"$tmp/control"
    val nOps = 3

    // seed clustered on id so each worker's key range lands in its own
    // files (what lets the file-level conflict check pass both merges)
    val seed = ((1000L until 1050L) ++ (2000L until 2050L))
      .map(i => (i, "seed")).toDF("id", "v")
    val t = GraftTable(spark, tableRoot)
    t.overwriteStats(seed.repartitionByRange(4, col("id")), Seq("id"))

    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    def launch(id: Int): Process = {
      val cmd = Seq(java) ++ jdk17AddOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.ProcessWorker",
        tableRoot, controlRoot, s"$tmp/w$id.json", id.toString, nOps.toString)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$tmp/worker-$id.log"))
        .start()
    }
    val p1 = launch(1)
    val p2 = launch(2)
    def logTail(id: Int): String = {
      val f = Paths.get(s"$tmp/worker-$id.log")
      if (Files.exists(f)) Files.readString(f).takeRight(2000) else "<no log>"
    }
    assert(p1.waitFor(300, TimeUnit.SECONDS), s"worker 1 timed out\n${logTail(1)}")
    assert(p2.waitFor(300, TimeUnit.SECONDS), s"worker 2 timed out\n${logTail(2)}")
    assert(p1.exitValue() == 0, s"worker 1 failed\n${logTail(1)}")
    assert(p2.exitValue() == 0, s"worker 2 failed\n${logTail(2)}")

    def idsOf(path: String): Seq[Long] = {
      val s = Files.readString(Paths.get(path))
      """"ids":\[([0-9,]*)\]""".r.findFirstMatchIn(s).get.group(1)
        .split(",").map(_.toLong).toSeq
    }
    val ids1 = idsOf(s"$tmp/w1.json")
    val ids2 = idsOf(s"$tmp/w2.json")
    assert(ids1.size == nOps && ids2.size == nOps)
    assert((ids1.toSet & ids2.toSet).isEmpty,
      s"watermark ids must be cross-process unique: $ids1 vs $ids2")

    // control plane: every open was closed, ids match the workers' view
    val wm = new ConfigStore(spark, controlRoot).watermarksTable.snapshot
    assert(wm.count() == 2 * nOps)
    assert(wm.filter(col("LoadEndDatetime").isNull).count() == 0,
      "every watermark must be closed")
    assert(wm.select("WatermarkId").collect().map(_.getLong(0)).toSet ==
      (ids1 ++ ids2).toSet)

    // silver table: both workers' final rounds landed, nothing torn
    val snap = t.snapshot
    assert(snap.count() == 100)
    val byWorker = snap.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(byWorker.filter(_._1 < 2000L).forall(_._2 == s"w1-r$nOps"))
    assert(byWorker.filter(_._1 >= 2000L).forall(_._2 == s"w2-r$nOps"))
    // every version in history parses and reads — no torn manifest
    val latest = t.latestVersion.get
    assert(latest == 1L + 2 * nOps, "all six merges must have committed")
    (1L to latest).foreach(v => t.manifest(v))
    assert(t.fastCountAt(latest) == 100)
    // replay markers from both processes are detectable via the index
    assert(t.txnVersion("worker:1", s"worker:1:$nOps").isDefined)
    assert(t.txnVersion("worker:2", s"worker:2:$nOps").isDefined)
  }

  /** The merge-merge conflict matrix, cross-process and DETERMINISTIC: a
    * filesystem barrier makes both JVMs pin the same base version before
    * either commits (ProcessWorker's free-running rounds leave actual
    * overlap to the scheduler), so each matrix cell's outcome is forced.
    */
  private def runConflictMatrix(mode: String): (String, Long, String, Long) = {
    val tmp = Files.createTempDirectory(s"graft-conflict-$mode").toString
    val tableRoot = s"$tmp/table"
    // two range-clustered files: [0,100) and [1000,1100) — worker key
    // ranges resolve to distinct files (disjoint) or the same file (overlap)
    val seed = ((0L until 100L) ++ (1000L until 1100L))
      .map(i => (i, "seed")).toDF("id", "v")
    GraftTable(spark, tableRoot)
      .overwriteStats(seed.repartitionByRange(2, col("id")), Seq("id"))

    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    def launch(id: Int): Process = {
      val cmd = Seq(java) ++ jdk17AddOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.ConflictWorker",
        tableRoot, tmp, s"$tmp/c$id.json", id.toString, mode)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$tmp/conflict-$id.log"))
        .start()
    }
    val p1 = launch(1)
    val p2 = launch(2)
    def logTail(id: Int): String = {
      val f = Paths.get(s"$tmp/conflict-$id.log")
      if (Files.exists(f)) Files.readString(f).takeRight(2000) else "<no log>"
    }
    assert(p1.waitFor(300, TimeUnit.SECONDS), s"worker 1 timed out\n${logTail(1)}")
    assert(p2.waitFor(300, TimeUnit.SECONDS), s"worker 2 timed out\n${logTail(2)}")
    assert(p1.exitValue() == 0, s"worker 1 failed\n${logTail(1)}")
    assert(p2.exitValue() == 0, s"worker 2 failed\n${logTail(2)}")
    def parse(id: Int): (String, Long) = {
      val s = Files.readString(Paths.get(s"$tmp/c$id.json"))
      val first = """"first":"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
      val retry = """"retry":(-?[0-9]+)""".r.findFirstMatchIn(s).get.group(1).toLong
      (first, retry)
    }
    val (f1, r1) = parse(1)
    val (f2, r2) = parse(2)
    // stash table root for the caller's content assertions
    conflictRoots(mode) = tableRoot
    (f1, r1, f2, r2)
  }
  private val conflictRoots = scala.collection.mutable.Map[String, String]()

  test("two JVMs, disjoint-key merges pinned to one base: both commit") {
    val (f1, _, f2, _) = runConflictMatrix("disjoint")
    assert(f1.startsWith("ok:") && f2.startsWith("ok:"),
      s"disjoint merges must BOTH commit (stats prove no file overlap): $f1 / $f2")
    val vs = Set(f1.drop(3).toLong, f2.drop(3).toLong)
    assert(vs == Set(2L, 3L), s"one direct commit + one rebase: $vs")
    val t = GraftTable(spark, conflictRoots("disjoint"))
    val got = t.snapshot.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 200, "no row duplicated or lost by the rebase")
    assert((0L until 50L).forall(got(_) == "w1-first"), "worker 1's merge landed")
    assert((1000L until 1050L).forall(got(_) == "w2-first"), "worker 2's merge landed")
    assert((50L until 100L).forall(got(_) == "seed"), "untouched rows intact")
    (1L to t.latestVersion.get).foreach(t.manifest) // no torn manifest
  }

  test("two JVMs, overlapping merges pinned to one base: one clean retryable loser") {
    val (f1, r1, f2, r2) = runConflictMatrix("overlap")
    val outcomes = Seq((f1, r1), (f2, r2))
    assert(outcomes.count(_._1 == "cme") == 1,
      s"exactly one loser must get the retryable conflict: $f1 / $f2")
    assert(outcomes.count(_._1.startsWith("ok:")) == 1)
    val (_, retryV) = outcomes.find(_._1 == "cme").get
    val winnerV = outcomes.find(_._1.startsWith("ok:")).get._1.drop(3).toLong
    assert(winnerV == 2L, s"winner commits directly on the pinned base: $winnerV")
    assert(retryV == 3L, s"the loser's clean retry must commit next: $retryV")
    val loserId = if (f1 == "cme") 1 else 2
    val t = GraftTable(spark, conflictRoots("overlap"))
    val got = t.snapshot.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 200, "the lost first attempt must leave no rows behind")
    assert((0L until 50L).forall(got(_) == s"w$loserId-retry"),
      "retry applies the loser's update over the winner's")
    assert((1000L until 1100L).forall(got(_) == "seed"))
    (1L to t.latestVersion.get).foreach(t.manifest) // no torn manifest
  }

  test("two JVMs appending to one tracked table never collide on row ids") {
    val tmp = Files.createTempDirectory("graft-2proc-rowid").toString
    val tableRoot = s"$tmp/tracked"
    val nOps = 4
    val t = GraftTable(spark, tableRoot)
    t.overwriteStats(
      (0L until 20L).map(i => (i, "seed")).toDF("id", "v"), Seq("id"))
    t.enableRowTracking()

    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    def launch(id: Int): Process = {
      val cmd = Seq(java) ++ jdk17AddOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.RowIdWorker",
        tableRoot, s"$tmp/r$id.json", id.toString, nOps.toString)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$tmp/rowid-$id.log"))
        .start()
    }
    val p1 = launch(1)
    val p2 = launch(2)
    def logTail(id: Int): String = {
      val f = Paths.get(s"$tmp/rowid-$id.log")
      if (Files.exists(f)) Files.readString(f).takeRight(2000) else "<no log>"
    }
    assert(p1.waitFor(300, TimeUnit.SECONDS), s"worker 1 timed out\n${logTail(1)}")
    assert(p2.waitFor(300, TimeUnit.SECONDS), s"worker 2 timed out\n${logTail(2)}")
    assert(p1.exitValue() == 0, s"worker 1 failed\n${logTail(1)}")
    assert(p2.exitValue() == 0, s"worker 2 failed\n${logTail(2)}")

    // the claim: allocation is decided by the manifest put-if-absent, so
    // ranges from two uncoordinated JVMs can never overlap — every row
    // across seed + 2×4×40 landed rows carries a distinct id
    val withIds = t.snapshotWithRowIds()
    val n = withIds.count()
    assert(n == 20L + 2 * nOps * 40L, s"all batches must have landed: $n")
    val distinctIds = withIds.select(GraftTable.RowIdOut).distinct().count()
    assert(distinctIds == n,
      s"row ids must be globally unique across processes: $distinctIds of $n")
    // the watermark is consistent: above every allocated id
    val hwm = t.latestManifest.get.rowIdHighWaterMark.get
    val maxId = withIds.agg(max(col(GraftTable.RowIdOut))).head().getLong(0)
    assert(hwm > maxId, s"hwm $hwm must clear the max allocated id $maxId")
    // every version in the interleaved history parses — no torn manifest
    (1L to t.latestVersion.get).foreach(t.manifest)
  }

  test("two JVMs race one follower store: both converge, one commit lands") {
    val tmp = Files.createTempDirectory("graft-2proc-follower").toString
    val sourceRoot = s"$tmp/source"
    val storeRoot = s"$tmp/sketch"

    // source: initial snapshot + two feed-published merges — the racers
    // sync a MULTI-version window from scratch (full first sync)
    val source = GraftTable(spark, sourceRoot)
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    source.overwriteStats(docs.filter(col("doc_id") < 100), Seq("doc_id"))
    source.publishInitialSnapshot()
    for (lo <- Seq(100L, 150L))
      source.merge(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 50), Seq("doc_id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
        .withChangeFeed().execute()

    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    def launch(id: Int): Process = {
      val cmd = Seq(java) ++ jdk17AddOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.FollowerWorker",
        sourceRoot, storeRoot, s"$tmp/f$id.json", id.toString)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$tmp/follower-$id.log"))
        .start()
    }
    val p1 = launch(1)
    val p2 = launch(2)
    def logTail(id: Int): String = {
      val f = Paths.get(s"$tmp/follower-$id.log")
      if (Files.exists(f)) Files.readString(f).takeRight(2000) else "<no log>"
    }
    assert(p1.waitFor(300, TimeUnit.SECONDS), s"follower 1 timed out\n${logTail(1)}")
    assert(p2.waitFor(300, TimeUnit.SECONDS), s"follower 2 timed out\n${logTail(2)}")
    assert(p1.exitValue() == 0, s"follower 1 failed\n${logTail(1)}")
    assert(p2.exitValue() == 0, s"follower 2 failed\n${logTail(2)}")

    def parse(path: String): (Long, Long) = {
      val s = Files.readString(Paths.get(path))
      val synced = """"synced":([0-9-]+)""".r.findFirstMatchIn(s).get.group(1).toLong
      val sigs = """"sigs":([0-9]+)""".r.findFirstMatchIn(s).get.group(1).toLong
      (synced, sigs)
    }
    val (s1, n1) = parse(s"$tmp/f1.json")
    val (s2, n2) = parse(s"$tmp/f2.json")
    assert(s1 == 3L && s2 == 3L, s"both must reach source v3: $s1 / $s2")
    assert(n1 == 200L && n2 == 200L, s"both must see all 200 sigs: $n1 / $n2")
    // one commit in the common case; a racer winning inside the loser's
    // (short) entry-to-commit window can land one identical duplicate —
    // never more, and content/markers are identical either way
    val store = GraftTable(spark, storeRoot)
    assert(store.latestVersion.exists(_ <= 2L),
      s"expected at most one duplicate commit, got ${store.latestVersion}")
    assert(store.snapshot.count() == 200L)
  }
}
