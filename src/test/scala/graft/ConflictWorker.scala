package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, ManifestFile, StatsPruning}

/** Subprocess entry point for [[TwoProcessSpec]]'s merge-merge conflict
  * matrix: two real JVMs pin the SAME base version (a filesystem barrier
  * guarantees both have read it before either commits), then race their
  * commits. Unlike [[ProcessWorker]]'s free-running rounds — where the OS
  * scheduler decides whether the merges ever actually overlap — pinning
  * the base makes both matrix outcomes deterministic:
  *
  *  - `disjoint`: each worker rewrites its own key range's file with a
  *    sharp stats predicate — the commit loser must REBASE (file-level
  *    disjointness proven by the winner's file stats) and still commit.
  *  - `overlap`: both workers rewrite the SAME file — exactly one rename
  *    wins; the loser must fail with ConcurrentModificationException (a
  *    silent rebase would double-apply the row) and then succeed on a
  *    clean RETRY through the public merge API against the new base.
  *
  * Output JSON: {"worker":N,"first":"ok:<v>"|"cme","retry":<v|-1>}.
  */
object ConflictWorker {
  def main(args: Array[String]): Unit = {
    val Array(tableRoot, barrierDir, outFile, workerIdS, mode) = args
    val workerId = workerIdS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-conflict-$workerId")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$tableRoot-wh-$workerId")
      .getOrCreate()
    import spark.implicits._
    try {
      val t = GraftTable(spark, tableRoot)
      // my key range: worker 1 owns [0,50), worker 2 owns [1000,1050)
      // in disjoint mode and contends on [0,50) in overlap mode
      val lo = if (mode == "disjoint" && workerId == 2) 1000L else 0L
      val hi = lo + 50L
      val base = t.latestVersion.get
      val baseM = t.manifest(base)
      def overlapsMine(f: ManifestFile): Boolean =
        StatsPruning.fileRanges(f).get("id").forall { case (l, h) =>
          l.toLong < hi && lo <= h.toLong
        }
      val replaced = baseM.files.filter(overlapsMine)
      // the full replacement content for the files I rewrite: their rows
      // with my range's values updated (what a real merge would stage)
      val replacement = t.snapshotAt(base)
        .filter(
          replaced.map { f =>
            val (l, h) = StatsPruning.fileRanges(f)("id")
            col("id").between(l.toLong, h.toLong)
          }.reduce(_ || _))
        .withColumn("v",
          when(col("id").between(lo, hi - 1), lit(s"w$workerId-first"))
            .otherwise(col("v")))
      val newFiles = t.writeDataFiles(replacement.coalesce(1), Seq("id"))

      // barrier: both workers must hold `base` before either commits
      Files.writeString(Paths.get(s"$barrierDir/ready-$workerId"), base.toString)
      val other = Paths.get(s"$barrierDir/ready-${3 - workerId}")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!Files.exists(other)) {
        if (System.nanoTime() > deadline)
          sys.error("barrier timeout: peer never pinned its base")
        Thread.sleep(50)
      }

      val first =
        try "ok:" + t.swap(replaced.map(_.path).toSet, newFiles,
          t.snapshotAt(base).schema, base, overlapsMine)
        catch { case _: java.util.ConcurrentModificationException => "cme" }
      // a clean retry through the PUBLIC api against the fresh base —
      // what a real orchestrator's retry loop does after a lost race
      val retry =
        if (first == "cme")
          t.merge(
            (lo until hi).map(i => (i, s"w$workerId-retry")).toDF("id", "v"),
            Seq("id"))
            .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        else -1L
      Files.writeString(Paths.get(outFile),
        s"""{"worker":$workerId,"first":"$first","retry":$retry}""")
    } finally spark.stop()
  }
}
