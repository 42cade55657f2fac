package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.sources.GraftTable

/** Sustained-backlog witness for the graft source → graft sink chain
  * (the NRT shape under pressure): a bloom-indexed, change-feed-carrying
  * source table accretes N small commits, a stream drains it under
  * `maxFilesPerTrigger`, is STOPPED mid-drain and restarted on the same
  * checkpoint, and must finish with exactly-once contents and FLAT
  * per-batch latency — a per-batch cost that grows with table size (an
  * O(table) scan hiding in the hot path) shows up here as a rising
  * second-half median long before a throughput bench notices.
  *
  * Latency is captured from the engine's own progress events
  * (`durationMs.triggerExecution`), across BOTH query incarnations, so
  * the restart's recovery batch is part of the record, not hidden.
  */
object StreamingBacklogBench {

  /** Standalone run: `runMain graft.streaming.StreamingBacklogBench
    * [nCommits rowsPerCommit maxFilesPerTrigger]` — prints one stats line.
    */
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark,
      nCommits = args.lift(0).map(_.toInt).getOrElse(24),
      rowsPerCommit = args.lift(1).map(_.toInt).getOrElse(200),
      maxFilesPerTrigger = args.lift(2).map(_.toInt).getOrElse(2))
    println(s"[backlog] $s")
    spark.stop()
  }

  case class BacklogStats(
      commits: Int, rows: Long, batches: Int,
      firstHalfP50: Double, secondHalfP50: Double,
      maxBatchSec: Double, restartBatches: Int)

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)

  def run(spark: SparkSession, nCommits: Int = 24, rowsPerCommit: Int = 200,
      maxFilesPerTrigger: Int = 2, timeoutMs: Long = 120000): BacklogStats = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-backlog").toString
    val (srcRoot, sinkRoot, ckpt) = (s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
    val src = GraftTable(spark, srcRoot)
    // the backlog: bloom-indexed + stored change feed, N small commits
    src.overwriteStats(
      (0 until rowsPerCommit).map(i => (i.toLong, s"c0-$i")).toDF("k", "v"),
      Seq("k"))
    spark.sql(s"ALTER TABLE graft.`$srcRoot` SET TBLPROPERTIES " +
      "('graft.bloomFilterColumns' = 'k')")
    for (c <- 1 until nCommits)
      src.appendWithChangeFeed(
        (0 until rowsPerCommit)
          .map(i => ((c * rowsPerCommit + i).toLong, s"c$c-$i")).toDF("k", "v"),
        Seq("k"))
    val total = nCommits.toLong * rowsPerCommit

    val durations = new ConcurrentLinkedQueue[Double]()
    var batchesByQuery = Map.empty[java.util.UUID, Int]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) {
          durations.add(
            e.progress.durationMs.get("triggerExecution").toDouble / 1000.0)
          batchesByQuery = batchesByQuery.updatedWith(e.progress.runId)(
            n => Some(n.getOrElse(0) + 1))
        }
    }
    spark.streams.addListener(listener)
    val sink = GraftTable(spark, sinkRoot)
    def startQuery() = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(srcRoot)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("txnAppId", "backlog-bench")
      .option("stats", "k")
      .start(sinkRoot)
    def awaitRows(target: Long, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!(sink.exists && sink.fastCount >= target)) {
        if (System.nanoTime() > deadline) throw new IllegalStateException(
          s"backlog not drained to $target rows within ${timeoutMs}ms " +
            s"(at ${if (sink.exists) sink.fastCount else 0})")
        q.exception.foreach(throw _)
        Thread.sleep(10)
      }
    }
    try {
      // phase A: drain roughly half the backlog, then stop mid-drain
      val q1 = startQuery()
      awaitRows(total / 2, q1)
      q1.stop(); q1.awaitTermination(15000)
      // phase B: restart on the same checkpoint, drain the rest
      val q2 = startQuery()
      awaitRows(total, q2)
      q2.processAllAvailable()
      q2.stop(); q2.awaitTermination(15000)

      // exactly-once: sink multiset == source multiset, no loss, no dupes
      val sinkCount = sink.fastCount
      require(sinkCount == total,
        s"exactly-once violated: sink holds $sinkCount of $total rows")
      require(sink.scan.except(src.scan).isEmpty &&
        src.scan.except(sink.scan).isEmpty,
        "exactly-once violated: sink contents differ from source")

      import scala.jdk.CollectionConverters._
      val lats = durations.asScala.toSeq
      val (first, second) = lats.splitAt(lats.size / 2)
      val restartBatches = batchesByQuery.values.toSeq.sorted.headOption.getOrElse(0)
      BacklogStats(nCommits, total, lats.size,
        median(first), median(second),
        if (lats.nonEmpty) lats.max else -1.0, restartBatches)
    } finally spark.streams.removeListener(listener)
  }
}
