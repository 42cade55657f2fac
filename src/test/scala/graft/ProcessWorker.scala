package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Subprocess entry point for [[TwoProcessSpec]]: a SEPARATE JVM with its
  * own SparkSession driving the SAME control root and silver table as
  * the other worker — the real multi-writer deployment shape (several
  * orchestrator processes sharing storage with no coordinator), which
  * thread-based tests cannot fully exercise (process-private caches,
  * truly independent JVMs racing renames).
  *
  * Each round: open a watermark (cross-process id allocation), merge a
  * batch into the worker's own key range (file-level conflict rebase),
  * close the watermark (read-modify-write CAS retry). Results land in a
  * JSON file the spec parses.
  */
object ProcessWorker {
  def main(args: Array[String]): Unit = {
    val Array(tableRoot, controlRoot, outFile, workerIdS, nOpsS) = args
    val workerId = workerIdS.toInt
    val nOps = nOpsS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-worker-$workerId")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$tableRoot-wh-$workerId")
      .getOrCreate()
    import spark.implicits._
    try {
      val config = new graft.pipeline.ConfigStore(spark, controlRoot)
      val table = graft.sources.GraftTable(spark, tableRoot)
      val ids = scala.collection.mutable.ArrayBuffer[Long]()
      val versions = scala.collection.mutable.ArrayBuffer[Long]()
      val base = workerId * 1000L
      for (i <- 1 to nOps) {
        val id = config.openWatermark(workerId.toLong, "TMSTP", s"2021-01-0$i 00:00:00")
        ids += id
        val batch = (0L until 50L).map(n => (base + n, s"w$workerId-r$i")).toDF("id", "v")
        val v = table.merge(batch, Seq("id"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll()
          .withTxnMarker(s"worker:$workerId", s"worker:$workerId:$i")
          .execute()
        versions += v
        config.closeWatermark(id)
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
        s"""{"worker":$workerId,"ids":[${ids.mkString(",")}],""" +
          s""""versions":[${versions.mkString(",")}]}""")
    } finally spark.stop()
  }
}
