package graft

import org.apache.spark.sql.SparkSession

/** Subprocess entry for [[TwoProcessSpec]]'s follower race: a separate
  * JVM with its own SparkSession syncing the SAME sketch store from the
  * SAME source table as the other worker — the deployment shape where
  * two orchestrators both try to catch the store up. Exactly one sync
  * commit may land; the loser must converge via the txn marker (or the
  * conflict-convergence path), not fail.
  */
object FollowerWorker {
  def main(args: Array[String]): Unit = {
    val Array(sourceRoot, storeRoot, outFile, workerIdS) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-follower-$workerIdS")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$storeRoot-wh-$workerIdS")
      .getOrCreate()
    try {
      val source = graft.sources.GraftTable(spark, sourceRoot)
      val store = new graft.pipeline.SketchStore(
        spark, storeRoot, "doc_id", "text")
      val synced = store.syncFrom(source)
      val n = store.sigs.count()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
        s"""{"worker":$workerIdS,"synced":$synced,"sigs":$n}""")
    } finally spark.stop()
  }
}
