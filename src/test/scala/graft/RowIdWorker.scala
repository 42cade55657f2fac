package graft

import org.apache.spark.sql.SparkSession

/** Subprocess entry point for [[TwoProcessSpec]]'s row-id allocation
  * witness: a separate JVM appending and merging batches into the SAME
  * tracked table as the other worker. Row-id ranges are allocated at
  * commit time by the manifest put-if-absent (no coordinator), so the
  * claim "two independent processes never collide on row ids" can only
  * be proven across real JVMs — process-private caches and truly
  * independent rename races included. The spec asserts global id
  * uniqueness over everything both workers landed.
  */
object RowIdWorker {
  def main(args: Array[String]): Unit = {
    val Array(tableRoot, outFile, workerIdS, nOpsS) = args
    val workerId = workerIdS.toInt
    val nOps = nOpsS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-rowid-worker-$workerId")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$tableRoot-wh-$workerId")
      .getOrCreate()
    import spark.implicits._
    try {
      val table = graft.sources.GraftTable(spark, tableRoot)
      var committed = 0
      for (i <- 1 to nOps) {
        val batch = (0L until 40L)
          .map(n => (workerId * 1000000L + i * 1000L + n, s"w$workerId-r$i"))
          .toDF("id", "v")
        // alternate the two id-allocating commit paths: plain append
        // (internal lost-race retry) and insert-only merge (swap rebase)
        if (i % 2 == 0) table.append(batch)
        else {
          var done = false
          var attempts = 0
          while (!done) {
            try {
              table.merge(batch, Seq("id"))
                .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
              done = true
            } catch {
              case e: java.util.ConcurrentModificationException =>
                attempts += 1
                if (attempts > 50) throw e
            }
          }
        }
        committed += 1
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
        s"""{"worker":$workerId,"committed":$committed}""")
    } finally spark.stop()
  }
}
