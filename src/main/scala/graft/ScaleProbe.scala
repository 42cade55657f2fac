package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main for scale investigations (not part of the
  * driver contract; kept out of Bench so its runs never pollute
  * BENCH_DETAIL). Current probe: bulk overwrite with bloom-index
  * sidecars — 1000 files through the executor-side sidecar build
  * (driver transit is path pairs, not bitmaps).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.GraftTable(spark,
      java.nio.file.Files.createTempDirectory("bloomscale").toString)
    t.setProperty(graft.sources.GraftTable.BloomProperty, "k")
    val df = spark.range(0, 2000000)
      .select(concat(lit("key-"), col("id")).as("k"), col("id").as("n"))
      .repartition(1000)
    val t0 = System.nanoTime()
    val noBloomBaseline = {
      val t2 = graft.sources.GraftTable(spark,
        java.nio.file.Files.createTempDirectory("nobloom").toString)
      t2.overwriteStats(df, Seq("k"))
      (System.nanoTime() - t0) / 1e9
    }
    val t1 = System.nanoTime()
    t.overwriteStats(df, Seq("k"))
    val secs = (System.nanoTime() - t1) / 1e9
    val fs = t.filesOf(t.latestManifest.get)
    val sizes = fs.flatMap(_.bloom).map(b =>
      java.nio.file.Files.size(java.nio.file.Paths.get(t.root, b)))
    println(s"[probe] files=${fs.size} withBloom=${fs.count(_.bloom.isDefined)} " +
      f"overwriteNoBloom=$noBloomBaseline%.2fs overwriteWithBloom=$secs%.2fs " +
      s"sidecarBytesTotal=${sizes.sum} perFileAvg=${
        if (sizes.nonEmpty) sizes.sum / sizes.size else 0}")
    // point lookup still prunes through the executor-written sidecars
    val t3 = System.nanoTime()
    val hit = t.scan.filter(col("k") === "key-1234567").count()
    println(f"[probe] point lookup hit=$hit ${(System.nanoTime() - t3) / 1e9}%.2fs")
    spark.stop()
  }
}
