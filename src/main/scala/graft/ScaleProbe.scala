package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main for scale investigations (not part of the
  * driver contract; kept out of Bench so its runs never pollute
  * BENCH_DETAIL).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val li = Tables.table(spark, dir, "lineitem")
    time("warm full count")(li.count())
    time("native bound only")(
      li.filter(col("l_shipdate") > lit("1998-06-17 00:00:00").cast("timestamp_ntz")).count())
    time("string compare only")(
      li.filter(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss") > lit("1998-06-17 00:00:00")).count())
    time("q02 full")(RelationalQueries.q02TmstpIncremental(spark, dir).count())
    time("q02 full again")(RelationalQueries.q02TmstpIncremental(spark, dir).count())
    spark.stop()
  }
}
