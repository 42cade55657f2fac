package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of the named queries (all when no
  * args) — the plan-review loop: check PushedFilters/ReadSchema on scans,
  * broadcast vs shuffle joins, partial aggregation, WholeStageCodegen
  * spans. Usage: runMain graft.Explain [sfDir] [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      println(s"\n========== $n ==========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
