package graft

/** Benchmark entry point: runs every registered query N times (default 3,
  * interleaved full passes so a background-load spike hits one pass, not
  * every sample of one query), reports the per-query MEDIAN plus all raw
  * runs, and — unlike a bare timing loop — records a per-query status and
  * exits nonzero if anything failed, so a query that starts throwing can
  * never masquerade as a speedup.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // uncounted warmup: JVM/codegen/parquet-footer/shuffle initialization
    // would otherwise be billed to whichever query runs first
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)
        .as("k")).count().count() // shuffle + whole-stage codegen paths
    } catch { case _: Throwable => () }

    // Deterministic battery order: round 2 showed per-query times shifting
    // with Map iteration order as queries were added.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val runs = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val errors = scala.collection.mutable.Map[String, String]()
    for (_ <- 1 to passes; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        runs(name) = runs(name) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(
            name, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      } finally {
        // sketch operators persist() their pair sets for callers to
        // reuse; un-released across 3 passes × N queries those caches
        // pin executor storage and skew later-pass medians — each query
        // starts cold (finally: a query failing mid-persist must not
        // leak its cache into every subsequent timing either)
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // The driver captures only the LAST ~2000 chars of output and parses
    // the JSON line found there (BENCH_r03 failed exactly this way: the
    // full-precision runs/status made the line >2000 chars and its head —
    // with "metric"/"value" — fell outside the capture). So: full detail
    // goes on an EARLIER line; the final line is the compact contract
    // ({"metric",…,"queries":{name:sec}}) with 3-decimal medians, and we
    // assert it stays well inside the window.
    // Locale.ROOT: a comma-decimal default locale would render 51,012
    // and break the driver's JSON parse.
    def fmt(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    val medians = names.map(n => n -> median(runs(n))).toMap
    val rawRuns = names
      .map(n => jstr(n) + ":" + runs(n).map(fmt(_, 3)).mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val status = names.map { n =>
      jstr(n) + ":" + jstr(errors.get(n).map(m => s"error: $m").getOrElse("ok"))
    }.mkString("{", ",", "}")
    println(s"""{"bench_detail":1,"passes":$passes,"status":$status,"runs":$rawRuns}""")
    val total = names.map(n => medians(n)).filter(_ >= 0).sum
    def summary(digits: Int): String = {
      val qs = names.map(n => jstr(n) + ":" + fmt(medians(n), digits))
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // must fit the driver's ~2000-char output-tail capture with margin;
    // degrade per-query precision before failing outright
    val line = Iterator(3, 2, 1).map(summary).find(_.length <= 1800)
    val fallback = line.getOrElse(summary(1))
    println(fallback)
    spark.stop()
    // report EVERY failure mode before exiting — an oversize line and a
    // broken query can happen in the same run
    if (errors.nonEmpty)
      System.err.println(s"[bench] FAILED queries: ${errors.keys.toSeq.sorted.mkString(", ")}")
    if (line.isEmpty)
      System.err.println(
        s"[bench] FAILED: summary line ${fallback.length} chars exceeds the " +
          "driver's capture window even at 1-decimal precision — split the battery")
    if (errors.nonEmpty || line.isEmpty) sys.exit(1)
  }
}
