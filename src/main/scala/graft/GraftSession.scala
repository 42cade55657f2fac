package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every graft entry point needs.
  *
  * Session-construction-time settings, so no code path has to mutate
  * runtime conf mid-query (mutating conf on a read path races with
  * concurrent planning threads — e.g. SilverLoader.run(parallelism>1)).
  *
  *  - `nanosAsLong`: events.parquet carries TIMESTAMP(NANOS), which
  *    Spark 4 refuses to read natively; with this flag the column
  *    arrives as a nanos long and graft.Tables converts it once.
  *  - `TIMESTAMP_MICROS` output: result parquet must read back at the
  *    same µs resolution the DuckDB oracle uses (INT96 comes back ns).
  *  - UTC: instant→NTZ casts must preserve wall-clock values.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // sketch expressions + the graft statement surface (DESCRIBE
      // DETAIL/HISTORY, OPTIMIZE, RESTORE, constraints, SHALLOW CLONE)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")

  /** Loud guard for read paths that depend on a build-time conf: fail
    * with instructions instead of mutating the running session.
    */
  def requireNanosAsLong(spark: SparkSession): Unit = {
    val set = spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")
    if (!set) throw new IllegalStateException(
      "reading events.parquet (TIMESTAMP NANOS) requires " +
        "spark.sql.legacy.parquet.nanosAsLong=true at session build; " +
        "create the session via graft.GraftSession.builder(...)")
  }
}
