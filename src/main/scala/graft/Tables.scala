package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform access to the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet dataset per table; all
  * queries receive the directory and read only the tables they need, so
  * Catalyst can push filters/column pruning into each scan independently.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") {
        // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
        // read natively; with nanosAsLong (required at session build —
        // mutating conf here would race with concurrent planner threads)
        // it arrives as a nanos long, truncated here to a microsecond NTZ
        // timestamp (session TZ is pinned UTC, so the instant→NTZ cast
        // preserves the wall-clock value).
        GraftSession.requireNanosAsLong(spark)
        // `ts / 1000` would be DOUBLE division — nanos (~1.7e18) exceed a
        // double's 53-bit mantissa and round by ±1µs; `div` stays integral
        spark.read.parquet(s"$sfDir/$name.parquet")
          .withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    df
  }
}
