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
        val raw = spark.read.parquet(s"$sfDir/$name.parquet")
        // re-derived tables (MakeScale output) round-trip through Spark's
        // writer and already carry a real timestamp column — only the
        // driver's raw NANOS-as-long shape needs the conversion.
        // `ts / 1000` would be DOUBLE division — nanos (~1.7e18) exceed a
        // double's 53-bit mantissa and round by ±1µs; `div` stays integral
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        else raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    df
  }
}
