package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the approximate sketches (q39): HLL distinct
  * within its standard-error envelope, approximate percentiles within a
  * small relative error of exact — on real testdata, per group.
  */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per group") {
    val li = Tables.table(spark, sf, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05,
        f"HLL estimate $a vs exact $e for $k off by ${math.abs(a - e).toDouble / e}%.3f")
    }
  }

  test("percentile_approx within 2% relative error of exact") {
    val li = Tables.table(spark, sf, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.99)").as("p99")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((k, (e50, e99)) <- exact) {
      val (a50, a99) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"p50 $a50 vs $e50 for $k")
      assert(math.abs(a99 - e99) / e99 < 0.02, s"p99 $a99 vs $e99 for $k")
    }
  }

  test("q39 verdict row: every error-bound verdict true, exacts correct") {
    val rows = RelationalQueries.q39ApproxSketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5) &&
        r.getBoolean(6), s"q39 verdict false for ${r.getString(0)}: $r")
    }
  }

  test("sketches are deterministic across repartitionings") {
    val li = Tables.table(spark, sf, "lineitem")
    def run(parts: Int) = li.repartition(parts).groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(2) == run(16),
      "HLL register merge is commutative — estimates must not depend on partitioning")
  }
}
