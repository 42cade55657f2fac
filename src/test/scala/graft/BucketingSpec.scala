package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: both sides pre-hashed into the same bucket
  * layout join WITHOUT a shuffle exchange — the storage-level answer to
  * repeated large joins on the same key (SURVEY §2.3 scale note).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but their managed
    // locations persist — clear them so saveAsTable can recreate
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.isDirectory(dir)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    Tables.table(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.table(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not introduce a shuffle: the only allowed
    // Exchange is the one for the groupBy above the join
    val joinPart = plan.split("HashAggregate").last // below the aggregation
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should not shuffle on the join key:\n$plan")
    assert(joined.count() > 0)

    // correctness: equal to the plain join
    val plain = Tables.table(spark, sf, "orders")
      .join(Tables.table(spark, sf, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    assert(joined.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(joined).count() == 0)
  }
}
