package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{ConfigStore, Entity, SilverLoader}
import graft.sources.GraftTable

/** Driver-gate queries that exercise the engine's *stateful* machinery —
  * GraftTable versioned commits, MERGE, and the full NRT pipeline
  * (probe → open → extract → merge → close) — with the expected end state
  * expressed relationally for the DuckDB oracle.
  *
  * Each run builds its fixtures from the sf directory's tables into a
  * fresh temp dir, so runs are re-entrant and deterministic.
  */
object PipelineQueries {

  /** S8/S9: GraftTable overwrite + MERGE upsert, observed via snapshot.
    * Same algebra as q08 (anti ∪ source), but through the real table.
    */
  def q17TableMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val root = Files.createTempDirectory("graft-q17").toString
    val t = GraftTable(spark, root)
    t.overwrite(
      orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("target").as("origin")),
      Some("o_orderkey"))
    t.merge(
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
          lit("source").as("origin")),
      Seq("o_orderkey"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    t.snapshot
  }

  val q17Sql: String =
    """WITH target AS (
      |  SELECT o_orderkey, o_totalprice, 'target' AS origin FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |source AS (
      |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 'source' AS origin
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT t.* FROM target t
      |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
      |UNION ALL
      |SELECT * FROM source""".stripMargin

  /** EP2, TMSTP mode: two-round incremental pipeline on an orders-derived
    * entity. Round 1 full-loads a subset; round 2's source has grown by
    * the complement, date-shifted past the watermark; the incremental
    * extract + merge must land exactly those rows.
    */
  def q18TmstpPipeline(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val tmp = Files.createTempDirectory("graft-q18").toString
    val (src, silver, control) = (s"$tmp/src", s"$tmp/silver", s"$tmp/control")
    val subset = orders.filter(col("o_orderkey") % 4 =!= 0)
    val grown = subset.unionByName(
      orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_orderdate",
          (col("o_orderdate") + expr("INTERVAL 3000 DAYS")).cast("timestamp_ntz")))

    val config = new ConfigStore(spark, control)
    config.registerEntities(Seq(Entity(
      1L, "orders_inc", "demo.orders_inc", "src", "silver",
      "TMSTP", Some("o_orderdate"), "o_orderkey")))
    val loader = new SilverLoader(spark, config, src, silver)

    subset.write.mode("overwrite").parquet(s"$src/orders_inc.parquet")
    loader.run() // round 1: full load
    grown.write.mode("overwrite").parquet(s"$src/orders_inc.parquet")
    loader.run() // round 2: timestamp-incremental merge
    loader.run() // round 3: no-op short-circuit (ref :157)

    loader.silverTable(config.entities.head).snapshot
      .select(orders.columns.map(col) :+ col("SyncOperation"): _*)
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |       o_orderpriority, 'I' AS SyncOperation
      |FROM orders WHERE o_orderkey % 4 <> 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       o_orderdate + INTERVAL 3000 DAY AS o_orderdate,
      |       o_orderpriority, 'I' AS SyncOperation
      |FROM orders WHERE o_orderkey % 4 = 0""".stripMargin

  /** EP2, CT mode: two-round change-feed pipeline on a customer-derived
    * entity, reproducing the reference's delete quirk (SURVEY §2.9):
    * 'D' rows whose key misses the snapshot are upserted with NULL
    * payload.
    */
  def q19CtPipeline(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.table(spark, dir, "customer")
    val tmp = Files.createTempDirectory("graft-q19").toString
    val (src, silver, control) = (s"$tmp/src", s"$tmp/silver", s"$tmp/control")
    val base = customer.filter(col("c_custkey") % 5 =!= 0)

    def feed(rows: DataFrame, v: Long, op: String): DataFrame =
      rows.select(col("c_custkey"),
        lit(v).as("SYS_CHANGE_VERSION"), lit(op).as("SYS_CHANGE_OPERATION"))

    val v1 = feed(base, 1L, "I")
    val v2 = feed(customer.filter(col("c_custkey") % 5 === 0), 2L, "I")
      .unionByName(
        feed(customer.filter(col("c_custkey") % 9 === 0)
          .withColumn("c_custkey", col("c_custkey") + 100000L), 2L, "D"))

    val config = new ConfigStore(spark, control)
    config.registerEntities(Seq(Entity(
      1L, "customer_ct", "demo.customer_ct", "src", "silver",
      "CT", None, "c_custkey")))
    val loader = new SilverLoader(spark, config, src, silver)

    base.write.mode("overwrite").parquet(s"$src/customer_ct.parquet")
    v1.write.mode("overwrite").parquet(s"$src/customer_ct_changes.parquet")
    loader.run() // round 1: full load (CT wm 0 → 1)
    customer.write.mode("overwrite").parquet(s"$src/customer_ct.parquet")
    v1.unionByName(v2).write.mode("overwrite")
      .parquet(s"$src/customer_ct_changes.parquet")
    loader.run() // round 2: CT extract of version-2 changes + merge

    loader.silverTable(config.entities.head).snapshot
      .select(customer.columns.map(col) :+ col("SyncOperation"): _*)
  }

  val q19Sql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |       'I' AS SyncOperation
      |FROM customer WHERE c_custkey % 5 <> 0
      |UNION ALL
      |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |       'I' AS SyncOperation
      |FROM customer WHERE c_custkey % 5 = 0
      |UNION ALL
      |SELECT c_custkey + 100000, CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
      |       CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), 'D' AS SyncOperation
      |FROM customer WHERE c_custkey % 9 = 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_table_merge" -> (q17TableMerge _),
    "q18_tmstp_pipeline" -> (q18TmstpPipeline _),
    "q19_ct_pipeline" -> (q19CtPipeline _))

  val oracle: Map[String, String] = Map(
    "q17_table_merge" -> q17Sql,
    "q18_tmstp_pipeline" -> q18Sql,
    "q19_ct_pipeline" -> q19Sql)
}
