package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator surface (SURVEY.md §2), re-expressed
  * as native Spark plans over the driver testdata, each paired with ANSI SQL
  * for the DuckDB oracle.
  *
  * Operator IDs in scaladoc refer to SURVEY.md §2 tables; reference lines
  * cite /root/reference/COPY_MSQL_TO_SILVER.py unless noted.
  *
  * Scale notes (100 TB stance): every query is a declarative plan — filters
  * and projections reach the parquet scan, aggregates get map-side partial
  * aggregation, the small side of each join is broadcast, and window
  * functions partition on high-cardinality keys so no single partition
  * concentrates the data.
  */
object RelationalQueries {
  private val TsFmt = "yyyy-MM-dd HH:mm:ss"
  private val DuckTsFmt = "%Y-%m-%d %H:%M:%S"

  /** String-compare watermark predicates paired with a redundant native
    * timestamp bound that parquet pushdown CAN use (see
    * Extractor.wmPredicate for the proof sketch). Semantics are exactly
    * the reference's string comparison; the bound only prunes the scan.
    */
  private def wmGt(c: String, wm: String): Column =
    (col(c) > lit(wm).cast("timestamp_ntz")) &&
      (date_format(col(c), TsFmt) > lit(wm))
  private def wmLe(c: String, wm: String): Column =
    (col(c) < lit(wm).cast("timestamp_ntz") + expr("INTERVAL 1 SECOND")) &&
      (date_format(col(c), TsFmt) <= lit(wm))

  /** S2/P1 (ref :159-160): full-entity scan with audit columns. The audit
    * timestamp is a fixed literal here so the oracle can reproduce it
    * (the engine's live path uses current_timestamp — see Extractor).
    */
  def q01FullScanAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "nation")
      .select(col("*"),
        lit("2024-06-01 00:00:00").cast("timestamp_ntz").as("SyncDateTime"),
        lit("I").as("SyncOperation"))

  val q01Sql: String =
    """SELECT *, TIMESTAMP '2024-06-01 00:00:00' AS SyncDateTime,
      |       'I' AS SyncOperation
      |FROM nation""".stripMargin

  /** S4/P3/F3 (ref :175-176): timestamp-incremental scan with the
    * reference's string-compare watermark semantics (style-120 strings —
    * lexicographic == chronological).
    */
  def q02TmstpIncremental(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .filter(wmGt("l_shipdate", "1998-06-17 00:00:00"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")

  val q02Sql: String =
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
       |FROM lineitem
       |WHERE strftime(l_shipdate, '$DuckTsFmt') > '1998-06-17 00:00:00'""".stripMargin

  /** S5/A1 (ref :128-134): new-watermark probe — MAX of the style-120
    * string over rows past the old watermark.
    */
  def q03WatermarkProbe(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .filter(wmGt("l_shipdate", "1995-01-01 00:00:00"))
      .agg(max(date_format(col("l_shipdate"), TsFmt)).as("new_watermark"))

  val q03Sql: String =
    s"""SELECT max(strftime(l_shipdate, '$DuckTsFmt')) AS new_watermark
       |FROM lineitem
       |WHERE strftime(l_shipdate, '$DuckTsFmt') > '1995-01-01 00:00:00'""".stripMargin

  /** A2/W1/P5 (ref :241-248): top-1-per-group via ROW_NUMBER — "latest
    * order per customer". Tie-broken on the unique key for determinism.
    */
  def q04LatestPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
  }

  val q04Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) t
      |WHERE rn = 1""".stripMargin

  /** S3/J1 (ref :162-174): CDC left join — changed keys (+op) joined to the
    * current snapshot. Keys shifted by 1e6 model deletes whose row no
    * longer exists (left-join miss → NULL payload, the reference's quirk).
    */
  def q05CdcLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val changes = orders
      .filter(wmGt("o_orderdate", "1998-09-01 00:00:00"))
      .select(col("o_orderkey").as("ck"), lit("U").as("SyncOperation"))
      .union(orders.filter(col("o_orderkey") < 10)
        .select((col("o_orderkey") + 1000000L).as("ck"), lit("D").as("SyncOperation")))
    changes.join(orders, changes("ck") === orders("o_orderkey"), "left")
      .select(col("ck"), col("SyncOperation"), col("o_totalprice"), col("o_orderstatus"))
  }

  val q05Sql: String =
    """WITH changes AS (
      |  SELECT o_orderkey AS ck, 'U' AS SyncOperation FROM orders
      |  WHERE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') > '1998-09-01 00:00:00'
      |  UNION ALL
      |  SELECT o_orderkey + 1000000 AS ck, 'D' AS SyncOperation FROM orders
      |  WHERE o_orderkey < 10)
      |SELECT c.ck, c.SyncOperation, o.o_totalprice, o.o_orderstatus
      |FROM changes c LEFT JOIN orders o ON c.ck = o.o_orderkey""".stripMargin

  /** EP1 (ref :223-250): the orchestration query — entities LEFT JOIN
    * latest-closed-watermark (J2+J3+W1+A2+F1-F4+P4), over inline VALUES
    * (S12) mirroring dbrconfigData.sql.
    */
  def q06EntitiesWatermarks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val entities = Seq(
      (1L, "dbrDemoTransactions", "demo.dbrDemoTransactions", "src", "silver", "CT", null.asInstanceOf[String], "TransactionId"),
      (2L, "dbrDemoTransactionsDt", "demo.dbrDemoTransactionsDt", "src", "silver", "TMSTP", "TransactionDatetime", "TransactionId"),
      (3L, "neverLoaded", "demo.neverLoaded", "src", "silver", "TMSTP", "UpdatedAt", "Id"))
      .toDF("EntityId", "FromEntityName", "ToEntityName", "FromZone", "ToZone",
        "WatermarkType", "TimestampColumn", "PrimaryKeys")
    val watermarks = Seq(
      (1L, 1L, null.asInstanceOf[String], java.lang.Long.valueOf(100L), "2024-01-01 00:00:00", "2024-01-01 00:05:00"),
      (2L, 1L, null.asInstanceOf[String], java.lang.Long.valueOf(200L), "2024-01-02 00:00:00", "2024-01-02 00:05:00"),
      (3L, 1L, null.asInstanceOf[String], java.lang.Long.valueOf(300L), "2024-01-03 00:00:00", null.asInstanceOf[String]),
      (4L, 2L, "2024-01-02 12:00:00", null.asInstanceOf[java.lang.Long], "2024-01-02 12:00:00", "2024-01-02 12:05:00"),
      (5L, 2L, "2024-01-03 12:00:00", null.asInstanceOf[java.lang.Long], "2024-01-03 12:00:00", null.asInstanceOf[String]))
      .toDF("WatermarkId", "EntityId", "DateWatermark", "CTWatermark",
        "LoadStartDatetime", "LoadEndDatetime")
      .withColumn("DateWatermark", col("DateWatermark").cast("timestamp_ntz"))
      .withColumn("LoadStartDatetime", col("LoadStartDatetime").cast("timestamp_ntz"))
      .withColumn("LoadEndDatetime", col("LoadEndDatetime").cast("timestamp_ntz"))
    ControlQueries.entitiesWithWatermarks(entities, watermarks)
  }

  val q06Sql: String =
    """WITH entities(EntityId, FromEntityName, ToEntityName, FromZone, ToZone,
      |              WatermarkType, TimestampColumn, PrimaryKeys) AS (VALUES
      |  (CAST(1 AS BIGINT), 'dbrDemoTransactions', 'demo.dbrDemoTransactions', 'src', 'silver', 'CT', NULL, 'TransactionId'),
      |  (CAST(2 AS BIGINT), 'dbrDemoTransactionsDt', 'demo.dbrDemoTransactionsDt', 'src', 'silver', 'TMSTP', 'TransactionDatetime', 'TransactionId'),
      |  (CAST(3 AS BIGINT), 'neverLoaded', 'demo.neverLoaded', 'src', 'silver', 'TMSTP', 'UpdatedAt', 'Id')),
      |watermarks(WatermarkId, EntityId, DateWatermark, CTWatermark,
      |           LoadStartDatetime, LoadEndDatetime) AS (VALUES
      |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(100 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:05:00'),
      |  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(200 AS BIGINT), TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:05:00'),
      |  (CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(300 AS BIGINT), TIMESTAMP '2024-01-03 00:00:00', CAST(NULL AS TIMESTAMP)),
      |  (CAST(4 AS BIGINT), CAST(2 AS BIGINT), TIMESTAMP '2024-01-02 12:00:00', CAST(NULL AS BIGINT), TIMESTAMP '2024-01-02 12:00:00', TIMESTAMP '2024-01-02 12:05:00'),
      |  (CAST(5 AS BIGINT), CAST(2 AS BIGINT), TIMESTAMP '2024-01-03 12:00:00', CAST(NULL AS BIGINT), TIMESTAMP '2024-01-03 12:00:00', CAST(NULL AS TIMESTAMP))),
      |wo AS (
      |  SELECT wi.EntityId,
      |         CASE e2.WatermarkType
      |           WHEN 'TMSTP' THEN strftime(wi.DateWatermark, '%Y-%m-%d %H:%M:%S')
      |           WHEN 'CT' THEN CAST(wi.CTWatermark AS VARCHAR) END AS Watermark,
      |         ROW_NUMBER() OVER (PARTITION BY wi.EntityId
      |           ORDER BY wi.LoadStartDatetime DESC, wi.WatermarkId DESC) AS RN
      |  FROM watermarks wi JOIN entities e2 ON wi.EntityId = e2.EntityId
      |  WHERE wi.LoadEndDatetime IS NOT NULL)
      |SELECT e.EntityId, e.FromEntityName, e.ToEntityName, e.FromZone, e.ToZone,
      |       e.WatermarkType, e.TimestampColumn, e.PrimaryKeys,
      |       COALESCE(wo.Watermark,
      |         CASE WHEN e.WatermarkType = 'CT' THEN '0' ELSE '2000-01-01' END) AS Watermark
      |FROM entities e
      |LEFT JOIN wo ON e.EntityId = wo.EntityId AND wo.RN = 1""".stripMargin

  /** J3 + A-family: multi-way equi-join with aggregation — revenue per
    * nation. Dimension sides (nation, customer) are broadcast; the fact
    * aggregate is partially aggregated map-side before the shuffle.
    */
  def q07JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val customer = Tables.table(spark, dir, "customer")
    val nation = Tables.table(spark, dir, "nation")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(OracleMath.stableSum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  val q07Sql: String =
    s"""SELECT n_name, ${OracleMath.stableSumSql("o_totalprice")} AS revenue,
      |       count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** S9/J4 (ref :200-209): MERGE upsert semantics as a query — target rows
    * not matched by source survive (left_anti), all source rows land
    * (whenMatchedUpdateAll + whenNotMatchedInsertAll). The engine's real
    * merge is GraftTable.merge; this exposes its join semantics to the
    * oracle.
    */
  def q08MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), lit("target").as("origin"))
    val source = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
        lit("source").as("origin"))
    target.join(source, Seq("o_orderkey"), "left_anti").unionByName(source)
  }

  val q08Sql: String =
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

  /** U1 + A: UNION ALL of two key sets, then group/filter — overlap keys. */
  def q09Union(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    orders.filter(col("o_orderkey") % 2 === 0).select("o_orderkey")
      .union(orders.filter(col("o_orderkey") % 3 === 0).select("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }

  val q09Sql: String =
    """SELECT o_orderkey, count(*) AS n FROM (
      |  SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0) u
      |GROUP BY o_orderkey HAVING count(*) > 1""".stripMargin

  /** F1-F8: scalar-function battery — CASE, COALESCE/NULLIF, date_format,
    * cast, concat, split (ref :131,231-240 and driver-side :115-169).
    */
  def q10ScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") > 200000, "big")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("small").as("size_class"),
      coalesce(nullif(col("o_orderstatus"), lit("F")), lit("FINAL")).as("status_c"),
      date_format(col("o_orderdate"), TsFmt).as("od_str"),
      col("o_custkey").cast("string").as("custkey_str"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
      split(col("o_orderpriority"), "-").getItem(0).as("pri_code"))

  val q10Sql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'big'
      |       WHEN o_totalprice > 100000 THEN 'mid'
      |       ELSE 'small' END AS size_class,
      |  COALESCE(NULLIF(o_orderstatus, 'F'), 'FINAL') AS status_c,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od_str,
      |  CAST(o_custkey AS VARCHAR) AS custkey_str,
      |  o_orderstatus || '-' || o_orderpriority AS status_pri,
      |  string_split(o_orderpriority, '-')[1] AS pri_code
      |FROM orders""".stripMargin

  /** Extension (SURVEY §2.8 note): JSON extraction over events.props. */
  def q11JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  val q11Sql: String =
    """SELECT event_type,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** Streaming-style tumbling window over events (batch-equivalent of the
    * Structured Streaming path in graft.streaming; SURVEY §2.9 extension).
    */
  def q12TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), OracleMath.stableSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  val q12Sql: String =
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n, ${OracleMath.stableSumSql("value")} AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding (hopping) window: 1-hour windows every 30 minutes — each
    * event lands in exactly two windows. The oracle reproduces Spark's
    * epoch-aligned window assignment by cross-joining the two hop offsets.
    */
  def q42SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), OracleMath.stableSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  // Window assignment must be EXACT-integer on both engines: epoch() is a
  // float and a nanosecond timestamp within an ulp of a 30-min boundary
  // could round across it. date_trunc('second') never moves an event over
  // a whole-second window boundary, and epoch of a whole second converts
  // to BIGINT exactly.
  val q42Sql: String =
    s"""SELECT make_timestamp(
      |         (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 1800 - off)
      |         * 1800 * 1000000) AS window_start,
      |       event_type, count(*) AS n,
      |       ${OracleMath.stableSumSql("value")} AS sum_value
      |FROM events CROSS JOIN (VALUES (0), (1)) t(off)
      |GROUP BY 1, 2""".stripMargin

  /** Semi join (EXISTS) — the family the merge's pruning relies on. */
  def q13SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.table(spark, dir, "customer")
    val orders = Tables.table(spark, dir, "orders")
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
  }

  val q13Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment""".stripMargin

  /** Anti join (NOT EXISTS) — the merge's "rows the source did not touch".
    * Anti-joined against *recent* orders so the result is non-trivial.
    */
  def q14AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.table(spark, dir, "customer")
    val recent = Tables.table(spark, dir, "orders")
      .filter(wmGt("o_orderdate", "1998-06-01 00:00:00"))
    customer.join(recent, customer("c_custkey") === recent("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  val q14Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |  AND strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') > '1998-06-01 00:00:00')""".stripMargin

  /** TPC-H Q1-shaped pricing summary — the headline aggregate (hash-agg
    * with map-side partials; sums rounded so both engines agree at 2dp).
    */
  def q15PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .filter(wmLe("l_shipdate", "1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        OracleMath.stableSum(col("l_quantity")).as("sum_qty"),
        OracleMath.stableSum(col("l_extendedprice")).as("sum_base_price"),
        OracleMath.stableSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        OracleMath.stableAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val q15Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${OracleMath.stableSumSql("l_quantity")} AS sum_qty,
      |  ${OracleMath.stableSumSql("l_extendedprice")} AS sum_base_price,
      |  ${OracleMath.stableSumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${OracleMath.stableAvgSql("l_quantity")} AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') <= '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** §2.7 gap-fill: INTERSECT / EXCEPT (distinct set ops). */
  def q16SetOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val evens = orders.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey"))
    val highs = orders.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
    evens.intersect(highs).withColumn("tag", lit("both"))
      .unionByName(evens.except(highs).withColumn("tag", lit("even_only")))
  }

  val q16Sql: String =
    """WITH evens AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
      |highs AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM evens INTERSECT SELECT * FROM highs)
      |UNION ALL
      |SELECT o_custkey, 'even_only' AS tag FROM (SELECT * FROM evens EXCEPT SELECT * FROM highs)""".stripMargin

  /** §2.4 gap-fill: grouping sets via ROLLUP (subtotals + grand total). */
  def q32Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(OracleMath.stableSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  val q32Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |       ${OracleMath.stableSumSql("l_quantity")} AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** §2.6 gap-fill: global sort + LIMIT top-k (unique tie-break key). */
  def q33GlobalTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val q33Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** §2.4 gap-fill: exact percentiles (both engines use linear
    * interpolation over the sorted values; the interpolated doubles are
    * bit-identical, so only OracleMath.stableRound2 is safe for the 2dp
    * presentation — round(double,2) flips on midpoint boundaries).
    *
    * Computed by [[graft.operators.Percentiles.exact]] — the
    * selection-by-sketch plan: a GK bracket per quantile (deterministic
    * rank error), the bracket's exact base rank by conditional count,
    * then a rank of only the bracket sliver. NO global shuffle-sort of
    * the data (at 3 groups the sort plan parallelizes 3-wide and moves
    * the whole table; this plan's scans are map-combined and only 0.1%
    * of rows are ever ranked), and NOT Spark's `percentile()`
    * aggregate, whose TypedImperative buffer holds every distinct value
    * per group (an ObjectAggregation with ~32 MB buffer rows that OOM'd
    * the sf10 battery). A bracket miss (impossible under the GK bound)
    * falls back to the per-group order-statistics sort.
    */
  def q34Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val qs = Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")
    graft.operators.Percentiles
      .exact(li, "l_returnflag", "l_extendedprice", qs)
      .select(
        col("l_returnflag") +: qs.map { case (_, name) =>
          OracleMath.stableRound2(col(name)).as(name) }: _*)
  }

  val q34Sql: String =
    s"""SELECT l_returnflag,
       |  ${OracleMath.stableRound2Sql("quantile_cont(l_extendedprice, 0.5)")} AS p50,
       |  ${OracleMath.stableRound2Sql("quantile_cont(l_extendedprice, 0.95)")} AS p95,
       |  ${OracleMath.stableRound2Sql("quantile_cont(l_extendedprice, 0.99)")} AS p99
       |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Register the tables a SQL-text query needs and run it — the
    * engine's equivalent of the reference's universal SQL entry point
    * (S1, executeSQL): identical statements run on Spark and the oracle.
    */
  private def sqlOver(spark: SparkSession, dir: String, tables: Seq[String],
      sql: String): DataFrame = {
    tables.foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(sql)
  }

  /** SQL surface: TPC-H Q3-shaped 3-way join + filters + aggregation,
    * identical SQL text on both engines (timestamp literals NTZ).
    */
  def q36SqlShippingPriority(spark: SparkSession, dir: String): DataFrame =
    sqlOver(spark, dir, Seq("customer", "orders", "lineitem"),
      s"""SELECT l_orderkey,
        |  ${OracleMath.stableSumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP_NTZ'1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP_NTZ'1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin)

  val q36Sql: String =
    s"""SELECT l_orderkey,
      |  ${OracleMath.stableSumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin

  /** SQL surface: correlated scalar subqueries (Catalyst decorrelates
    * them into aggregating joins — free SQL parity the reference got
    * from SQL Server).
    */
  def q37SqlScalarSubquery(spark: SparkSession, dir: String): DataFrame =
    sqlOver(spark, dir, Seq("customer", "orders"),
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS total_spend
        |FROM customer c""".stripMargin)

  val q37Sql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS total_spend
      |FROM customer c""".stripMargin

  /** Full outer join (the merge general path's join type) over two
    * partially-overlapping order subsets.
    */
  def q38FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val a = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice").as("price_a"))
    val b = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_totalprice").as("price_b"))
    a.join(b, Seq("o_orderkey"), "full_outer")
      .select("o_orderkey", "price_a", "price_b")
  }

  val q38Sql: String =
    """WITH a AS (SELECT o_orderkey, o_totalprice AS price_a FROM orders
      |           WHERE o_orderkey % 2 = 0),
      |b AS (SELECT o_orderkey, o_totalprice AS price_b FROM orders
      |      WHERE o_orderkey % 3 = 0)
      |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |       a.price_a, b.price_b
      |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey""".stripMargin

  /** Approximate sketches: HLL distinct counts + quantile estimates per
    * group, oracle-gated as error-bound VERDICTS (the q77 pattern). The
    * sketch algorithms differ from the oracle engine's, so raw estimates
    * can't hash-match — instead the plan computes the EXACT values
    * alongside and thresholds each estimate: HLL at rsd 0.02 must land
    * within 6% relative (3σ), percentile_approx at accuracy 10000 must
    * land between the exact values at quantile ±0.005 (50× its rank
    * bound). Both sketches are merge-commutative (register-max /
    * quantile-summary merge), so the verdicts are deterministic under
    * any partitioning; exact_orders/exact_parts hash-match the oracle,
    * tying the row to the data. Tighter accuracy tracking stays in
    * SketchAccuracySpec; the exact distinct counts here are the
    * correctness witness's cost, not the production path (the sketch
    * alone is what a 100 TB scan would run).
    */
  def q39ApproxSketches(spark: SparkSession, dir: String): DataFrame = {
    // three SEPARATE aggregations joined on the (3-row) group key,
    // not one: mixing TypedImperative percentile buffers with TWO
    // DISTINCT aggregates in a single agg forces one expand×3 pass
    // through sort-based ObjectHashAggregate (no codegen, object
    // buffers) — measured pathological at sf10 (60M rows; tens of
    // minutes). Split, the sketches ride codegen'd HashAggregate, the
    // exact distincts ride the expand WITHOUT object buffers, and the
    // exact quantile BOUNDS come from order statistics over a per-group
    // window sort — each stage linear-ish and whole-stage-codegen'd.
    val li = Tables.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_partkey", "l_extendedprice")
    val sketches = li.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("a_orders"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a_parts"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a_p50"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("a_p99"))
    val exacts = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"))
    // order-statistic bounds at quantile ±0.005: a conservative band
    // that percentile_approx at accuracy 10000 (rank error ≤ 0.01% of
    // n) must land inside. Rank positions clamp to [1, n].
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_extendedprice")
    // group sizes via a broadcast 3-row aggregate, NOT a whole-partition
    // count window — that frame buffers each group (20M rows at sf10)
    // in the window operator; row_number alone streams
    val cnt = li.groupBy("l_returnflag").agg(count(lit(1)).as("__n"))
    val ranked = li.select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(cnt), "l_returnflag")
    def pos(q: Double, up: Boolean): org.apache.spark.sql.Column = {
      val raw = lit(q) * (col("__n") - 1) + 1
      greatest(lit(1L), least(col("__n"),
        (if (up) ceil(raw) else floor(raw)).cast("long")))
    }
    val bounds = ranked.groupBy("l_returnflag").agg(
      min(when(col("__rn") >= pos(0.495, up = false), col("l_extendedprice")))
        .as("p50_lo"),
      max(when(col("__rn") <= pos(0.505, up = true), col("l_extendedprice")))
        .as("p50_hi"),
      min(when(col("__rn") >= pos(0.985, up = false), col("l_extendedprice")))
        .as("p99_lo"),
      max(when(col("__rn") <= pos(0.995, up = true), col("l_extendedprice")))
        .as("p99_hi"))
    sketches.join(exacts, "l_returnflag").join(bounds, "l_returnflag")
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("a_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.06).as("orders_ok"),
        (abs(col("a_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.06).as("parts_ok"),
        (col("a_p50") >= col("p50_lo") && col("a_p50") <= col("p50_hi"))
          .as("p50_ok"),
        (col("a_p99") >= col("p99_lo") && col("a_p99") <= col("p99_hi"))
          .as("p99_ok"))
  }

  val q39Sql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  true AS orders_ok, true AS parts_ok, true AS p50_ok, true AS p99_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_full_scan_audit" -> (q01FullScanAudit _),
    "q02_tmstp_incremental" -> (q02TmstpIncremental _),
    "q03_watermark_probe" -> (q03WatermarkProbe _),
    "q04_latest_per_group" -> (q04LatestPerGroup _),
    "q05_cdc_left_join" -> (q05CdcLeftJoin _),
    "q06_entities_watermarks" -> (q06EntitiesWatermarks _),
    "q07_join_agg" -> (q07JoinAgg _),
    "q08_merge_upsert" -> (q08MergeUpsert _),
    "q09_union" -> (q09Union _),
    "q10_scalar_funcs" -> (q10ScalarFuncs _),
    "q11_json_extract" -> (q11JsonExtract _),
    "q12_tumbling_window" -> (q12TumblingWindow _),
    "q42_sliding_window" -> (q42SlidingWindow _),
    "q13_semi_join" -> (q13SemiJoin _),
    "q14_anti_join" -> (q14AntiJoin _),
    "q15_pricing_summary" -> (q15PricingSummary _),
    "q16_set_ops" -> (q16SetOps _),
    "q32_rollup" -> (q32Rollup _),
    "q33_global_topk" -> (q33GlobalTopK _),
    "q34_percentiles" -> (q34Percentiles _),
    "q36_sql_shipping_priority" -> (q36SqlShippingPriority _),
    "q37_sql_scalar_subquery" -> (q37SqlScalarSubquery _),
    "q38_full_outer" -> (q38FullOuter _),
    "q39_approx_sketches" -> (q39ApproxSketches _))

  val oracle: Map[String, String] = Map(
    "q01_full_scan_audit" -> q01Sql,
    "q02_tmstp_incremental" -> q02Sql,
    "q03_watermark_probe" -> q03Sql,
    "q04_latest_per_group" -> q04Sql,
    "q05_cdc_left_join" -> q05Sql,
    "q06_entities_watermarks" -> q06Sql,
    "q07_join_agg" -> q07Sql,
    "q08_merge_upsert" -> q08Sql,
    "q09_union" -> q09Sql,
    "q10_scalar_funcs" -> q10Sql,
    "q11_json_extract" -> q11Sql,
    "q12_tumbling_window" -> q12Sql,
    "q42_sliding_window" -> q42Sql,
    "q13_semi_join" -> q13Sql,
    "q14_anti_join" -> q14Sql,
    "q15_pricing_summary" -> q15Sql,
    "q16_set_ops" -> q16Sql,
    "q32_rollup" -> q32Sql,
    "q33_global_topk" -> q33Sql,
    "q34_percentiles" -> q34Sql,
    "q36_sql_shipping_priority" -> q36Sql,
    "q37_sql_scalar_subquery" -> q37Sql,
    "q38_full_outer" -> q38Sql,
    "q39_approx_sketches" -> q39Sql)
}
