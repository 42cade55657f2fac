package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Metadata-only aggregates: an unfiltered `count(*)` (and `min`/`max`
  * of stats-covered integral/date columns) over a graft scan answers
  * from the manifest — the plan contains NO file scan. Anything the
  * manifest cannot answer exactly (filters, count(col) null semantics,
  * string/double extremes, DV-masked snapshots) falls through to the
  * normal scan and stays correct.
  */
class MetadataAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-magg").toString

  /** Relations surviving optimization — the metadata rewrite replaces
    * them with a LocalRelation, so 0 means "no file will be opened"
    * (counted on the optimized plan: AQE hides physical scans inside
    * AdaptiveSparkPlanExec until execution).
    */
  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.size

  test("count(*) answers from the manifest — zero file scans") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.overwriteStats((1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))
    t.appendStats((5001 to 6000).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))

    val c = t.scan.groupBy().count()
    assert(scans(c) == 0, "count(*) must not open a data file")
    assert(c.head().getLong(0) == 6000L)
    // SQL spelling too
    t.scan.createOrReplaceTempView("magg_t")
    val viaSql = spark.sql("SELECT count(*) AS n FROM magg_t")
    assert(scans(viaSql) == 0)
    assert(viaSql.head().getLong(0) == 6000L)

    // a filter disables the rewrite and the answer comes from the scan
    val filtered = t.scan.filter(col("k") > 5500).groupBy().count()
    assert(scans(filtered) == 1)
    assert(filtered.head().getLong(0) == 500L)
  }

  test("min/max of a stats column answers from the manifest") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.overwriteStats((1 to 3000).map(i =>
      (i.toLong, i % 97, s"v$i")).toDF("k", "m", "v"), Seq("k"))

    val mm = t.scan.agg(min("k").as("lo"), max("k").as("hi"),
      count(lit(1)).as("n"))
    assert(scans(mm) == 0, "min/max of the stats column must not scan")
    val r = mm.head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 3000L && r.getLong(2) == 3000L)

    // a column WITHOUT stats coverage falls back to the scan
    val noStats = t.scan.agg(max("m"))
    assert(scans(noStats) == 1)
    assert(noStats.head().getInt(0) == 96)

    // count(col) has null semantics the manifest does not know — scan
    val t2 = GraftTable(spark, s"${tmp()}/t2")
    t2.overwriteStats(Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("k", "v"), Seq("k"))
    val cc = t2.scan.agg(count(col("v")))
    assert(scans(cc) == 1)
    assert(cc.head().getLong(0) == 2L)
  }

  test("DV-masked snapshots and row-level ops stay correct") {
    val t = GraftTable(spark, s"${tmp()}/t")
    t.overwriteStats((1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))
    // copy-on-write delete: counts still metadata-answerable
    t.delete("k <= 100")
    val c1 = t.scan.groupBy().count()
    assert(scans(c1) == 0)
    assert(c1.head().getLong(0) == 900L)

    // merge-on-read delete (deletion vector): the DV mask rewrites the
    // plan, the metadata path must NOT claim it — correctness first
    t.delete("k <= 200", deletionVectors = Some(true))
    val c2 = t.scan.groupBy().count()
    assert(c2.head().getLong(0) == 800L)
    val mm = t.scan.agg(min("k"))
    assert(mm.head().getLong(0) == 201L)
  }

  test("time travel, column mapping and converted tables answer exactly") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwriteStats((1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))
    t.appendStats((501 to 600).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(root)
    val c1 = v1.groupBy().count()
    assert(scans(c1) == 0)
    assert(c1.head().getLong(0) == 500L, "pinned version must count version 1")

    // renamed column: the logical name maps back to physical stats keys
    t.renameColumn("k", "key")
    val mm = t.scan.agg(min("key"), max("key"))
    assert(scans(mm) == 0)
    assert(mm.head().getLong(0) == 1L && mm.head().getLong(1) == 600L)

    // Hive-converted (pv) table: count from the manifest
    val src = s"${tmp()}/hive"
    (1 to 300).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.partitionBy("p").parquet(src)
    val ct = GraftTable.convertParquet(spark, src, Seq("id"),
      partitionedBy = Seq("p" -> "INT"))
    val cc = ct.scan.groupBy().count()
    assert(scans(cc) == 0)
    assert(cc.head().getLong(0) == 300L)
    // pv partition column extremum from the tuples (integral compare:
    // p in {0,1,2})
    val pm = ct.scan.agg(max("p"))
    assert(pm.head().getInt(0) == 2)
  }

  test("unpadded Hive date partitions compare as dates, not strings") {
    // CONVERT keeps directory names VERBATIM; Hive writers may leave
    // date parts unpadded ('day=2024-9-5'), where lexicographic order
    // inverts date order ('2024-9-5' > '2024-10-01'). The extremum must
    // cast first — a string compare would return 2024-09-05 as the MAX.
    val src = s"${tmp()}/hive"
    Seq("2024-9-5", "2024-10-01", "2024-8-30").foreach { d =>
      (1 to 10).map(i => i.toLong).toDF("id")
        .coalesce(1).write.parquet(s"$src/day=$d")
    }
    val ct = GraftTable.convertParquet(spark, src, Seq("id"),
      partitionedBy = Seq("day" -> "DATE"))
    val mm = ct.scan.agg(
      min("day").as("lo"), max("day").as("hi"))
    assert(scans(mm) == 0, "pv date extremum must answer from metadata")
    val r = mm.head()
    assert(r.getDate(0).toString == "2024-08-30", s"min was ${r.getDate(0)}")
    assert(r.getDate(1).toString == "2024-10-01", s"max was ${r.getDate(1)}")
    // and the metadata answer matches the real scan (a residual filter
    // disables the rewrite, forcing the file-reading plan)
    val realDf = ct.scan.filter(col("id") >= -999L)
      .groupBy().agg(min("day"), max("day"))
    assert(scans(realDf) == 1)
    val real = realDf.head()
    assert(r.getDate(0) == real.getDate(0) && r.getDate(1) == real.getDate(1))
  }
}
