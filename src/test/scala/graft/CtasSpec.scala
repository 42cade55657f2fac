package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** `CREATE [OR REPLACE] TABLE ... USING graft ... AS <query>` (CTAS /
  * RTAS): managed default location, replace-as-versioned-overwrite
  * atomicity (readers of the old version undisturbed), IF NOT EXISTS,
  * PARTITIONED BY / STATS clauses, and path-literal destinations.
  */
class CtasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-ctas").toString

  test("managed CTAS: no LOCATION needed, registered and readable") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ctasdb")
    spark.sql("DROP TABLE IF EXISTS ctasdb.managed_t")
    // v1 DROP TABLE leaves the managed directory behind; a prior run's
    // committed table there would (correctly) make plain CREATE refuse
    val defaultPath = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier("managed_t", Some("ctasdb")))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(defaultPath.getPath))
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    val out = spark.sql(
      "CREATE TABLE ctasdb.managed_t USING graft AS SELECT k, v * 2 AS v2 FROM ctas_src")
      .collect()
    assert(out.head.getLong(1) == 1L) // first committed version
    assert(spark.sql("SELECT sum(v2) FROM ctasdb.managed_t").head().getDouble(0)
      == 120.0)
    // a real graft table landed at the managed path: versioned, DML-able
    val t = GraftTable(spark, out.head.getString(0))
    assert(t.exists && t.latestVersion.contains(1L))
    spark.sql("INSERT INTO ctasdb.managed_t VALUES (4, 99.0)")
    assert(spark.table("ctasdb.managed_t").count() == 4)
  }

  test("CREATE over existing fails loudly; IF NOT EXISTS is a no-op") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ctasdb")
    spark.sql("DROP TABLE IF EXISTS ctasdb.dup_t")
    spark.sql(
      s"CREATE TABLE ctasdb.dup_t USING graft LOCATION '${tmp()}/d' AS SELECT 1 AS a")
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE ctasdb.dup_t USING graft AS SELECT 2 AS a"))
    assert(e.getMessage.contains("OR REPLACE"), e.getMessage)
    // IF NOT EXISTS: no error, no data change
    spark.sql(
      "CREATE TABLE IF NOT EXISTS ctasdb.dup_t USING graft AS SELECT 2 AS a")
    assert(spark.table("ctasdb.dup_t").head().getInt(0) == 1)
  }

  test("OR REPLACE is a versioned overwrite: old readers undisturbed") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ctasdb")
    spark.sql("DROP TABLE IF EXISTS ctasdb.repl_t")
    val loc = s"${tmp()}/r"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src_r")
    spark.sql(
      s"""CREATE TABLE ctasdb.repl_t USING graft LOCATION '$loc'
         |AS SELECT k, v FROM ctas_src_r""".stripMargin)
    // pin a reader to v1 BEFORE the replace
    val oldReader = spark.read.format("graft").option("versionAsOf", "1").load(loc)
    val replaced = spark.sql(
      s"""CREATE OR REPLACE TABLE ctasdb.repl_t USING graft
         |AS SELECT k * 10 AS k, upper(v) AS v, 1 AS extra FROM ctas_src_r"""
        .stripMargin).collect()
    assert(replaced.head.getLong(1) == 2L, "replace commits version 2")
    // the pinned reader still serves v1's rows — replace disturbed nothing
    assert(oldReader.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // latest shows the replaced contents (schema change included)
    val now = spark.table("ctasdb.repl_t").collect()
    assert(now.map(_.getLong(0)).toSet == Set(10L, 20L))
    assert(now.head.schema.fieldNames.contains("extra"))
    // history survives: v1 is still time-travelable + restorable
    val t = GraftTable(spark, loc)
    assert(t.history.map(_.operation) == Seq("overwrite", "overwrite"))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$loc` VERSION AS OF 1").head().getLong(0) == 2)
    // REPLACE TABLE form (no CREATE) works the same
    spark.sql(
      "REPLACE TABLE ctasdb.repl_t USING graft AS SELECT 7 AS k")
    assert(spark.table("ctasdb.repl_t").head().getInt(0) == 7)
  }

  test("PARTITIONED BY + STATS declare layout; path-literal dest works") {
    val loc = s"${tmp()}/p"
    Seq((1L, "2020-01-01", 5.0), (2L, "2020-01-02", 6.0),
      (3L, "2020-01-01", 7.0)).toDF("id", "day", "amt")
      .createOrReplaceTempView("ctas_src_p")
    spark.sql(
      s"""CREATE TABLE graft.`$loc` USING graft
         |PARTITIONED BY (day) STATS (id) AS SELECT * FROM ctas_src_p"""
        .stripMargin)
    val t = GraftTable(spark, loc)
    assert(t.partitionCols == Seq("day"))
    val files = t.filesOf(t.latestManifest.get)
    assert(files.forall(f => f.ranges.exists(r =>
      r.contains("id") && r.contains("day"))),
      s"stats for id and day expected: $files")
    assert(t.scan.count() == 3)
  }

  test("racing CREATE OR REPLACE: exactly one wins, loser fails loudly") {
    val loc = s"${tmp()}/race"
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("ctas_race_src")
    spark.sql(
      s"CREATE TABLE graft.`$loc` USING graft AS SELECT * FROM ctas_race_src")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    val threads = Seq("x", "y").map { tag =>
      new Thread(() =>
        try results.add(Right(spark.sql(
          s"""CREATE OR REPLACE TABLE graft.`$loc` USING graft
             |AS SELECT k, '$tag' AS v FROM ctas_race_src""".stripMargin)
          .head().getLong(1)))
        catch { case e: Throwable => results.add(Left(e)) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    val (losers, winners) = rs.partition(_.isLeft)
    // an overwrite's output depends on its base snapshot, so a lost race
    // must surface (no blind rebase) — standard graft overwrite contract
    assert(winners.size == 1 && losers.size == 1,
      s"exactly one replace may land per base version: $rs")
    assert(winners.head.toOption.get == 2L)
    val t = GraftTable(spark, loc)
    assert(t.latestVersion.contains(2L))
    assert(Set("x", "y").contains(
      t.scan.head().getString(1)), "the winner's contents are intact")
  }

  test("non-CTAS CREATE TABLE and non-graft CTAS still reach the delegate") {
    // plain registration DDL (no AS) — the delegate path used everywhere
    val t = GraftTable(spark, s"${tmp()}/plain")
    t.overwrite(Seq((1L, "x")).toDF("k", "v"), Some("k"))
    spark.sql("DROP TABLE IF EXISTS ctas_plain_t")
    spark.sql(s"CREATE TABLE ctas_plain_t USING graft LOCATION '${t.root}'")
    assert(spark.table("ctas_plain_t").count() == 1)
    // parquet CTAS is untouched by the graft statement surface
    spark.sql("DROP TABLE IF EXISTS ctas_pq_t")
    spark.sql(
      s"CREATE TABLE ctas_pq_t USING parquet LOCATION '${tmp()}/pq' AS SELECT 1 AS a")
    assert(spark.table("ctas_pq_t").head().getInt(0) == 1)
  }
}
