package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** `CREATE [OR REPLACE] TABLE t (col TYPE, ...) USING graft` — schema-
  * first empty-table creation (the reference's `CREATE TABLE IF NOT
  * EXISTS ... USING DELTA`, COPY_MSQL_TO_SILVER.py:195-196): declared
  * schema lands as a zero-file commit, then the normal write surface
  * (INSERT / append / MERGE / REPLACE) operates against it.
  */
class CreateEmptySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cempty").toString

  test("create empty at path: schema contract, zero rows, then append + merge") {
    val loc = s"${tmp()}/t"
    val out = spark.sql(
      s"""CREATE TABLE graft.`$loc` (k BIGINT NOT NULL, v STRING,
         |amt DECIMAL(10,2)) USING graft""".stripMargin).collect()
    assert(out.head.getLong(1) == 1L, "first committed version is 1")
    val t = GraftTable(spark, loc)
    assert(t.exists && t.latestVersion.contains(1L))
    // readable immediately: right schema, no rows, no job over data files
    val empty = spark.sql(s"SELECT * FROM graft.`$loc`")
    assert(empty.columns.toSeq == Seq("k", "v", "amt"))
    assert(empty.schema("k").dataType.typeName == "long")
    assert(empty.schema("amt").dataType.typeName == "decimal(10,2)")
    assert(empty.count() == 0)
    // the declared schema governs later writes: append then MERGE
    spark.sql(s"INSERT INTO graft.`$loc` VALUES (1, 'a', 5.00), (2, 'b', 6.00)")
    assert(spark.sql(s"SELECT sum(amt) FROM graft.`$loc`")
      .head().getDecimal(0).doubleValue() == 11.0)
    Seq((2L, "B", java.math.BigDecimal.valueOf(9.00)),
      (3L, "c", java.math.BigDecimal.valueOf(7.00)))
      .toDF("k", "v", "amt").createOrReplaceTempView("cempty_src")
    spark.sql(
      s"""MERGE INTO graft.`$loc` AS tgt USING cempty_src AS src ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT v FROM graft.`$loc` ORDER BY k")
      .collect().map(_.getString(0)).toSeq == Seq("a", "B", "c"))
  }

  test("IF NOT EXISTS no-op; plain CREATE over existing fails loudly") {
    val loc = s"${tmp()}/d"
    spark.sql(s"CREATE TABLE graft.`$loc` (a INT) USING graft")
    spark.sql(s"INSERT INTO graft.`$loc` VALUES (1)")
    // no error, no change, returns current version
    val out = spark.sql(
      s"CREATE TABLE IF NOT EXISTS graft.`$loc` (a INT, b INT) USING graft")
      .collect()
    assert(out.head.getLong(1) == 2L)
    assert(spark.sql(s"SELECT * FROM graft.`$loc`").columns.toSeq == Seq("a"))
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE graft.`$loc` (a INT) USING graft"))
    assert(e.getMessage.contains("OR REPLACE"), e.getMessage)
  }

  test("OR REPLACE is a versioned overwrite: schema swap, old readers intact") {
    val loc = s"${tmp()}/r"
    spark.sql(s"CREATE TABLE graft.`$loc` (k BIGINT, v STRING) USING graft")
    spark.sql(s"INSERT INTO graft.`$loc` VALUES (1, 'a')")
    val oldReader = spark.read.format("graft").option("versionAsOf", "2").load(loc)
    val replaced = spark.sql(
      s"CREATE OR REPLACE TABLE graft.`$loc` (id STRING, score DOUBLE) USING graft")
      .collect()
    assert(replaced.head.getLong(1) == 3L, "replace commits the next version")
    // new schema, empty contents at latest; pinned reader undisturbed
    val now = spark.sql(s"SELECT * FROM graft.`$loc`")
    assert(now.columns.toSeq == Seq("id", "score") && now.count() == 0)
    assert(oldReader.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$loc` VERSION AS OF 2").head().getLong(0) == 1)
    // REPLACE TABLE form (no CREATE) works the same
    spark.sql(s"REPLACE TABLE graft.`$loc` (z INT) USING graft")
    assert(spark.sql(s"SELECT * FROM graft.`$loc`").columns.toSeq == Seq("z"))
  }

  test("PARTITIONED BY declares the layout; first append clusters on it") {
    val loc = s"${tmp()}/p"
    spark.sql(
      s"""CREATE TABLE graft.`$loc` (id BIGINT, day STRING, amt DOUBLE)
         |USING graft PARTITIONED BY (day)""".stripMargin)
    val t = GraftTable(spark, loc)
    assert(t.partitionCols == Seq("day"))
    t.append(Seq((1L, "2020-01-01", 5.0), (2L, "2020-01-02", 6.0),
      (3L, "2020-01-01", 7.0)).toDF("id", "day", "amt"))
    assert(t.partitionCols == Seq("day"), "declaration survives the append")
    val files = t.filesOf(t.latestManifest.get)
    assert(files.forall(_.ranges.exists(_.contains("day"))),
      s"per-file day stats expected for pruning: $files")
    assert(t.scan.count() == 3)
    // partition columns must exist in the declared schema
    val bad = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`${tmp()}/bad` (a INT) USING graft PARTITIONED BY (nope)"))
    assert(bad.getMessage.contains("nope"), bad.getMessage)
  }

  test("STATS declares the pruning contract ahead of any file") {
    val loc = s"${tmp()}/s"
    spark.sql(
      s"""CREATE TABLE graft.`$loc` (k BIGINT, v STRING) USING graft
         |STATS (k)""".stripMargin)
    val t = GraftTable(spark, loc)
    assert(t.declaredStatsCols == Seq("k"))
    // the FIRST insert (no files to derive a contract from) must
    // already land per-file min/max on the declared column
    spark.sql(s"INSERT INTO graft.`$loc` VALUES (1, 'a'), (2, 'b')")
    val files = t.filesOf(t.latestManifest.get)
    assert(files.nonEmpty && files.forall(f =>
      f.min.isDefined || f.ranges.exists(_.contains("k"))),
      s"first-write files must carry k stats: $files")
    // unknown STATS column errors loudly
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`${tmp()}/bad` (a INT) USING graft STATS (nope)"))
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("TBLPROPERTIES at create time govern the first write") {
    val loc = s"${tmp()}/tp"
    spark.sql(
      s"""CREATE TABLE graft.`$loc` (k STRING, n BIGINT) USING graft
         |TBLPROPERTIES ('graft.bloomFilterColumns' = 'k',
         |'graft.statsColumns' = 'n')""".stripMargin)
    val t = GraftTable(spark, loc)
    assert(t.properties("graft.bloomFilterColumns") == "k")
    assert(t.declaredStatsCols == Seq("n"))
    spark.sql(s"INSERT INTO graft.`$loc` VALUES ('a', 1), ('b', 2)")
    val files = t.filesOf(t.latestManifest.get)
    assert(files.nonEmpty && files.forall(_.bloom.isDefined),
      s"first-write files must carry the declared bloom sidecars: $files")
    // TBLPROPERTIES after LOCATION parses too
    val loc2 = s"${tmp()}/tp2"
    spark.sql(
      s"""CREATE TABLE graft.`$loc2` (a INT) USING graft
         |LOCATION '$loc2' TBLPROPERTIES ('graft.note' = 'x, y')""".stripMargin)
    assert(GraftTable(spark, loc2).properties("graft.note") == "x, y")
    // CTAS form: properties land after the write
    val loc3 = s"${tmp()}/tp3"
    spark.sql(
      s"""CREATE TABLE graft.`$loc3` USING graft
         |TBLPROPERTIES ('graft.autoCompact' = 'true')
         |AS SELECT 1 AS a""".stripMargin)
    assert(GraftTable(spark, loc3).properties("graft.autoCompact") == "true")
  }

  test("managed identifier: registered, INSERTable, DESCRIBE DETAIL works") {
    spark.sql("CREATE DATABASE IF NOT EXISTS cemptydb")
    spark.sql("DROP TABLE IF EXISTS cemptydb.managed_e")
    val defaultPath = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier("managed_e", Some("cemptydb")))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(defaultPath.getPath))
    val out = spark.sql(
      "CREATE TABLE cemptydb.managed_e (k BIGINT, v STRING) USING graft").collect()
    assert(out.head.getLong(1) == 1L)
    assert(spark.table("cemptydb.managed_e").count() == 0)
    spark.sql("INSERT INTO cemptydb.managed_e VALUES (1, 'x'), (2, 'y')")
    assert(spark.table("cemptydb.managed_e").count() == 2)
    val detail = spark.sql("DESCRIBE DETAIL cemptydb.managed_e").head()
    assert(detail.getAs[Long]("num_files") >= 1L)
  }

  test("non-graft column-list CREATE still reaches the delegate") {
    spark.sql("DROP TABLE IF EXISTS cempty_pq")
    spark.sql(
      s"CREATE TABLE cempty_pq (a INT, b STRING) USING parquet LOCATION '${tmp()}/pq'")
    spark.sql("INSERT INTO cempty_pq VALUES (1, 'z')")
    assert(spark.table("cempty_pq").head().getInt(0) == 1)
  }
}
