package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Column DEFAULT values — Delta/Spark column-default parity: a
  * ref-free expression materialized by SQL INSERTs that omit the
  * column. Metadata-only declaration; existing rows untouched;
  * DataFrame appends write exactly what they are given (Delta parity).
  */
class DefaultColsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-dflt").toString

  test("INSERT materializes defaults for omitted columns") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, status STRING DEFAULT 'open',
         |  score DOUBLE DEFAULT (1.5 * 2)) USING graft""".stripMargin)
    val t = GraftTable(spark, root)
    assert(t.defaultCols.map(_._1) == Seq("score", "status"))
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("dflt_src")

    spark.sql(s"INSERT INTO graft.`$root` (id) SELECT id FROM dflt_src")
    val rows = t.scan.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1) == "open"))
    assert(rows.forall(_.getDouble(2) == 3.0))

    // provided values win over the default
    spark.sql(s"INSERT INTO graft.`$root` (id, status) VALUES (4, 'closed')")
    assert(t.scan.filter(col("id") === 4).head().getString(1) == "closed")

    // BY NAME with the column absent also lands the default
    spark.sql(s"INSERT INTO graft.`$root` BY NAME " +
      "SELECT id + 10 AS id FROM dflt_src")
    assert(t.scan.filter(col("id") > 10 && col("status") === "open").count() == 3)

    // API appends are NOT defaulted (Delta parity): absent column reads null
    t.append(Seq(100L).toDF("id"))
    assert(t.scan.filter(col("id") === 100).head().isNullAt(1))
  }

  test("SET/DROP DEFAULT govern future inserts only; SHOW CREATE round-trips") {
    val root = s"${tmp()}/t"
    spark.sql(s"CREATE TABLE graft.`$root` (id BIGINT, v STRING) USING graft")
    val t = GraftTable(spark, root)
    Seq(1L).toDF("id").createOrReplaceTempView("dflt_src2")
    spark.sql(s"INSERT INTO graft.`$root` (id) SELECT id FROM dflt_src2")

    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN v SET DEFAULT 'filled'")
    spark.sql(s"INSERT INTO graft.`$root` (id) SELECT id + 1 FROM dflt_src2")
    // pre-existing row untouched, new row defaulted
    assert(t.scan.filter(col("id") === 1).head().isNullAt(1))
    assert(t.scan.filter(col("id") === 2).head().getString(1) == "filled")

    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$root`").head().getString(0)
    assert(ddl.contains("graft.default.v"))
    val root2 = s"${tmp()}/t2"
    spark.sql(ddl.replace(root, root2))
    assert(GraftTable(spark, root2).defaultCols == Seq("v" -> "'filled'"))

    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN v DROP DEFAULT")
    spark.sql(s"INSERT INTO graft.`$root` (id) SELECT id + 2 FROM dflt_src2")
    assert(t.scan.filter(col("id") === 3).head().isNullAt(1))
  }

  test("declaration validates: refs refused, type must cast, rename/drop follow") {
    val root = s"${tmp()}/t"
    spark.sql(s"CREATE TABLE graft.`$root` (id BIGINT, v STRING DEFAULT 'x') " +
      "USING graft")
    val t = GraftTable(spark, root)
    assert(intercept[Exception] {
      t.addDefault("v", "concat(v, 'y')")
    }.getMessage.contains("references columns"))
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmp()}/b` " +
        "(d DATE DEFAULT 'not-a-map', m MAP<STRING,STRING> DEFAULT 'x') " +
        "USING graft")
    }.getMessage.contains("cannot cast"))
    // time-dependent defaults are LEGAL (created_at pattern) — they
    // materialize once at insert, nothing ever recomputes them
    t.addDefault("id", "unix_timestamp()")

    t.renameColumn("v", "w")
    assert(t.defaultCols.exists(_ == ("w" -> "'x'")))
    t.dropColumn("w")
    assert(!t.defaultCols.exists(_._1 == "w"))

    // a generated/identity column cannot also carry a DEFAULT
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmp()}/c` " +
        "(id BIGINT GENERATED ALWAYS AS IDENTITY DEFAULT 7, v STRING) " +
        "USING graft")
    }.getMessage.toLowerCase.contains("identity"))
  }
}
