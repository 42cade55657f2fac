package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftTable}

/** SQL DML statement surface (`spark.sql`): DELETE FROM / UPDATE /
  * MERGE INTO on graft tables resolve through GraftDmlRule; unsupported
  * MERGE shapes error loudly; non-graft targets keep Spark's behavior.
  */
class SqlDmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-sqldml").toString

  private def fresh(name: String, rows: Seq[(Long, String)]): GraftTable = {
    val t = GraftTable(spark, tmp())
    t.overwrite(rows.toDF("id", "v"), Some("id"))
    GraftCatalog.register(spark, "dml", name, t)
    t
  }

  test("DELETE FROM by identifier, with alias, and by path literal") {
    val t = fresh("del_t", (1L to 10L).map(i => (i, s"v$i")))
    val out = spark.sql("DELETE FROM dml.del_t WHERE id <= 2").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L)) // committed version
    assert(t.scan.count() == 8)
    spark.sql("DELETE FROM dml.del_t AS x WHERE x.id = 10")
    assert(t.scan.count() == 7)
    spark.sql(s"DELETE FROM graft.`${t.root}` WHERE id = 9")
    assert(t.scan.count() == 6)
  }

  test("UPDATE with qualified SET keys and expression values") {
    val t = fresh("upd_t", Seq((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("UPDATE dml.upd_t SET v = concat(v, '!') WHERE id < 3")
    spark.sql("UPDATE dml.upd_t u SET u.v = upper(u.v) WHERE u.id = 3")
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a!"), (2L, "b!"), (3L, "C")))
  }

  test("MERGE INTO: update/insert/delete clauses over a source view") {
    val t = fresh("mrg_t", Seq((1L, "a"), (2L, "b"), (3L, "c")))
    Seq((2L, "b2", "U"), (4L, "d", "I"), (3L, "x", "D"))
      .toDF("id", "v", "op").createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO dml.mrg_t t USING (SELECT id, v, op FROM mrg_src) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.scan.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // schema evolved with the source's op column; row content is the check
    assert(got == Set((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("MERGE INTO without alias qualifiers and delete-only clause") {
    val t = fresh("mrg2_t", Seq((1L, "a"), (2L, "b")))
    Seq((2L, "z")).toDF("id", "v").createOrReplaceTempView("mrg2_src")
    spark.sql(
      """MERGE INTO dml.mrg2_t USING mrg2_src ON mrg2_t.id = mrg2_src.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(t.scan.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("unsupported MERGE shapes raise loud errors") {
    fresh("bad_t", Seq((1L, "a")))
    Seq((1L, "b")).toDF("id", "v").createOrReplaceTempView("bad_src")
    val e1 = intercept[Exception](spark.sql(
      """MERGE INTO dml.bad_t t USING bad_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
    assert(e1.getMessage.contains("unsupported for graft tables"))
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO dml.bad_t t USING bad_src s ON t.id > s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(e2.getMessage.contains("unsupported for graft tables"))
  }

  test("non-graft DELETE still fails with Spark's own error") {
    Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView("plain_view")
    val e = intercept[Exception](
      spark.sql("DELETE FROM plain_view WHERE id = 1"))
    assert(!e.getMessage.contains("graft"))
  }

  test("time travel composes: join of two pinned versions in one statement") {
    val t = GraftTable(spark, tmp())
    t.overwriteStats(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"),
      Seq("k")) // v1
    t.merge(Seq((2L, 99.0), (4L, 40.0)).toDF("k", "v"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute() // v2
    GraftCatalog.register(spark, "dml", "tt_join", t)
    val got = spark.sql(
      """SELECT cur.k, prev.v AS v1, cur.v AS v2
        |FROM dml.tt_join VERSION AS OF 2 cur
        |LEFT JOIN dml.tt_join VERSION AS OF 1 prev ON cur.k = prev.k
        |ORDER BY cur.k""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, Some(10.0), 10.0), (2L, Some(20.0), 99.0),
      (3L, Some(30.0), 30.0), (4L, None, 40.0)),
      s"per-relation pinning must hold inside one join: ${got.toSeq}")
  }

  test("time travel composes: pinned versions inside scalar and IN subqueries") {
    val t = GraftTable(spark, tmp())
    t.overwriteStats(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), Seq("k")) // v1
    t.merge(Seq((2L, 99.0), (3L, 30.0)).toDF("k", "v"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute() // v2
    GraftCatalog.register(spark, "dml", "tt_subq", t)
    // scalar subquery pinned at v1: avg = 15 → current rows over 15
    val scalar = spark.sql(
      """SELECT k FROM dml.tt_subq
        |WHERE v > (SELECT avg(v) FROM dml.tt_subq VERSION AS OF 1)
        |ORDER BY k""".stripMargin).collect().map(_.getLong(0))
    assert(scalar.toSeq == Seq(2L, 3L))
    // IN subquery pinned at v1: current keys that already existed at v1
    val in = spark.sql(
      """SELECT k FROM dml.tt_subq
        |WHERE k IN (SELECT k FROM dml.tt_subq VERSION AS OF 1)
        |ORDER BY k""".stripMargin).collect().map(_.getLong(0))
    assert(in.toSeq == Seq(1L, 2L))
  }

  test("MERGE delete condition referencing the target row is rejected loudly") {
    fresh("badq_t", Seq((1L, "a")))
    Seq((1L, "b", "D")).toDF("id", "v", "op").createOrReplaceTempView("badq_src")
    // the builder evaluates delete conditions against the SOURCE row;
    // silently stripping `t.` would read the source post-image instead of
    // the target pre-image — must error, not compute divergent semantics
    val e = intercept[Exception](spark.sql(
      """MERGE INTO dml.badq_t t USING badq_src s ON t.id = s.id
        |WHEN MATCHED AND t.v = 'a' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(e.getMessage.contains("unsupported for graft tables"))
    assert(e.getMessage.contains("TARGET"))
  }
}
