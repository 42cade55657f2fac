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
    // star clauses over a wider source WITHOUT the evolution clause:
    // loud refusal naming the fix (Delta's statement-level contract)
    val e = intercept[Exception](spark.sql(
      """MERGE INTO dml.mrg_t t USING (SELECT id, v, op FROM mrg_src) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("WITH SCHEMA EVOLUTION"), e.getMessage)
    assert(t.scan.count() == 3, "refused merge must not commit")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO dml.mrg_t t
        |USING (SELECT id, v, op FROM mrg_src) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.scan.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // schema evolved with the source's op column; row content is the check
    assert(got == Set((1L, "a"), (2L, "b2"), (4L, "d")))
    // the source-only column landed nullable-backfilled on pre-merge rows
    assert(t.scan.columns.contains("op"))
    assert(t.scan.filter("id = 1").head().getAs[String]("op") == null)
    assert(t.scan.filter("id = 4").head().getAs[String]("op") == "I")
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
    // non-equi ON stays unsupported (the builder joins by key name)
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO dml.bad_t t USING bad_src s ON t.id > s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(e2.getMessage.contains("unsupported for graft tables"))
    // assignment to a column neither side has must not silently no-op
    val e3 = intercept[Exception](spark.sql(
      """MERGE INTO dml.bad_t t USING bad_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.nope = s.v""".stripMargin))
    assert(e3.getMessage.contains("unknown column"))
    // unqualified ref to a both-sides column is ambiguous, not guessed
    val e4 = intercept[Exception](spark.sql(
      """MERGE INTO dml.bad_t t USING bad_src s ON t.id = s.id
        |WHEN MATCHED AND v = 'a' THEN DELETE""".stripMargin))
    assert(e4.getMessage.contains("ambiguous"))
  }

  test("MERGE column-level UPDATE SET and conditional clauses") {
    val t = fresh("mrgc_t", Seq((1L, "a"), (2L, "b"), (3L, "c")))
    Seq((1L, "A"), (2L, "skip"), (9L, "new"), (10L, "drop"))
      .toDF("id", "v").createOrReplaceTempView("mrgc_src")
    spark.sql(
      """MERGE INTO dml.mrgc_t t USING mrgc_src s ON t.id = s.id
        |WHEN MATCHED AND s.v = 'skip' THEN UPDATE SET t.v = t.v
        |WHEN MATCHED THEN UPDATE SET t.v = concat(t.v, '->', s.v)
        |WHEN NOT MATCHED AND s.v != 'drop'
        |  THEN INSERT (id, v) VALUES (s.id, upper(s.v))""".stripMargin)
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // first matching clause wins: id=2 hits the no-op clause, not the concat;
    // target pre-image readable in SET values; conditional INSERT filters
    assert(got == Set((1L, "a->A"), (2L, "b"), (3L, "c"), (9L, "NEW")))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE update and delete") {
    val t = fresh("mrgn_t", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    Seq((1L, "a2")).toDF("id", "v").createOrReplaceTempView("mrgn_src")
    spark.sql(
      """MERGE INTO dml.mrgn_t t USING mrgn_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.v = 'stale'""".stripMargin)
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (2L, "stale"), (3L, "stale")))
  }

  test("MERGE delete condition reads the target pre-image") {
    val t = fresh("mrgt_t", Seq((1L, "a"), (2L, "b")))
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("mrgt_src")
    spark.sql(
      """MERGE INTO dml.mrgt_t t USING mrgt_src s ON t.id = s.id
        |WHEN MATCHED AND t.v = 'a' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    // t.v is the PRE-image: row 1 deletes (was 'a'); row 2 updates to 'y'
    val got = t.scan.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "y")))
  }

  test("standard semantics: unmatched delete-marked rows still INSERT") {
    // the clause path follows SQL MERGE exactly — a NOT MATCHED row
    // inserts regardless of what any MATCHED clause would have done
    // (unlike the API's legacy CDC whenMatchedDelete quirk mode)
    val t = fresh("mrgs_t", Seq((1L, "a")))
    Seq((1L, "b", "D"), (5L, "e", "D")).toDF("id", "v", "op")
      .createOrReplaceTempView("mrgs_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO dml.mrgs_t t
        |USING mrgs_src s ON t.id = s.id
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.scan.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((5L, "e")))
  }

  test("MERGE residual ON: failed pairs are unmatched on BOTH sides") {
    val t = fresh("mrgr_t", Seq((1L, "keep"), (2L, "frozen"), (3L, "c")))
    Seq((1L, "u1"), (2L, "u2"), (9L, "new")).toDF("id", "v")
      .createOrReplaceTempView("mrgr_src")
    spark.sql(
      """MERGE INTO dml.mrgr_t t USING mrgr_src s
        |ON t.id = s.id AND t.v <> 'frozen'
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, concat('i_', s.v))
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.v = 'stale'""".stripMargin)
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // id=1 matched (residual passes); id=2's pair FAILS the residual —
    // the frozen target is by-source ('stale') AND the source row
    // inserts (duplicate key, standard SQL); id=3 by-source; id=9 inserts
    assert(got == Set((1L, "u1"), (2L, "stale"), (2L, "i_u2"),
      (3L, "stale"), (9L, "i_new")), got)
  }

  test("MERGE residual ON: match counts are post-residual") {
    val t = fresh("mrgr2_t", Seq((1L, "a")))
    Seq((1L, "x", 1), (1L, "y", 0)).toDF("id", "v", "w")
      .createOrReplaceTempView("mrgr2_src")
    // two source rows share the key but only w=1 passes → exactly one
    // MATCH (no multiple-match error); the failing row inserts
    spark.sql(
      """MERGE INTO dml.mrgr2_t t USING mrgr2_src s
        |ON t.id = s.id AND s.w = 1
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    val got = t.scan.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x"), (1L, "y")), got)
    // BOTH passing → the guard still fires, counting real matches
    val t2 = fresh("mrgr3_t", Seq((5L, "z")))
    Seq((5L, "p", 1), (5L, "q", 1)).toDF("id", "v", "w")
      .createOrReplaceTempView("mrgr3_src")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO dml.mrgr3_t t USING mrgr3_src s
        |ON t.id = s.id AND s.w = 1
        |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
    assert(e.getMessage.contains("multiple-match") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple-match")))
    assert(t2.scan.head().getString(1) == "z", "failed merge must not commit")
  }

  test("MERGE ON without any key equality stays loudly unsupported") {
    fresh("mrgr4_t", Seq((1L, "a")))
    Seq((1L, "b")).toDF("id", "v").createOrReplaceTempView("mrgr4_src")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO dml.mrgr4_t t USING mrgr4_src s ON t.id > s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(e.getMessage.contains("key equality"), e.getMessage)
  }

  test("clause MERGE multiple-match still raises the loud error") {
    fresh("mrgd_t", Seq((1L, "a")))
    Seq((1L, "x"), (1L, "y")).toDF("id", "v").createOrReplaceTempView("mrgd_src")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO dml.mrgd_t t USING mrgd_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
    assert(e.getMessage.contains("multiple-match") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple-match")))
  }

  test("subquery predicates in DELETE/UPDATE conditions and SET values") {
    val t = fresh("sq_t", (1L to 10L).map(i => (i, s"v$i")))
    Seq(1L, 3L, 5L).toDF("k").createOrReplaceTempView("sq_keys")
    // IN (SELECT ...) over a temp view
    spark.sql("DELETE FROM dml.sq_t WHERE id IN (SELECT k FROM sq_keys)")
    assert(t.scan.count() == 7, "IN-subquery DELETE must remove 1,3,5")
    // NOT EXISTS correlated form
    spark.sql("DELETE FROM dml.sq_t WHERE NOT EXISTS " +
      "(SELECT 1 FROM sq_keys WHERE k + 1 = id)")
    // survivors: rows whose id = k+1 for k in (1,3,5) → 2,4,6
    assert(t.scan.select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 4L, 6L))
    // IN-subquery over ANOTHER graft table
    val keys = fresh("sq_keys_g", Seq((4L, "x"), (6L, "y")))
    spark.sql("UPDATE dml.sq_t SET v = 'hit' WHERE id IN " +
      "(SELECT id FROM dml.sq_keys_g)")
    assert(t.scan.filter("v = 'hit'").select("id").as[Long]
      .collect().sorted.toSeq == Seq(4L, 6L))
    // scalar subquery in a SET value
    spark.sql("UPDATE dml.sq_t SET v = (SELECT concat('m', max(k)) " +
      "FROM sq_keys) WHERE id = 2")
    assert(t.scan.filter("id = 2").select("v").as[String].head() == "m5")
    suppressUnused(keys)
  }

  private def suppressUnused(x: Any): Unit = ()

  test("non-graft DELETE still fails with Spark's own error") {
    Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView("plain_view")
    val e = intercept[Exception](
      spark.sql("DELETE FROM plain_view WHERE id = 1"))
    assert(!e.getMessage.contains("graft"))
  }

  test("TRUNCATE and ALTER TABLE on non-graft tables reach Spark's native commands") {
    // regression: the statement interceptors used to capture EVERY
    // 'TRUNCATE TABLE x' / 'ALTER TABLE x ADD COLUMNS' session-wide and
    // fail at graft resolution for non-graft tables; the parse-time
    // catalog probe must route those to the delegate
    spark.sql("DROP TABLE IF EXISTS plain_alter_t")
    // MANAGED parquet table: Spark's native TRUNCATE refuses external
    // tables, and the point here is the native command running at all
    val defaultPath = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier("plain_alter_t"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(defaultPath.getPath))
    spark.sql("CREATE TABLE plain_alter_t (a INT, b STRING) USING parquet")
    spark.sql("INSERT INTO plain_alter_t VALUES (1, 'x')")
    // native ALTER TABLE ADD COLUMNS / SET TBLPROPERTIES / RENAME work
    spark.sql("ALTER TABLE plain_alter_t ADD COLUMNS (c DOUBLE)")
    assert(spark.table("plain_alter_t").columns.toSeq == Seq("a", "b", "c"))
    spark.sql("ALTER TABLE plain_alter_t SET TBLPROPERTIES ('note' = 'hi')")
    // native TRUNCATE empties the parquet table without a graft error
    spark.sql("TRUNCATE TABLE plain_alter_t")
    assert(spark.table("plain_alter_t").count() == 0)
    spark.sql("DROP TABLE plain_alter_t")
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

}
