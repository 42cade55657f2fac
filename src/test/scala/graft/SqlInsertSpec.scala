package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftTable}

/** SQL INSERT INTO / INSERT OVERWRITE against graft tables: versioned
  * manifest commits (never untracked files), by-position and BY NAME
  * matching, explicit column lists, store-assignment casts, stats and
  * partition-layout preservation, and the loud arity/unknown-column
  * errors. Regression anchor: before GraftInsertCommand, INSERT INTO
  * "succeeded" via InsertIntoHadoopFsRelationCommand and the rows were
  * invisible to every scan.
  */
class SqlInsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): GraftTable = {
    val t = GraftTable(spark, Files.createTempDirectory("graft-ins").toString)
    t.overwrite(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "amt"),
      Some("id"))
    GraftCatalog.register(spark, "ins", name, t)
    t
  }

  test("INSERT INTO appends a committed version visible to every reader") {
    val t = fresh("t1")
    val out = spark.sql("INSERT INTO ins.t1 VALUES (3, 'c', 30.0)").collect()
    assert(out.head.getLong(0) == 2L) // committed version
    assert(t.scan.count() == 3)
    assert(spark.table("ins.t1").count() == 3)
    // the new rows live in manifest-tracked files with stats (pruning)
    val files = t.filesOf(t.latestManifest.get)
    assert(files.forall(f => f.min.isDefined || f.ranges.exists(_.nonEmpty)))
    // by path literal too
    spark.sql(s"INSERT INTO graft.`${t.root}` VALUES (4, 'd', 40.0)")
    assert(t.scan.count() == 4)
  }

  test("INSERT INTO (cols) fills unlisted columns with NULL; casts apply") {
    val t = fresh("t2")
    spark.sql("INSERT INTO ins.t2 (amt, id) VALUES (7, 9)") // int → double/long
    val r = t.scan.filter("id = 9").head()
    assert(r.getDouble(2) == 7.0 && r.isNullAt(1))
  }

  test("INSERT OVERWRITE replaces contents as one versioned overwrite") {
    val t = fresh("t3")
    spark.sql("INSERT OVERWRITE ins.t3 VALUES (10, 'x', 1.0), (11, 'y', 2.0)")
    assert(t.scan.collect().map(_.getLong(0)).toSet == Set(10L, 11L))
    assert(t.snapshotAt(1).count() == 2, "previous version still time-travels")
  }

  test("INSERT INTO ... SELECT and BY NAME matching") {
    val t = fresh("t4")
    Seq((5L, 50.0, "e")).toDF("id", "amt", "v").createOrReplaceTempView("ins_src")
    spark.sql("INSERT INTO ins.t4 BY NAME SELECT amt, v, id FROM ins_src")
    val r = t.scan.filter("id = 5").head()
    assert(r.getString(1) == "e" && r.getDouble(2) == 50.0)
  }

  test("partitioned table: INSERT keeps clustering; OVERWRITE keeps layout") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-insp").toString)
    t.overwritePartitioned(
      (1L to 40L).map(i => (i, (i % 4).toString)).toDF("id", "part"),
      Seq("part"), Seq("id"))
    GraftCatalog.register(spark, "ins", "tp", t)
    spark.sql("INSERT INTO ins.tp VALUES (41, '2')")
    assert(t.scan.count() == 41)
    spark.sql("INSERT OVERWRITE ins.tp SELECT id, part FROM ins.tp WHERE part = '2'")
    assert(t.partitionCols == Seq("part"), "overwrite must keep the layout")
    assert(t.scan.count() == 11)
  }

  test("df.write.insertInto routes through the same versioned commit") {
    val t = fresh("t6")
    Seq((6L, "f", 60.0)).toDF("id", "v", "amt").write.insertInto("ins.t6")
    assert(t.scan.count() == 3)
    assert(t.latestManifest.get.version == 2L,
      "DataFrame insertInto must be a manifest commit, not loose files")
    assert(t.scan.filter("id = 6").head().getString(1) == "f")
  }

  test("arity/unknown-column errors are loud") {
    fresh("t5")
    val e1 = intercept[Exception](
      spark.sql("INSERT INTO ins.t5 VALUES (1, 'a')"))
    assert(e1.getMessage.contains("by position") ||
      e1.getMessage.contains("INSERT"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("INSERT INTO ins.t5 (nope) VALUES (1)"))
    assert(e2.getMessage.contains("unsupported") ||
      e2.getMessage.contains("nope"), e2.getMessage)
    // duplicate name in the column list would silently drop the second
    // value (first-occurrence binding) — must be rejected up front
    val e4 = intercept[Exception](
      spark.sql("INSERT INTO ins.t5 (id, ID) VALUES (7, 8)"))
    assert(e4.getMessage.contains("more than once"), e4.getMessage)
    val before = spark.table("ins.t5").count()
    assert(before == 2, "rejected INSERT must not commit")
  }

  test("INSERT INTO PARTITION: static values become literal columns") {
    val t = fresh("t7")
    // schema (id, v, amt); static v='z' → query provides (id, amt)
    spark.sql("INSERT INTO ins.t7 PARTITION (v='z') VALUES (7, 70.0)")
    val r = t.scan.filter("id = 7").head()
    assert(r.getString(1) == "z" && r.getDouble(2) == 70.0)
    // with a column list: listed columns must exclude the static one
    spark.sql("INSERT INTO ins.t7 PARTITION (v='w') (amt, id) VALUES (80.0, 8)")
    assert(t.scan.filter("id = 8").head().getString(1) == "w")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO ins.t7 PARTITION (v='q') (v, id, amt) VALUES ('x', 9, 1.0)"))
    assert(e.getMessage.contains("static"), e.getMessage)
    // dynamic spec: the column trails the query's select list
    spark.sql("INSERT INTO ins.t7 PARTITION (v) VALUES (10, 100.0, 'dyn')")
    assert(t.scan.filter("id = 10").head().getString(1) == "dyn")
  }

  test("INSERT OVERWRITE PARTITION (static) replaces exactly that slice") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-insow").toString)
    t.overwritePartitioned(
      (1L to 40L).map(i => (i, (i % 4).toString)).toDF("id", "part"),
      Seq("part"), Seq("id"))
    GraftCatalog.register(spark, "ins", "tow", t)
    val out = spark.sql(
      "INSERT OVERWRITE ins.tow PARTITION (part='2') VALUES (100), (101)")
      .collect()
    assert(out.head.getLong(0) == 2L, "one atomic commit")
    // slice replaced: old part=2 rows gone, new ones in; others untouched
    val now = spark.table("ins.tow")
    assert(now.filter("part = '2'").collect().map(_.getLong(0)).toSet
      == Set(100L, 101L))
    assert(now.filter("part <> '2'").count() == 30)
    assert(t.snapshotAt(1).filter("part = '2'").count() == 10,
      "previous version still time-travels")
  }

  test("dynamic INSERT OVERWRITE PARTITION replaces exactly the batch's slices") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-insdyn").toString)
    t.overwritePartitioned(
      (1L to 40L).map(i => (i, (i % 4).toString)).toDF("id", "part"),
      Seq("part"), Seq("id"))
    GraftCatalog.register(spark, "ins", "tdyn", t)
    // batch touches parts 1 and 3 only (dynamic col trails the select)
    spark.sql(
      "INSERT OVERWRITE ins.tdyn PARTITION (part) VALUES (200, '1'), (201, '3'), (202, '1')")
    val now = spark.table("ins.tdyn")
    assert(now.filter("part IN ('1','3')").collect().map(_.getLong(0)).toSet
      == Set(200L, 201L, 202L))
    assert(now.filter("part IN ('0','2')").count() == 20, "untouched slices intact")
    // multi-column dynamic replaces exactly the batch's TUPLES — the
    // per-column cross product (a,y) must survive
    val t2 = GraftTable(spark, Files.createTempDirectory("graft-insdyn2").toString)
    t2.overwritePartitioned(
      Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"), (4L, "b", "y"))
        .toDF("id", "p1", "p2"),
      Seq("p1", "p2"), Seq("id"))
    GraftCatalog.register(spark, "ins", "tdyn2", t2)
    spark.sql(
      "INSERT OVERWRITE ins.tdyn2 PARTITION (p1, p2) " +
        "VALUES (90, 'a', 'x'), (91, 'b', 'y')")
    val got = spark.table("ins.tdyn2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((90L, "a", "x"), (91L, "b", "y"),
      (2L, "a", "y"), (3L, "b", "x")), got)
  }

  test("INSERT INTO ... REPLACE WHERE: atomic predicate-scoped replace via SQL") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-insrw").toString)
    t.overwritePartitioned(
      (1L to 30L).map(i => (i, s"2020-01-0${(i % 3) + 1}", i * 1.0))
        .toDF("id", "day", "amt"),
      Seq("day"), Seq("id"))
    GraftCatalog.register(spark, "ins", "trw", t)
    val out = spark.sql(
      """INSERT INTO ins.trw REPLACE WHERE day = '2020-01-02'
        |SELECT id + 500, day, amt * 10 FROM ins.trw WHERE day = '2020-01-02'
        |  AND id <= 10""".stripMargin).collect()
    assert(out.head.getLong(0) == 2L, "one atomic commit")
    val now = spark.table("ins.trw")
    assert(now.filter("day = '2020-01-02'").collect().map(_.getLong(0)).toSet
      == Set(501L, 504L, 507L, 510L))
    assert(now.filter("day <> '2020-01-02'").count() == 20)
    // a row violating the predicate fails the whole statement atomically
    val e = intercept[Exception](spark.sql(
      """INSERT INTO ins.trw REPLACE WHERE day = '2020-01-01'
        |VALUES (900, '2099-01-01', 0.0)""".stripMargin))
    assert(e.getMessage.contains("replaceWhere") || e.getCause != null,
      e.getMessage)
    assert(t.latestManifest.get.version == 2L)
    // non-graft target falls through to the delegate (native parse error)
    intercept[Exception](spark.sql(
      "INSERT INTO nonexistent_pq_t REPLACE WHERE a = 1 SELECT 1"))
  }
}
