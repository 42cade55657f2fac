package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Generated columns — Delta `GENERATED ALWAYS AS (expr)` parity.
  *
  * Contract: a write that OMITS the column gets it computed during the
  * write scan; a write that PROVIDES it gets each row validated
  * (mismatch fails the job, nothing lands); rewriting ops (UPDATE,
  * merge) RECOMPUTE, so updating a source column updates the generated
  * one. The flagship use is a generated partition column (`day =
  * CAST(ts AS DATE)`): create-time auto-adds the expression's source
  * columns to the stats contract, so a range filter on the raw
  * timestamp prunes files directly — per-file min/max, no
  * predicate-derivation machinery needed.
  */
class GeneratedColsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-gen").toString

  private def mkEvents(n: Int) =
    (0 until n).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-${1 + i % 9}%02d 0${i % 9}:00:00"), s"u${i % 7}")
    }.toDF("id", "ts", "user")

  test("create with generated partition column: compute, layout, prune") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, ts TIMESTAMP, user STRING,
         |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |USING graft PARTITIONED BY (day)""".stripMargin)
    val t = GraftTable(spark, root)
    // the expression is table config under the generated namespace
    assert(t.generatedCols == Seq("day" -> "CAST(ts AS DATE)"))
    // the SOURCE column joined the declared stats contract automatically
    assert(t.declaredStatsCols.exists(_.equalsIgnoreCase("ts")))

    // batch WITHOUT the column: computed during the write
    t.append(mkEvents(900))
    val got = t.scan.filter(col("day") =!= to_date(col("ts"))).count()
    assert(got == 0)
    assert(t.scan.count() == 900)
    assert(t.scan.select(countDistinct("day")).head().getLong(0) == 9)

    // pruning on the RAW timestamp: a one-day range filter must not
    // read every file (per-file ts stats exist because day's source
    // was auto-added to the stats contract)
    val m = t.latestManifest.get
    assert(t.filesOf(m).size > 1, "need a multi-file layout to prove pruning")
    val all = t.filesOf(m).map(_.path).toSet
    t.delete("ts >= TIMESTAMP'2024-01-03 00:00:00' AND " +
      "ts < TIMESTAMP'2024-01-04 00:00:00'")
    val after = t.filesOf(t.latestManifest.get).map(_.path).toSet
    assert((all & after).nonEmpty,
      "a one-day delete rewrote every file — ts stats pruning is broken")
    assert(t.scan.filter(col("day") === lit("2024-01-03").cast("date")).count() == 0)
  }

  test("provided values validate: matching passes, mismatching fails") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, ts TIMESTAMP,
         |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |USING graft""".stripMargin)
    val t = GraftTable(spark, root)
    val good = mkEvents(10).drop("user").withColumn("day", to_date(col("ts")))
    t.append(good)
    assert(t.scan.count() == 10)

    val bad = mkEvents(3).drop("user")
      .withColumn("day", lit("1999-12-31").cast("date"))
    val e = intercept[Exception] { t.append(bad) }
    assert(GeneratedColsSpec.rootMessage(e).contains("generated column 'day'"))
    assert(t.scan.count() == 10, "a failed append must land nothing")
  }

  test("UPDATE recomputes from changed sources; SET on generated refused") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, ts TIMESTAMP,
         |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |USING graft""".stripMargin)
    val t = GraftTable(spark, root)
    t.append(mkEvents(20).drop("user"))

    // moving the timestamp moves the generated day with it
    t.update(Map("ts" -> "TIMESTAMP'2024-06-15 12:00:00'"), "id = 7")
    val moved = t.scan.filter(col("id") === 7).select("day").head().getDate(0)
    assert(moved.toString == "2024-06-15")
    // rows the update did NOT touch keep their values bit-exactly
    assert(t.scan.filter(col("day") =!= to_date(col("ts"))).count() == 0)

    val e = intercept[Exception] {
      t.update(Map("day" -> "DATE'1999-12-31'"), "id = 3")
    }
    assert(e.getMessage.contains("generated column"))

    // SQL MERGE assigning the generated column is refused too
    val e2 = intercept[Exception] {
      t.merge(Seq((3L, java.sql.Timestamp.valueOf("2024-02-02 00:00:00")))
          .toDF("id", "ts"), Seq("id"))
        .whenMatchedUpdate(Seq("day" -> "DATE'1999-12-31'"))
        .execute()
    }
    assert(e2.getMessage.contains("generated column"))

    // merge updateAll recomputes: day follows the new ts
    t.merge(Seq((5L, java.sql.Timestamp.valueOf("2024-07-01 08:00:00")))
        .toDF("id", "ts"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val d5 = t.scan.filter(col("id") === 5).select("day").head().getDate(0)
    assert(d5.toString == "2024-07-01")
  }

  test("INSERT paths: omitted column computed, SQL round-trips") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, ts TIMESTAMP,
         |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |USING graft PARTITIONED BY (day)""".stripMargin)
    val t = GraftTable(spark, root)
    mkEvents(30).drop("user").createOrReplaceTempView("gen_src")

    // explicit column list omitting the generated column
    spark.sql(s"INSERT INTO graft.`$root` (id, ts) SELECT id, ts FROM gen_src " +
      "WHERE id < 10")
    // by position, generated block omitted
    spark.sql(s"INSERT INTO graft.`$root` SELECT id, ts FROM gen_src " +
      "WHERE id >= 10 AND id < 20")
    // by position, full width (provided + validated)
    spark.sql(s"INSERT INTO graft.`$root` SELECT id, ts, CAST(ts AS DATE) " +
      "FROM gen_src WHERE id >= 20")
    assert(t.scan.count() == 30)
    assert(t.scan.filter(col("day") =!= to_date(col("ts"))).count() == 0)

    // INSERT OVERWRITE a generated-partition slice: batch lacks `day`,
    // the funnel computes it and the slice gate validates it
    mkEvents(5).drop("user")
      .withColumn("ts", lit("2024-01-02 03:00:00").cast("timestamp"))
      .createOrReplaceTempView("gen_jan2")
    spark.sql(s"INSERT OVERWRITE graft.`$root` " +
      "PARTITION (day='2024-01-02') SELECT id, ts FROM gen_jan2")
    assert(t.scan.filter(col("day") === lit("2024-01-02").cast("date"))
      .count() == 5)
    // a static spec that DISAGREES with the rows' computed day is loud,
    // and nothing lands in the wrong slice
    val before = t.scan.groupBy("day").count().collect().toSet
    val e = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE graft.`$root` " +
        "PARTITION (day='2024-03-03') SELECT id, ts FROM gen_jan2")
    }
    assert(GeneratedColsSpec.rootMessage(e).contains("generated column 'day'") ||
      GeneratedColsSpec.rootMessage(e).contains("replaceWhere"))
    assert(t.scan.groupBy("day").count().collect().toSet == before)
  }

  test("schema ops: source guarded, SHOW CREATE round-trips, drop retires") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, ts TIMESTAMP,
         |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |USING graft""".stripMargin)
    val t = GraftTable(spark, root)
    t.append(mkEvents(6).drop("user"))

    // the generation source can be neither renamed nor dropped
    assert(intercept[Exception] { t.renameColumn("ts", "event_ts") }
      .getMessage.contains("generated column day"))
    assert(intercept[Exception] { t.dropColumn("ts") }
      .getMessage.contains("generated column day"))
    // adding a generated column later is refused (no stored values)
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN yr INT GENERATED " +
        "ALWAYS AS (year(ts))")
    }.getMessage.contains("generated column"))

    // SHOW CREATE TABLE carries the expression; the statement re-executes
    // with full semantics at a fresh location
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$root`").head().getString(0)
    assert(ddl.contains("graft.generated.day"))
    val root2 = s"${tmp()}/t2"
    spark.sql(ddl.replace(root, root2))
    val t2 = GraftTable(spark, root2)
    assert(t2.generatedCols == Seq("day" -> "CAST(ts AS DATE)"))
    t2.append(mkEvents(4).drop("user"))
    assert(t2.scan.filter(col("day") =!= to_date(col("ts"))).count() == 0)

    // renaming the GENERATED column re-keys its expression; dropping it
    // retires the expression with it
    t.renameColumn("day", "event_day")
    assert(t.generatedCols == Seq("event_day" -> "CAST(ts AS DATE)"))
    t.append(mkEvents(2).drop("user"))
    assert(t.scan.filter(col("event_day") =!= to_date(col("ts"))).count() == 0)
    t.dropColumn("event_day")
    assert(t.generatedCols.isEmpty)
    t.append(mkEvents(2).drop("user")) // no contract left to enforce
    assert(t.scan.count() == 10)
  }

  test("declaration is validated: refs, determinism, time, type, nesting") {
    val root = s"${tmp()}/t"
    def create(colDef: String): Unit = {
      val r = s"${tmp()}/v"
      spark.sql(s"CREATE TABLE graft.`$r` (id BIGINT, ts TIMESTAMP, $colDef) " +
        "USING graft")
    }
    assert(intercept[Exception] {
      create("d DATE GENERATED ALWAYS AS (CAST(nope AS DATE))")
    }.getMessage.contains("unknown column nope"))
    assert(intercept[Exception] {
      create("d DOUBLE GENERATED ALWAYS AS (rand())")
    }.getMessage.contains("non-deterministic"))
    assert(intercept[Exception] {
      create("d DATE GENERATED ALWAYS AS (current_date())")
    }.getMessage.contains("current time"))
    assert(intercept[Exception] {
      create("d ARRAY<INT> GENERATED ALWAYS AS (CAST(ts AS DATE))")
    }.getMessage.contains("cannot cast"))
    // a generated column may not read another generated column
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$root` (ts TIMESTAMP, " +
        "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)), " +
        "y INT GENERATED ALWAYS AS (year(d))) USING graft")
    }.getMessage.contains("generated column"))
  }

  test("generated and identity columns never mix") {
    // a generated expression may not read an identity column: writes
    // compute generated columns BEFORE the identity fill, so the
    // expression would see NULL (either declaration order in the DDL)
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmp()}/a` (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, " +
        "nxt BIGINT GENERATED ALWAYS AS (id + 1)) USING graft")
    }.getMessage.contains("identity"))
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmp()}/b` (" +
        "nxt BIGINT GENERATED ALWAYS AS (id + 1), " +
        "id BIGINT GENERATED ALWAYS AS IDENTITY) USING graft")
    }.getMessage.contains("identity"))
    // ALTER direction 1: declare generated over an existing identity col
    val r1 = s"${tmp()}/c"
    spark.sql(s"CREATE TABLE graft.`$r1` " +
      "(id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) USING graft")
    val t1 = GraftTable(spark, r1)
    assert(intercept[Exception] { t1.addGenerated("v", "CAST(id AS STRING)") }
      .getMessage.contains("identity"))
    // ...nor may the identity column itself carry a generation expr
    assert(intercept[Exception] { t1.addGenerated("id", "length(v)") }
      .getMessage.contains("identity"))
    // ALTER direction 2: declare identity on a generated-referenced col
    val r2 = s"${tmp()}/d"
    spark.sql(s"CREATE TABLE graft.`$r2` (base BIGINT, " +
      "dbl BIGINT GENERATED ALWAYS AS (base * 2)) USING graft")
    val t2 = GraftTable(spark, r2)
    assert(intercept[Exception] { t2.addIdentity("base", 1L, 1L, byDefault = false) }
      .getMessage.contains("generated"))
    // TBLPROPERTIES route enforces the same, regardless of key order
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmp()}/e` (id BIGINT, nxt BIGINT) " +
        "USING graft TBLPROPERTIES (" +
        "'graft.generated.nxt' = 'id + 1', " +
        "'graft.identity.id' = 'start=1;step=1;mode=always')")
    }.getMessage.contains("identity"))
  }

  test("COPY INTO: absent column computed, wrong linked values refused") {
    val root = s"${tmp()}/t"
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, ts TIMESTAMP,
         |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |USING graft""".stripMargin)
    val t = GraftTable(spark, root)

    // source files lacking the generated column: casting funnel computes
    val src1 = s"${tmp()}/src1"
    mkEvents(8).drop("user").write.parquet(src1)
    t.copyInto(src1)
    assert(t.scan.count() == 8)
    assert(t.scan.filter(col("day") =!= to_date(col("ts"))).count() == 0)

    // exact-schema source files carrying WRONG values: the link path's
    // validation pass refuses, and nothing lands
    val src2 = s"${tmp()}/src2"
    mkEvents(3).drop("user")
      .withColumn("day", lit("1999-12-31").cast("date"))
      .write.parquet(src2)
    val e = intercept[Exception] { t.copyInto(src2) }
    assert(e.getMessage.contains("generated column 'day'"))
    assert(t.scan.count() == 8)
  }
}

object GeneratedColsSpec {
  /** Innermost cause message — raise_error surfaces wrapped in Spark's
    * job-failure exception chain.
    */
  def rootMessage(e: Throwable): String = {
    var c: Throwable = e
    val sb = new StringBuilder
    while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
    sb.result()
  }
}
