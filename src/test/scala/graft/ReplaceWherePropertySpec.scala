package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Randomized reference-model check for [[GraftTable.overwriteWhere]]:
  * for arbitrary (table, predicate, batch-satisfying-predicate) the
  * committed snapshot must equal `table.filter(!pred) ∪ batch` — the
  * declarative definition of replaceWhere — across slice shapes,
  * partition layouts, empty batches and no-match predicates.
  */
class ReplaceWherePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dynamic INSERT OVERWRITE PARTITION == reference, random trials") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 6) {
      val nSlices = 2 + rnd.nextInt(4)
      val rows = 40 + rnd.nextInt(100)
      val data = (0 until rows).map { i =>
        (i.toLong, s"p${rnd.nextInt(nSlices)}", rnd.nextInt(100).toDouble)
      }
      val t = graft.sources.GraftTable(spark,
        Files.createTempDirectory(s"graft-dynp$trial").toString)
      t.overwritePartitioned(data.toDF("id", "part", "amt"),
        Seq("part"), Seq("id"))
      graft.sources.GraftCatalog.register(spark, "rwp", s"dyn$trial", t)
      // batch touches a random subset of slices (possibly one the table
      // does not have)
      val touched = (0 until 1 + rnd.nextInt(2))
        .map(_ => s"p${rnd.nextInt(nSlices + 1)}").distinct
      val batchRows = (0 until 1 + rnd.nextInt(25)).map { i =>
        (5000L + i, touched(rnd.nextInt(touched.length)),
          rnd.nextInt(100).toDouble)
      }
      batchRows.toDF("id", "part", "amt").createOrReplaceTempView("rwp_src")
      spark.sql(
        s"""INSERT OVERWRITE rwp.dyn$trial PARTITION (part)
           |SELECT id, amt, part FROM rwp_src""".stripMargin)
      val expected = (data.filterNot(r => touched.contains(r._2)) ++ batchRows)
        .toSet
      val got = t.scan.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"trial $trial touched=$touched batch=${batchRows.size}: " +
          s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("multi-column dynamic INSERT OVERWRITE == reference, random trials") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 6) {
      val data = (0 until 80 + rnd.nextInt(80)).map { i =>
        (i.toLong, s"r${rnd.nextInt(3)}",
          if (rnd.nextInt(6) == 0) null else s"d${rnd.nextInt(3)}",
          rnd.nextInt(100).toDouble)
      }
      val t = graft.sources.GraftTable(spark,
        Files.createTempDirectory(s"graft-mdp$trial").toString)
      t.overwritePartitioned(data.toDF("id", "reg", "day", "amt"),
        Seq("reg", "day"), Seq("id"))
      graft.sources.GraftCatalog.register(spark, "rwp", s"mdp$trial", t)
      // batch tuples include a NULL day slice and slices absent from the
      // table — both must replace exactly their own (reg, day) tuple
      val batchRows = (0 until 1 + rnd.nextInt(30)).map { i =>
        (9000L + i, s"r${rnd.nextInt(4)}",
          if (rnd.nextInt(5) == 0) null else s"d${rnd.nextInt(4)}",
          rnd.nextInt(100).toDouble)
      }
      batchRows.toDF("id", "reg", "day", "amt")
        .createOrReplaceTempView("rwp_msrc")
      spark.sql(
        s"""INSERT OVERWRITE rwp.mdp$trial PARTITION (reg, day)
           |SELECT id, amt, reg, day FROM rwp_msrc""".stripMargin)
      val touched = batchRows.map(r => (r._2, r._3)).toSet
      val expected =
        (data.filterNot(r => touched((r._2, r._3))) ++ batchRows).toSet
      val got = t.scan.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3))).toSet
      assert(got == expected,
        s"trial $trial touched=$touched batch=${batchRows.size}: " +
          s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("multi-column dynamic overwrite with MANY tuples (codegen-size hazard)") {
    // ~150 distinct (reg, day) tuples → a ~150-term OR of null-safe
    // conjunctions in the replace predicate. The test session bans
    // codegen fallback, so this also proves the big predicate compiles
    // (or plans) cleanly instead of dying at the 64KB method limit.
    val data = (0 until 600).map(i =>
      (i.toLong, s"r${i % 10}", s"d${i % 15}", i * 1.0))
    val t = graft.sources.GraftTable(spark,
      Files.createTempDirectory("graft-manytuples").toString)
    t.overwritePartitioned(data.toDF("id", "reg", "day", "amt"),
      Seq("reg", "day"), Seq("id"))
    graft.sources.GraftCatalog.register(spark, "rwp", "many", t)
    val batch = (0 until 600).map(i =>
      (7000L + i, s"r${i % 10}", s"d${i % 15}", 7.0)) // all 150 tuples
    batch.toDF("id", "reg", "day", "amt").createOrReplaceTempView("rwp_many")
    spark.sql(
      """INSERT OVERWRITE rwp.many PARTITION (reg, day)
        |SELECT id, amt, reg, day FROM rwp_many""".stripMargin)
    val got = t.scan.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(got == batch.toSet,
      s"every tuple present in the batch must be replaced: size=${got.size}")
    // over the 1000-tuple cap → loud error, nothing committed
    val big = (0 until 2500).map(i =>
      (50000L + i, s"R$i", s"D$i", 1.0))
    big.toDF("id", "reg", "day", "amt").createOrReplaceTempView("rwp_big")
    val before = t.latestManifest.get.version
    val e = intercept[Exception](spark.sql(
      """INSERT OVERWRITE rwp.many PARTITION (reg, day)
        |SELECT id, amt, reg, day FROM rwp_big""".stripMargin))
    assert(e.getMessage != null &&
      (e.getMessage.contains("1000") || e.getCause != null &&
        e.getCause.getMessage.contains("1000")), e.toString)
    assert(t.latestManifest.get.version == before, "no partial commit")
  }

  test("5-entry PARTITION spec binds dynamic columns by partition order") {
    // a Map-backed spec loses declaration order past 4 entries — the
    // dynamic columns must bind the query's trailing columns by the
    // TABLE's partition-column order, not Map iteration order, or p4/p5
    // silently swap values
    val data = (0 until 40).map(i =>
      (i.toLong, "a", "b", "c", s"x${i % 2}", s"y${i % 3}", i.toDouble))
    val df = data.toDF("id", "p1", "p2", "p3", "p4", "p5", "amt")
    val t = graft.sources.GraftTable(spark,
      Files.createTempDirectory("graft-bind5").toString)
    t.overwritePartitioned(df, Seq("p1", "p2", "p3", "p4", "p5"), Seq("id"))
    graft.sources.GraftCatalog.register(spark, "rwp", "bind5", t)
    Seq((7777L, "x0", "y9", 99.0)).toDF("id", "p4", "p5", "amt")
      .createOrReplaceTempView("rwp_bind5_src")
    for (overwrite <- Seq(false, true)) {
      val verb = if (overwrite) "INSERT OVERWRITE" else "INSERT INTO"
      spark.sql(
        s"""$verb rwp.bind5 PARTITION (p1='a', p2='b', p3='c', p4, p5)
           |SELECT id, amt, p4, p5 FROM rwp_bind5_src""".stripMargin)
      val got = t.scan.filter(col("id") === 7777L)
        .select("p4", "p5").collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq == Seq(("x0", "y9")),
        s"$verb bound dynamic columns wrong: ${got.toSeq}")
    }
    // the overwrite pass must have replaced exactly the (a,b,c,x0,y9)
    // slice (which held only the INSERT INTO row) — everything else rides
    assert(t.scan.count() == data.size + 1)
  }

  test("static PARTITION null value addresses the NULL slice") {
    val data = Seq((1L, "d1", 1.0), (2L, null, 2.0), (3L, null, 3.0),
      (4L, "d2", 4.0))
    val t = graft.sources.GraftTable(spark,
      Files.createTempDirectory("graft-nullslice").toString)
    t.overwritePartitioned(data.toDF("id", "day", "amt"),
      Seq("day"), Seq("id"))
    graft.sources.GraftCatalog.register(spark, "rwp", "nullslice", t)
    // unquoted null → the NULL slice: rows 2 and 3 replaced, d1/d2 ride
    spark.sql(
      "INSERT OVERWRITE rwp.nullslice PARTITION (day=null) " +
        "SELECT id, amt FROM VALUES (50L, 5.0), (51L, 6.0) AS v(id, amt)")
    val got = t.scan.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "d1", 1.0), (4L, "d2", 4.0),
      (50L, null, 5.0), (51L, null, 6.0)), got)
  }

  test("random slices: snapshot == keep-rows union batch, every trial") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 12) {
      val nSlices = 2 + rnd.nextInt(5)            // 2..6 slices
      val rows = 50 + rnd.nextInt(150)
      val partitioned = rnd.nextBoolean()
      val data = (0 until rows).map { i =>
        (i.toLong, s"s${rnd.nextInt(nSlices)}", rnd.nextInt(1000).toDouble)
      }
      val df = data.toDF("id", "slice", "amt")
      val t = GraftTable(spark,
        Files.createTempDirectory(s"graft-rwp$trial").toString)
      if (partitioned) t.overwritePartitioned(df, Seq("slice"), Seq("id"))
      else t.overwriteStats(df, Seq("id"))

      // predicate: one or two target slices (sometimes absent from the
      // table — the no-match shape), batch sized 0..40 rows inside them
      val targets = (0 until 1 + rnd.nextInt(2))
        .map(_ => s"s${rnd.nextInt(nSlices + 1)}").distinct // +1 → maybe absent
      val pred = targets.map(s => s"slice = '$s'").mkString(" OR ")
      val batchRows = (0 until rnd.nextInt(41)).map { i =>
        (10000L + i, targets(rnd.nextInt(targets.length)),
          rnd.nextInt(1000).toDouble)
      }
      val batch = batchRows.toDF("id", "slice", "amt")

      t.overwriteWhere(batch, pred)

      val expected = (data.filterNot(r => targets.contains(r._2)) ++ batchRows)
        .toSet
      val got = t.scan.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"trial $trial (partitioned=$partitioned targets=$targets " +
          s"batch=${batchRows.size}): " +
          s"missing=${expected -- got}, extra=${got -- expected}")
    }
  }
}
