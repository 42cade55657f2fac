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
