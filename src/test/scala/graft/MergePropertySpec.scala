package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Property: for ANY sequence of change batches, the merged table equals
  * a sequential last-writer-wins fold of the batches (SURVEY §5's
  * property-based requirement). Ops: I/U upsert, D delete (corrected
  * mode). Generators are driven with fixed seeds so failures replay.
  */
class MergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("broadcast fast-path guard is bytes-aware, not just row-count") {
    import org.apache.spark.sql.types._
    import graft.operators.MergeBuilder
    val narrow = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    val wide = StructType(
      (1 to 5).map(i => StructField(s"k$i", StringType)) :+
        StructField("v", DoubleType))
    val wNarrow = MergeBuilder.keyWidthBytes(narrow, Seq("k"))
    val wWide = MergeBuilder.keyWidthBytes(wide, (1 to 5).map(i => s"k$i"))
    // a 4M-row narrow-key batch broadcasts (~96 MB est.) ...
    assert(MergeBuilder.broadcastable(4000000L, wNarrow))
    // ... the same row count with a 5-string composite key (~460 MB est.)
    // must NOT — the rows-only guard was blind to exactly this
    assert(!MergeBuilder.broadcastable(4000000L, wWide))
    // small batches broadcast regardless of key width
    assert(MergeBuilder.broadcastable(10000L, wWide))
    // the legacy row bound still caps narrow keys
    assert(!MergeBuilder.broadcastable(MergeBuilder.BroadcastSourceRows + 1, 8L))
  }

  private val opGen = Gen.frequency((4, "I"), (3, "U"), (2, "D"))
  private val rowGen = for {
    id <- Gen.choose(0L, 30L) // small key space → lots of collisions
    v <- Gen.choose(0, 1000)
    op <- opGen
  } yield (id, v, op)
  private val batchGen: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(12, rowGen).map(_.groupBy(_._1).map(_._2.head).toList) // unique ids per batch
  private val scenarioGen: Gen[List[List[(Long, Int, String)]]] =
    Gen.listOfN(4, batchGen)

  for (seed <- 1 to 8)
    test(s"merge sequence == last-writer-wins fold (seed $seed)") {
      val scenario = scenarioGen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail("generator produced no value"))
      val t = GraftTable(spark, Files.createTempDirectory("graft-prop").toString)
      var model = Map.empty[Long, (Int, String)]
      var first = true
      for (batch <- scenario if batch.nonEmpty) {
        if (first) {
          // first-load path: full load carries no deletes (extractor
          // filters them the same way)
          val inserts = batch.filter(_._3 != "D")
          t.overwrite(inserts.toDF("id", "v", "op"), Some("id"))
          model = inserts.map(r => r._1 -> (r._2, r._3)).toMap
          first = false
        } else {
          t.merge(batch.toDF("id", "v", "op"), Seq("id"))
            .whenMatchedUpdateAll().whenNotMatchedInsertAll()
            .whenMatchedDelete("op = 'D'").execute()
          for ((id, v, op) <- batch)
            if (op == "D") model -= id else model += id -> (v, op)
        }
      }
      val got = t.snapshot.select("id", "v", "op").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(got == model, s"table state diverged from fold; scenario=$scenario")
    }

  // The general (full-outer) path runs whenever the clause set is not
  // updateAll+insertAll; give it its own fold families.
  for (seed <- 1 to 4)
    test(s"update-only merge sequence == fold, general path (seed $seed)") {
      val scenario = scenarioGen(Gen.Parameters.default, Seed(100L + seed))
        .getOrElse(fail("generator produced no value"))
      val t = GraftTable(spark, Files.createTempDirectory("graft-prop-u").toString)
      var model = Map.empty[Long, (Int, String)]
      var first = true
      for (batch <- scenario if batch.nonEmpty) {
        if (first) {
          val inserts = batch.filter(_._3 != "D")
          t.overwrite(inserts.toDF("id", "v", "op"), Some("id"))
          model = inserts.map(r => r._1 -> (r._2, r._3)).toMap
          first = false
        } else {
          t.merge(batch.toDF("id", "v", "op"), Seq("id"))
            .whenMatchedUpdateAll()
            .whenMatchedDelete("op = 'D'").execute()
          for ((id, v, op) <- batch if model.contains(id))
            if (op == "D") model -= id else model += id -> (v, op)
        }
      }
      val got = t.snapshot.select("id", "v", "op").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(got == model, s"update-only fold diverged; scenario=$scenario")
    }

  for (seed <- 1 to 4)
    test(s"insert-only merge sequence == fold, general path (seed $seed)") {
      val scenario = scenarioGen(Gen.Parameters.default, Seed(200L + seed))
        .getOrElse(fail("generator produced no value"))
      val t = GraftTable(spark, Files.createTempDirectory("graft-prop-i").toString)
      var model = Map.empty[Long, (Int, String)]
      var first = true
      for (batch <- scenario if batch.nonEmpty) {
        if (first) {
          val inserts = batch.filter(_._3 != "D")
          t.overwrite(inserts.toDF("id", "v", "op"), Some("id"))
          model = inserts.map(r => r._1 -> (r._2, r._3)).toMap
          first = false
        } else {
          // no matched clause: matched rows pass through untouched
          t.merge(batch.toDF("id", "v", "op"), Seq("id"))
            .whenNotMatchedInsertAll().execute()
          for ((id, v, op) <- batch if !model.contains(id))
            model += id -> (v, op)
        }
      }
      val got = t.snapshot.select("id", "v", "op").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(got == model, s"insert-only fold diverged; scenario=$scenario")
    }
}
