package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.pipeline.SketchStore
import graft.sources.GraftTable

/** Property: for ANY interleaving of source operations (feed-publishing
  * merges with inserts/updates/deletes, maintenance compactions,
  * feed-off appends, full overwrites) and ANY sync cadence (every
  * operation, batched windows, or only at the end), the follower store
  * equals a from-scratch derivation of the source snapshot after every
  * sync. Fixed seeds so failures replay.
  */
class FollowerPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wordGen = Gen.choose(0, 20).map(i => s"w$i")
  private val textGen = Gen.listOfN(6, wordGen).map(_.mkString(" "))
  private val rowGen = for {
    id <- Gen.choose(0L, 40L)
    text <- textGen
    op <- Gen.frequency((4, "I"), (3, "U"), (2, "D"))
  } yield (id, text, op)
  private val batchGen: Gen[List[(Long, String, String)]] =
    Gen.listOfN(10, rowGen).map(_.groupBy(_._1).map(_._2.head).toList)
  private val stepGen: Gen[(String, List[(Long, String, String)], Boolean)] = for {
    op <- Gen.frequency(
      (6, "merge"), (1, "compact"), (1, "appendOff"), (1, "overwrite"))
    batch <- batchGen
    sync <- Gen.oneOf(true, false) // random cadence → multi-version windows
  } yield (op, batch, sync)
  private val scenarioGen = Gen.listOfN(6, stepGen)

  private def freshSigs(t: GraftTable): Set[(Long, String)] =
    t.snapshot.select(col("doc_id"),
      TextFunctions.minhashSignature(
        TextFunctions.wordShingles(
          TextFunctions.tokens(col("text")), 3), 64).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).mkString(",")).toSet

  private def storedSigs(store: SketchStore): Set[(Long, String)] =
    store.sigs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).mkString(",")).toSet

  for (seed <- 1 to 6)
    test(s"store == derive(snapshot) after every sync (seed $seed)") {
      val scenario = scenarioGen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail("generator produced no value"))
      val tmp = Files.createTempDirectory("graft-follower-prop").toString
      val source = GraftTable(spark, s"$tmp/source")
      val store = new SketchStore(spark, s"$tmp/sketch", "doc_id", "text")

      val initial = scenario.head._2.filter(_._3 != "D")
        .map { case (id, t, _) => (id, t) }
      source.overwriteStats(
        (if (initial.nonEmpty) initial else List((0L, "w0 w1")))
          .toDF("doc_id", "text"), Seq("doc_id"))
      source.publishInitialSnapshot()
      assert(store.syncFrom(source) == 1L)
      assert(storedSigs(store) == freshSigs(source))

      var appendId = 1000L
      for (((op, batch, sync), i) <- scenario.zipWithIndex) {
        op match {
          case "merge" =>
            source.merge(batch.toDF("doc_id", "text", "op"), Seq("doc_id"))
              .whenMatchedUpdateAll().whenNotMatchedInsertAll()
              .whenMatchedDelete("op = 'D'")
              .withChangeFeed().execute()
          case "compact" => source.compact()
          case "appendOff" => // fresh keys: appends must not duplicate pks
            val rows = batch.take(3).map { case (_, t, _) =>
              appendId += 1; (appendId, t)
            }
            if (rows.nonEmpty)
              source.appendStats(rows.toDF("doc_id", "text"), Seq("doc_id"))
          case "overwrite" =>
            val rows = batch.filter(_._3 != "D").map { case (id, t, _) => (id, t) }
            source.overwriteStats(
              (if (rows.nonEmpty) rows else List((0L, "w0 w1")))
                .toDF("doc_id", "text"), Seq("doc_id"))
        }
        if (sync) {
          store.syncFrom(source)
          assert(storedSigs(store) == freshSigs(source),
            s"diverged after step $i ($op); scenario=$scenario")
        }
      }
      store.syncFrom(source)
      assert(storedSigs(store) == freshSigs(source),
        s"diverged at final sync; scenario=$scenario")
    }
}
