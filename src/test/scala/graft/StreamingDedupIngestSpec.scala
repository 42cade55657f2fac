package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SketchStore
import graft.sources.GraftTable
import graft.streaming.StreamingDedupIngest

/** Continuous dedup-gated ingestion: only near-unique docs enter the
  * corpus, dups land in quarantine with their verdict, the sketch store
  * follows the corpus, and checkpoint restarts do not re-admit.
  */
class StreamingDedupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  // distinct-word docs so cross-doc jaccard is 0 unless constructed
  private def doc(seed: Int): String =
    (0 until 12).map(i => s"w${seed}x$i").mkString(" ")
  private def prefixOf(s: String): String =
    s.split(" ").take(9).mkString(" ") // 9/12 tokens → 3-gram jaccard ~0.58

  test("gate admits uniques, quarantines corpus and in-batch dups, store follows") {
    val tmp = Files.createTempDirectory("graft-dedupingest").toString
    val feed = s"$tmp/feed"
    val corpus = GraftTable(spark, s"$tmp/corpus")
    val quarantine = GraftTable(spark, s"$tmp/quarantine")
    val store = new SketchStore(spark, s"$tmp/sketch", "doc_id", "text")
    val ingest = new StreamingDedupIngest(spark, s"$feed/*.parquet",
      feedSchema, corpus, quarantine, store, "doc_id", "text", s"$tmp/ckpt",
      minJaccard = 0.5)

    // batch 1: three unique docs + an in-batch near-dup of the first
    Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)), (4L, prefixOf(doc(1))))
      .toDF("doc_id", "text").write.parquet(s"$feed/b1.parquet")
    val q = ingest.start()
    try {
      q.processAllAvailable()
      assert(corpus.snapshot.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L))
      val quar1 = quarantine.snapshot.select("doc_id", "dup_of").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(quar1 == Map(4L -> 1L))
      // store follows the corpus exactly
      assert(store.sigs.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))

      // batch 2: a corpus near-dup (of 2), a fresh doc, an exact repeat of 3
      Seq((5L, prefixOf(doc(2))), (6L, doc(6)), (7L, doc(3)))
        .toDF("doc_id", "text").write.parquet(s"$feed/b2.parquet")
      q.processAllAvailable()
      assert(corpus.snapshot.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 6L))
      val quar2 = quarantine.snapshot.select("doc_id", "dup_of").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(quar2 == Map(4L -> 1L, 5L -> 2L, 7L -> 3L))
      assert(store.sigs.select("id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 6L))
    } finally q.stop()

    // restart from the checkpoint: nothing re-admitted, new data flows,
    // and a doc duplicating a PRE-restart admit is still caught
    Seq((8L, doc(8)), (9L, prefixOf(doc(6))))
      .toDF("doc_id", "text").write.parquet(s"$feed/b3.parquet")
    val q2 = ingest.start()
    try {
      q2.processAllAvailable()
      assert(corpus.snapshot.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 6L, 8L))
      val quar3 = quarantine.snapshot.select("doc_id", "dup_of").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(quar3(9L) == 6L)
      assert(store.sigs.select("id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 6L, 8L))
    } finally q2.stop()
  }
}
