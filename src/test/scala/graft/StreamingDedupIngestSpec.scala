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

  private def mkIngest(tmp: String, cap: Int = 10000,
      vacEvery: Int = 0): StreamingDedupIngest = {
    val corpus = GraftTable(spark, s"$tmp/corpus")
    val quarantine = GraftTable(spark, s"$tmp/quarantine")
    val store = new SketchStore(spark, s"$tmp/sketch", "doc_id", "text")
    new StreamingDedupIngest(spark, s"$tmp/feed/*.parquet", feedSchema,
      corpus, quarantine, store, "doc_id", "text", s"$tmp/ckpt",
      minJaccard = 0.5, maxIsinCandidates = cap,
      quarantineVacuumEvery = vacEvery, quarantineVacuumKeep = 2,
      quarantineVacuumMinAgeMs = 0L)
  }

  test("all-duplicate batch 100x the isin cap gates via semi-join, not isin") {
    val tmp = Files.createTempDirectory("graft-dedupcap").toString
    val ingest = mkIngest(tmp, cap = 2)
    ingest.gateBatch(
      Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3))).toDF("doc_id", "text"), 0L)
    // 200 rows, every one a near-dup of a corpus doc: 3 distinct corpus
    // partners > cap 2 forces the fallback read path
    val big = (101L to 300L)
      .map(i => (i, prefixOf(doc((i % 3 + 1).toInt))))
      .toDF("doc_id", "text")
    ingest.gateBatch(big, 1L)
    val corpus = GraftTable(spark, s"$tmp/corpus")
    val quarantine = GraftTable(spark, s"$tmp/quarantine")
    assert(corpus.snapshot.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L), "no duplicate may enter the corpus")
    assert(quarantine.snapshot.count() == 200)
    // the over-cap plan must be a semi-join with no isin literal list
    val candIds = Seq(1L, 2L, 3L).toDF("id_b")
    val plan = ingest.corpusTextsFor(candIds, big)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains(" IN ("), s"over-cap read must not inline ids: $plan")
    // and at-or-under cap the point read keeps its isin pruning
    val pruned = ingest.corpusTextsFor(Seq(1L, 2L).toDF("id_b"), big)
      .queryExecution.optimizedPlan.toString
    assert(pruned.contains("IN (") || pruned.contains("= "), pruned)
  }

  test("quarantine writes are replay-idempotent (merge, not append)") {
    val tmp = Files.createTempDirectory("graft-dedupidem").toString
    val ingest = mkIngest(tmp)
    ingest.gateBatch(
      Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text"), 0L)
    ingest.gateBatch(
      Seq((5L, prefixOf(doc(1))), (6L, doc(6))).toDF("doc_id", "text"), 1L)
    val quarantine = GraftTable(spark, s"$tmp/quarantine")
    val before = quarantine.snapshot.collect().toSet
    assert(before.map(_.getAs[Long]("doc_id")) == Set(5L))
    // a crash between the quarantine write and the corpus commit replays
    // the identical rejected rows — the merge must converge, not append
    ingest.quarantineRejected(quarantine.snapshot)
    assert(quarantine.snapshot.collect().toSet == before)
  }

  test("quarantine vacuum keeps manifests bounded across rejecting batches") {
    val tmp = Files.createTempDirectory("graft-dedupvac").toString
    val ingest = mkIngest(tmp, vacEvery = 2)
    ingest.gateBatch(
      Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text"), 0L)
    // every later batch rejects one near-dup → one quarantine version each
    for (b <- 1 to 8)
      ingest.gateBatch(
        Seq((100L + b, prefixOf(doc(1)))).toDF("doc_id", "text"), b.toLong)
    val quarantine = GraftTable(spark, s"$tmp/quarantine")
    assert(quarantine.snapshot.count() == 8)
    val manifests = {
      val s = Files.list(java.nio.file.Paths.get(s"$tmp/quarantine/_graft"))
      try {
        val it = s.iterator()
        var n = 0
        while (it.hasNext) {
          if (it.next().getFileName.toString.startsWith("manifest-v")) n += 1
        }
        n
      } finally s.close()
    }
    assert(manifests <= 3,
      s"8 rejecting batches with vacuumEvery=2/keep=2 left $manifests manifests")
  }
}
