package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.pipeline.AnnIndexStore
import graft.sources.GraftTable

/** The persisted IVF index must rank exactly like the ad-hoc ivfTopK
  * with the same pinned centroids, across full syncs, incremental
  * updates, deletes, and retrains.
  */
class AnnIndexStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.table(spark, sf, "embeddings")

  private def newStore(): (GraftTable, AnnIndexStore) = {
    val tmp = Files.createTempDirectory("graft-annstore").toString
    (GraftTable(spark, s"$tmp/source"),
      new AnnIndexStore(spark, s"$tmp/index", k = 8, spill = 2))
  }

  private def queries: DataFrame = emb.filter(col("vec_id") >= 400)
    .limit(10).select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def ranks(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("qid", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def adhoc(store: AnnIndexStore, corpus: DataFrame): DataFrame =
    Similarity.ivfTopK(queries, corpus, 3, store.centroids, nprobe = 3,
      excludeSelf = false, spill = 2)

  test("stored index ranks identically to ad-hoc ivfTopK; increments stay exact") {
    val (source, store) = newStore()
    source.overwriteStats(emb.filter(col("vec_id") < 400), Seq("vec_id"))
    source.publishInitialSnapshot()
    assert(store.syncFrom(source) == 1L)
    assert(ranks(store.topK(queries, 3, nprobe = 3)) ==
      ranks(adhoc(store, source.snapshot)))

    // v2: update 50 vectors (reverse them — big angular move), insert 50
    source.merge(
      emb.filter(col("vec_id") < 50)
        .withColumn("embedding", reverse(col("embedding")))
        .unionByName(emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)),
      Seq("vec_id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withChangeFeed().execute()
    assert(store.syncFrom(source) == 2L)
    // assignments equal a from-scratch assignment of the new snapshot
    val want = source.snapshot.select(col("vec_id"),
      Similarity.centroidTopCids(col("embedding"), store.centroids, 2).as("cids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = store.table.snapshot.select("vec_id", "cids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == want)
    assert(ranks(store.topK(queries, 3, nprobe = 3)) ==
      ranks(adhoc(store, source.snapshot)))
  }

  test("deletes leave the inverted lists; retrain forces the full path") {
    val (source, store) = newStore()
    source.overwriteStats(emb.filter(col("vec_id") < 300), Seq("vec_id"))
    source.publishInitialSnapshot()
    store.syncFrom(source)

    source.merge(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
        .withColumn("op", lit("D")),
      Seq("vec_id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'").withChangeFeed().execute()
    assert(store.syncFrom(source) == 2L)
    assert(store.table.snapshot
      .filter(col("vec_id") >= 100 && col("vec_id") < 200).count() == 0)
    val hits = store.topK(queries, 3, nprobe = 8)
      .filter(col("neighbor_id") >= 100 && col("neighbor_id") < 200)
    assert(hits.count() == 0)

    val oldCents = store.centroids
    store.retrain()
    assert(store.syncedVersion.isEmpty) // forgotten centroids → full path
    assert(store.syncFrom(source) == 2L)
    assert(store.table.latestManifest.flatMap(_.operation)
      .contains("overwrite"))
    // retrained on the post-delete corpus, assignments consistent again
    assert(ranks(store.topK(queries, 3, nprobe = 3)) ==
      ranks(adhoc(store, source.snapshot)))
    assert(store.centroids.length == oldCents.length)
  }

  test("a losing full resync never publishes its centroids over the winner's") {
    val tmp = Files.createTempDirectory("graft-annrace").toString
    val source = GraftTable(spark, s"$tmp/source")
    // victim: a racer trains AND COMMITS on more data while this store is
    // still training — the worst-case interleave, where the victim's
    // model write would land LAST and clobber the winner's
    class RacingStore extends AnnIndexStore(spark, s"$tmp/index", k = 8, spill = 2) {
      var onTrain: () => Unit = () => ()
      override protected def beforeFullResync(s: DataFrame): Unit = {
        onTrain()
        super.beforeFullResync(s)
      }
    }
    val victim = new RacingStore
    val racer = new AnnIndexStore(spark, s"$tmp/index", k = 8, spill = 2)
    source.overwriteStats(emb.filter(col("vec_id") < 200), Seq("vec_id"))
    source.publishInitialSnapshot()
    victim.onTrain = () => {
      source.appendWithChangeFeed(
        emb.filter(col("vec_id") >= 200 && col("vec_id") < 500), Seq("vec_id"))
      racer.syncFrom(source) // trains on v2's 500 vectors and wins
      ()
    }
    // the victim targeted v1, lost, and converged to the racer's commit
    assert(victim.syncFrom(source) == 1L)
    assert(victim.syncedVersion.contains(2L))
    // THE invariant: the published centroids assign every stored row to
    // exactly its stored inverted lists — model and rows are the same
    // sync's (the racer's), not a Frankenstein of both
    val cents = victim.centroids
    val mismatched = victim.table.snapshot
      .withColumn("expect",
        Similarity.centroidTopCids(col("embedding"), cents, 2))
      .filter(col("cids") =!= col("expect"))
    assert(mismatched.count() == 0,
      "stored inverted lists disagree with the published quantizer")
    // and the store still ranks identically to ad-hoc with those centroids
    assert(ranks(victim.topK(queries, 3, nprobe = 3)) ==
      ranks(adhoc(victim, source.snapshot)))
  }
}
