package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup
import graft.pipeline.SketchStore
import graft.sources.GraftTable

/** Continuous dedup-gated ingestion: subscribe to a document feed, and
  * per micro-batch admit only rows that are not near-duplicates — of
  * the corpus OR of a smaller-id row in the same batch — into the
  * corpus table; rejected rows land in a quarantine table with their
  * `dup_of` verdict. The corpus sketch store is the gate's memory: it
  * serves the corpus-side signatures and is re-synced from the
  * corpus's change feed after each admit, closing the loop.
  *
  * The 100 TB shape, per batch:
  *  - batch documents are hashed ONCE ([[Dedup.minhashSigs]]);
  *  - corpus-side candidates come from the STORED sketch table — the
  *    corpus text is never scanned for candidate generation;
  *  - the exact-Jaccard verify reads corpus text ONLY for candidate
  *    partner ids, through a stats-pruned [[GraftTable.scan]] (`isin`
  *    on the bounded candidate id set pushes into manifest min/max
  *    file pruning), so verification touches O(matched files), not
  *    O(corpus);
  *  - admits merge with a txn marker (replays skip idempotently, same
  *    contract as [[StreamingSilverLoader]]) and publish their change
  *    feed, which the store sync then applies — O(admitted).
  */
class StreamingDedupIngest(
    spark: SparkSession,
    feedDir: String,
    feedSchema: StructType,
    corpus: GraftTable,
    quarantine: GraftTable,
    store: SketchStore,
    idCol: String,
    textCol: String,
    checkpointDir: String,
    minJaccard: Double = 0.5,
    shingleSize: Int = 3,
    numPerms: Int = 64,
    bands: Int = 16,
    txnAppId: Option[String] = None) {

  private def appId: String = txnAppId.getOrElse(checkpointDir)
  private var lastCommitted: Option[Long] = None

  def start(maxFilesPerTrigger: Int = 100): StreamingQuery =
    spark.readStream
      .schema(feedSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, batchId)
      }
      .start()

  /** One micro-batch: verdict, admit, quarantine, sync. */
  private[graft] def gateBatch(batchRaw: DataFrame, batchId: Long): Unit = {
    if (batchRaw.isEmpty) return
    // at-least-once replay guard (see StreamingSilverLoader.mergeBatch):
    // the admit committed with marker "<appId>:<batchId>" — a replay
    // converges the side effects (feed publication, store sync) and skips
    if (lastCommitted.isEmpty && corpus.exists)
      lastCommitted = corpus.lastTxn(appId)
    if (lastCommitted.exists(_ >= batchId)) {
      corpus.txnVersion(appId, s"$appId:$batchId")
        .foreach(v => corpus.repairChangeFeed(Seq(idCol), sinceVersion = v))
      store.syncFrom(corpus)
      return
    }
    val batch = batchRaw.dropDuplicates(idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()
    val bSigs = Dedup.minhashSigs(batch, idCol, textCol, shingleSize, numPerms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bSigs.count()

    // ---- candidates ----
    val inBatch = Dedup.minhashPairs(batch, idCol, textCol,
      shingleSize, numPerms, bands, minJaccard = 0.0,
      precomputedSigs = Some(bSigs))
      .select(greatest(col("id_a"), col("id_b")).as("id_a"),
        least(col("id_a"), col("id_b")).as("id_b"))
    val vsCorpus =
      if (!corpus.exists) inBatch.limit(0)
      else {
        store.syncFrom(corpus) // gate against the CURRENT corpus
        Dedup.minhashPairsAgainst(batch, batch /* unused: sigs provided */,
          idCol, textCol, shingleSize, numPerms, bands, minJaccard = 0.0,
          corpusSigs = Some(store.sigs), batchSigs = Some(bSigs))
          .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b"))
      }

    // ---- exact verify over batch text + PRUNED corpus text ----
    // candidate partner ids are bounded by the batch's match volume, so
    // collecting them drives a stats-pruned point read of the corpus
    val corpusIds = vsCorpus.select("id_b").distinct()
      .collect().map(_.getLong(0))
    val corpusTexts =
      if (corpusIds.isEmpty)
        batch.select(idCol, textCol).limit(0)
      else corpus.scan
        .filter(col(idCol).isin(corpusIds.toIndexedSeq: _*))
        .select(idCol, textCol)
    val docs = batch.select(idCol, textCol).unionByName(corpusTexts)
    val verified = Dedup.ngramJaccardVerify(
      vsCorpus.unionByName(inBatch).distinct(), docs, idCol, textCol,
      shingleSize, minJaccard)
    val verdict = verified.groupBy(col("id_a").as(idCol))
      .agg(min(col("id_b")).as("dup_of"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verdict.count()

    // ---- admit / quarantine ----
    val admitted = batch.join(verdict, Seq(idCol), "left_anti")
    val rejected = batch.join(verdict, Seq(idCol))
      .withColumn("batch_id", lit(batchId))
    if (rejected.count() > 0) {
      if (quarantine.exists) quarantine.appendStats(rejected, Seq(idCol))
      else quarantine.overwriteStats(rejected, Seq(idCol))
    }
    if (!corpus.exists) {
      corpus.overwriteStats(admitted, Seq(idCol),
        txn = Some(s"$appId:$batchId"), txnApp = Some(appId))
      corpus.publishInitialSnapshot()
    } else {
      // admitted rows are NEW by construction (a matched key would be a
      // dup); the merge still upserts defensively on the pk
      corpus.merge(admitted, Seq(idCol))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
        .withChangeFeed().withTxn(appId, batchId)
        .execute()
    }
    lastCommitted = Some(batchId)
    store.syncFrom(corpus) // O(admitted): applies the feed rows just published
    verdict.unpersist(false)
    bSigs.unpersist(false)
    batch.unpersist(false)
  }
}
