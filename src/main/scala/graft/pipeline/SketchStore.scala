package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{minhashSignature, tokens, wordShingles}
import graft.sources.GraftTable

/** "Sketch at ingest", made durable: a [[GraftTable]] of MinHash
  * signatures kept in sync with a change-feed-publishing source table,
  * so the incremental near-dup hop
  * ([[graft.operators.Dedup.minhashPairsAgainst]]) reads its corpus
  * side from storage instead of re-sketching the corpus every cycle.
  *
  * At 100 TB the asymmetry is the whole point: the corpus signature set
  * is ~0.5 KB/doc — three orders of magnitude smaller than the text —
  * and per NRT cycle only the CHANGED rows are re-hashed (O(changes)),
  * while a recompute-from-text design would re-read the full corpus per
  * batch. The sync applies the source's stored change feed: inserts and
  * updates re-sketch from the post-image text that rides the feed rows
  * (no source-table read at all), deletes drop the signature.
  *
  * Sync is idempotent and crash-safe the same way the silver loaders
  * are: each sync commit carries a txn marker keyed to the SOURCE
  * version it caught up to, so a replayed sync (or two racing syncs)
  * lands once — the loser skips on the recorded marker.
  *
  * Requires every source writer to publish its change feed
  * (`.withChangeFeed()` merges / feed-publishing appends, with
  * `repairChangeFeed` after crashes). If a sync window contains NO
  * stored change data at all while the source advanced, the store falls
  * back to one full re-sketch of the snapshot — loud in cost, never
  * stale in content. A PARTIALLY published window (some feed-on, some
  * feed-off commits) is indistinguishable from small commits and cannot
  * be detected here; run feed-publishing writers only.
  *
  * Schema: (idCol, sig array<bigint>, op string) — `op` is the last
  * sync operation audit column ('U'), mirroring the silver tables'
  * SyncOperation.
  */
class SketchStore(
    spark: SparkSession, root: String, idCol: String, textCol: String,
    shingleSize: Int = 3, numPerms: Int = 64) {

  val table: GraftTable = GraftTable(spark, root)
  private val appId = "sketch-sync"

  /** The stored corpus sketch as (id, sig) — the exact shape
    * [[graft.operators.Dedup.minhashPairsAgainst]]'s `corpusSigs`
    * expects.
    */
  def sigs: DataFrame =
    table.snapshot.select(col(idCol).as("id"), col("sig"))

  /** Source version the store has applied, if any. */
  def syncedVersion: Option[Long] =
    if (table.exists) table.lastTxn(appId) else None

  private def sketchOf(df: DataFrame): DataFrame = df.select(
    col(idCol),
    minhashSignature(
      wordShingles(tokens(col(textCol)), shingleSize), numPerms).as("sig"))

  /** Catch the store up to the source's latest version. Returns the
    * source version now reflected (-1 for an uncommitted source). First
    * sync sketches the full snapshot; later syncs apply only the
    * change-feed rows of the missed versions.
    */
  def syncFrom(source: GraftTable): Long = {
    val target = source.latestVersion.getOrElse(return -1L)
    val last = syncedVersion
    if (last.exists(_ >= target)) return last.get

    def fullResync(): Long = {
      table.overwriteStats(
        sketchOf(source.snapshot).withColumn("op", lit("U")), Seq(idCol),
        txn = Some(s"$appId:$target"), txnApp = Some(appId))
      target
    }
    if (last.isEmpty) return fullResync()

    val changes =
      try source.changeFeed(sinceVersion = last.get + 1)
        // pin the window: a commit racing past `target` syncs next time,
        // keeping the txn marker's meaning exact
        .filter(col("_commit_version") <= target)
      catch {
        // nothing stored in the window at all (feed-off writers):
        // re-sketch rather than serve stale signatures
        case _: IllegalStateException => return fullResync()
      }
    // one decision per key across the window: the LAST change wins
    // (CDF rows are unique per (key, version), so the ordering is total)
    val w = Window.partitionBy(idCol).orderBy(col("_commit_version").desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // delete rows carry the pre-image text — sketch them too (the value
    // is unused; the 'D' condition removes the key), so one projection
    // serves every change type
    val batch = latest.select(
      col(idCol),
      minhashSignature(
        wordShingles(tokens(col(textCol)), shingleSize), numPerms).as("sig"),
      when(col("_change_type") === "delete", "D").otherwise("U").as("op"))
    table.merge(batch, Seq(idCol))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenMatchedDelete("op = 'D'")
      .withTxn(appId, target)
      .execute()
    target
  }
}
