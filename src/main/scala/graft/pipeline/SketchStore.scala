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
  * `repairChangeFeed` after crashes). Window versions WITHOUT stored
  * change data are triaged by manifest: maintenance rewrites and empty
  * appends are provably row-free and skipped; overwrites, restores and
  * row-adding feed-off appends force one full re-sketch — loud in
  * cost, never stale in content. The single undecidable case is a
  * feed-off MERGE (indistinguishable from a zero-diff merge, which
  * legitimately publishes nothing): it is trusted as zero-diff, so
  * merges MUST run `.withChangeFeed()`.
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

    // Triage every window version WITHOUT stored change data by its
    // manifest: maintenance rewrites (compact/zorder) and empty appends
    // change no rows — safe to skip; overwrite/restore replace content
    // the feed never describes, and a feed-off append adds rows — both
    // force a full re-sketch instead of silently stale signatures. A
    // feed-off MERGE is the one case triage can't decide (a zero-diff
    // merge legitimately publishes nothing); it is trusted as zero-diff,
    // which is why the class doc requires feed-publishing merges.
    val stored = source.changeFeedVersions.toSet
    val unsafeGap = ((last.get + 1) to target).filterNot(stored).exists { v =>
      def rowsChanged: Boolean =
        try source.manifest(v - 1).allRows != source.manifest(v).allRows
        catch { case _: java.nio.file.NoSuchFileException => true }
      try source.manifest(v).operation match {
        case Some("compact") | Some("zorder") => false
        case Some("append") => rowsChanged // rows>0 would have published
        case Some("merge") => false // zero-diff merges publish nothing
        case _ => true // overwrite / restore / unknown
      } catch { case _: java.nio.file.NoSuchFileException => true }
    }
    if (unsafeGap) return fullResync()
    val changes =
      if (stored.exists(v => v > last.get && v <= target))
        // pin the window: a commit racing past `target` syncs next
        // time, keeping the txn marker's meaning exact
        source.changeFeed(sinceVersion = last.get + 1)
          .filter(col("_commit_version") <= target)
      else // provably change-free window: advance the marker only
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          source.changeFeedSchema)
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
