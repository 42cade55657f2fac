package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.functions.TextFunctions.{minhashSignature, tokens, wordShingles}

/** "Sketch at ingest", made durable: a table of MinHash signatures kept
  * in sync with a change-feed-publishing source table
  * ([[ChangeFeedFollower]] machinery), so the incremental near-dup hop
  * ([[graft.operators.Dedup.minhashPairsAgainst]]) reads its corpus
  * side from storage instead of re-sketching the corpus every cycle.
  *
  * At 100 TB the asymmetry is the whole point: the corpus signature set
  * is ~0.5 KB/doc — three orders of magnitude smaller than the text —
  * and per NRT cycle only the CHANGED rows are re-hashed from the text
  * that rides the feed rows (no source-table read at all).
  *
  * Schema: (idCol, sig array<bigint>, op string).
  */
class SketchStore(
    spark: SparkSession, root: String, idCol: String, textCol: String,
    shingleSize: Int = 3, numPerms: Int = 64)
  extends ChangeFeedFollower(spark, root, idCol) {

  override protected def appId: String = "sketch-sync"

  override protected def deriveCols(rows: DataFrame): Seq[Column] = Seq(
    minhashSignature(
      wordShingles(tokens(col(textCol)), shingleSize), numPerms).as("sig"))

  /** The stored corpus sketch as (id, sig) — the exact shape
    * [[graft.operators.Dedup.minhashPairsAgainst]]'s `corpusSigs`
    * expects.
    */
  def sigs: DataFrame =
    table.snapshot.select(col(idCol).as("id"), col("sig"))
}
