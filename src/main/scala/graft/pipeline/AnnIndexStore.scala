package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.GraftTable

/** A persisted IVF index kept in sync with a change-feed-publishing
  * embeddings table: the coarse-quantizer centroids are trained ONCE
  * (on the first sync's snapshot) and pinned; the per-vector centroid
  * assignments live in a [[GraftTable]] maintained incrementally by the
  * [[ChangeFeedFollower]] machinery — per NRT cycle only changed
  * vectors re-assign (a pure projection over the feed rows), the corpus
  * is never re-scanned, and [[topK]] probes the STORED inverted lists.
  *
  * This is the SCALE.md promise made real: "the assignment column can
  * be persisted to amortize across query batches". At 100 TB the
  * assignment table is (id, vec, cids) — the one corpus-sized scan
  * happens at first sync; every query batch after that is a broadcast
  * probe join against it.
  *
  * Centroids are PINNED at training: assignments stay consistent across
  * increments by construction, at the price of drift if the embedding
  * distribution shifts — call [[retrain]] (one full resync) on a drift
  * budget, exactly like production IVF deployments re-shard.
  *
  * Schema: (idCol, vecCol, cids array<int>, op string).
  */
class AnnIndexStore(
    spark: SparkSession, root: String, idCol: String = "vec_id",
    vecCol: String = "embedding", k: Int = 16, spill: Int = 1,
    sampleN: Int = 4096)
  extends ChangeFeedFollower(spark, s"$root/assignments", idCol) {

  override protected def appId: String = "ann-index-sync"

  private val centroidsPath: Path = Paths.get(root, "centroids.json")

  /** The pinned coarse-quantizer centroids (unit-normalized). */
  def centroids: Seq[Seq[Double]] = {
    require(Files.exists(centroidsPath),
      s"no trained centroids at $centroidsPath — sync the store first")
    GraftTable.mapper
      .readValue(Files.readString(centroidsPath), classOf[Array[Array[Double]]])
      .map(_.toSeq).toSeq
  }

  /** Centroids trained by an in-flight full resync, STAGED until that
    * resync's commit wins. Publishing them before the commit (the
    * round-5 behavior) desyncs the pinned quantizer from the stored
    * inverted lists whenever a racing sync wins the version: the store
    * converges to the RACER's assignments, which were trained on a
    * possibly different snapshot, so topK would probe with one model
    * and rank lists built by another — silent recall loss.
    */
  @volatile private var staged: Option[Seq[Seq[Double]]] = None

  override protected def beforeFullResync(snapshot: DataFrame): Unit =
    staged = Some(Similarity.trainIvfCentroids(
      snapshot, vecCol, idCol, k, sampleN))

  override protected def afterFullResyncCommit(): Unit = {
    val cents = staged.getOrElse(return)
    Files.createDirectories(centroidsPath.getParent)
    val tmp = Files.createTempFile(centroidsPath.getParent, ".centroids", ".tmp")
    Files.writeString(tmp,
      GraftTable.mapper.writeValueAsString(cents.map(_.toArray).toArray))
    Files.move(tmp, centroidsPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    staged = None
  }

  // the racer's published centroids (if any) match the rows the store
  // converged to; ours never committed and must not outlive the loss
  override protected def fullResyncAborted(): Unit = staged = None

  override protected def deriveCols(rows: DataFrame): Seq[Column] = Seq(
    col(vecCol),
    Similarity.centroidTopCids(
      col(vecCol), staged.getOrElse(centroids), spill).as("cids"))

  /** Force a full re-train + re-assign on the next [[syncFrom]] by
    * forgetting the trained centroids (the drift knob).
    */
  def retrain(): Unit = Files.deleteIfExists(centroidsPath)

  // a deleted centroids file must force the full path even when the
  // assignment table looks current
  override def syncedVersion: Option[Long] =
    if (Files.exists(centroidsPath)) super.syncedVersion else None

  /** Approximate cosine top-k over the STORED inverted lists — the same
    * probe/rank contract as [[Similarity.ivfTopK]] (identical
    * assignment, probe, and tie-break expressions), with the corpus
    * side read from the assignment table instead of re-assigned.
    */
  def topK(
      queries: DataFrame, kNN: Int, nprobe: Int = 4,
      qidCol: String = "qid", qvecCol: String = "qvec",
      excludeSelf: Boolean = false): DataFrame = {
    val cents = centroids
    // per-side norm precompute — same bit-identical expression shape as
    // Similarity.ivfTopK (sim = dot / (norm(q) · norm(c)))
    val assigned = table.snapshot
      .select(col(idCol), col(vecCol), Similarity.norm(col(vecCol)).as("__cnorm"),
        explode(col("cids")).as("__cid"))
    val probes = queries.withColumn("__cid",
      explode(Similarity.centroidTopCids(col(qvecCol), cents, nprobe)))
      .select(col(qidCol), col(qvecCol),
        Similarity.norm(col(qvecCol)).as("__qnorm"), col("__cid"))
    val joined = assigned.join(probes, Seq("__cid"))
    val base =
      if (excludeSelf) joined.filter(col(qidCol) =!= col(idCol)) else joined
    val cands = (if (spill > 1)
        base.select(col(qidCol), col(qvecCol), col("__qnorm"),
            col(idCol), col(vecCol), col("__cnorm"))
          .dropDuplicates(Seq(qidCol, idCol))
      else base)
      .withColumn("sim", Similarity.dot(col(qvecCol), col(vecCol)) /
        (col("__qnorm") * col("__cnorm")))
    Similarity.rankTopK(cands, kNN, qidCol, idCol)
  }
}
