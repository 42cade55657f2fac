package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data curation.
  *
  * `randomSplit` re-rolls when data or partitioning changes; these
  * operators key every decision on a hash of a stable id, so membership
  * is a pure function of (id, seed) — reproducible across runs, clusters,
  * and re-partitioning, and joinable ("which split was this doc in?" is
  * answerable later). All pure Column expressions.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Stable bucket in [0, 1e6) from the id column and seed. */
  def hashBucket(id: Column, seed: Long): Column =
    pmod(xxhash64(id, lit(seed)), lit(Buckets))

  /** Deterministic Bernoulli sample: keep rows whose bucket falls below
    * `fraction` of the bucket space.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(hashBucket(col(idCol), seed) < lit((fraction * Buckets).toLong))

  /** Disjoint, exhaustive train/val/test-style split. Weights are
    * normalized; returns one DataFrame per weight, membership stable in
    * (id, seed).
    */
  def split(df: DataFrame, idCol: String, weights: Seq[Double],
      seed: Long = 42L): Seq[DataFrame] = {
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _).map(w => (w / total * Buckets).toLong)
    val b = hashBucket(col(idCol), seed)
    cuts.sliding(2).map { case Seq(lo, hi) =>
      df.filter(b >= lit(lo) && b < lit(hi))
    }.toSeq
  }

  /** Per-stratum deterministic sampling (e.g. per-language caps for a
    * training mix): `fractions` maps stratum value → keep fraction;
    * unlisted strata use `default`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), seed) < (frac * Buckets).cast("long"))
  }
}
