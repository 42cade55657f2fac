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

  /** Cross-ENGINE-stable bucket in [0, 1e6): first 8 hex chars of
    * md5(id ":" seed) as an unsigned int, mod the bucket space. Any
    * engine with md5 reproduces membership bit-for-bit (DuckDB:
    * `CAST('0x' || substr(md5(id || ':' || seed), 1, 8) AS BIGINT) %
    * 1000000`), so a split assigned here can be recomputed — and
    * audited — outside Spark. The xxhash64 bucket above is faster but
    * Spark-only.
    */
  def portableBucket(id: Column, seed: Long = 42L): Column =
    pmod(
      conv(substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 8),
        16, 10).cast("long"),
      lit(Buckets))

  /** Bucket-space cut points for `weights` (normalized): length
    * weights.size+1, first 0, last = Buckets exactly (the cumulative
    * sum and `weights.sum` are the SAME left-to-right fp computation,
    * so the final ratio is 1.0 bit-for-bit; the `:+ Buckets` makes
    * exhaustiveness structural rather than arithmetic). The ONE list of
    * integer thresholds is shared by [[split]], [[splitLabel]] and
    * oracle-SQL generation — intermediate cuts depend on fp rounding
    * (e.g. thirds land at 333333), so consumers must share these exact
    * integers, never re-derive their own.
    */
  def cutPoints(weights: Seq[Double]): Seq[Long] = {
    // a zero/negative/NaN total would yield garbage cut points that
    // silently collapse the split into the last label — fail loudly
    require(weights.nonEmpty && weights.forall(w => w >= 0 && !w.isNaN),
      s"split weights must be non-negative numbers, got $weights")
    val total = weights.sum
    require(total > 0, s"split weights must sum > 0, got $weights")
    val cuts = weights.scanLeft(0.0)(_ + _).map(w => (w / total * Buckets).toLong)
    cuts.init :+ Buckets
  }

  /** Label column for a disjoint, exhaustive split: `labels(i)` for
    * buckets in [cuts(i), cuts(i+1)).
    */
  def splitLabel(bucket: Column, weights: Seq[Double], labels: Seq[String]): Column = {
    require(weights.length == labels.length && labels.nonEmpty,
      s"need one label per weight, got ${weights.length}/${labels.length}")
    val cuts = cutPoints(weights)
    labels.init.zip(cuts.tail.init).foldRight(lit(labels.last): Column) {
      case ((lbl, hi), rest) => when(bucket < hi, lbl).otherwise(rest)
    }
  }

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
    val cuts = cutPoints(weights)
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

  /** [[stratifiedSample]] on the cross-engine-stable [[portableBucket]]
    * — same semantics, but membership is reproducible (and auditable)
    * outside Spark, so a domain-mix decision ("keep 50% of en, 20% of
    * the rest") can be recomputed by any engine with md5. Thresholds
    * are integer bucket counts, exact in both engines. Pure
    * filter — no shuffle at any scale.
    */
  def portableStratifiedSample(df: DataFrame, idCol: String,
      strataCol: String, fractions: Map[String, Double],
      default: Double = 0.0, seed: Long = 42L): DataFrame = {
    val thresh = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (k, f)) =>
        when(col(strataCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(portableBucket(col(idCol), seed) < thresh)
  }
}
