package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for hot keys.
  *
  * First line of defense at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it rewrites
  * oversized sort-merge partitions automatically. These helpers cover
  * the cases AQE can't: extreme single-key skew into a non-broadcastable
  * dimension (salted replicate-join) and skewed aggregation keys
  * (two-phase salted aggregation).
  */
object Skew {

  /** Join a skew-keyed fact to a dimension by salting: the fact side gets
    * a deterministic per-row salt in [0, salts); the dimension is
    * replicated `salts` times. A key holding 30% of the fact rows then
    * spreads over `salts` shuffle partitions instead of one straggler.
    *
    * Cost: dimension inflated ×salts — use for small-but-not-broadcastable
    * dims or when the skew stalls the job outright.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    // deterministic salt from the whole fact row (stable across retries —
    // a rand() salt would break task-retry idempotence)
    val salt = pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int")
    val l = fact.withColumn("__salt", salt)
    val r = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit).toIndexedSeq: _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (keys, salt), then final on keys. Spark's hash aggregate already
    * does map-side partials, but a single hot reduce key still lands on
    * one task — the salt spreads the *reduce* side too.
    *
    * `aggs` maps output column name → (partial, final) expression pair,
    * e.g. "n" -> (count(lit(1)), sum) or "total" -> (sum(col("v")), sum).
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], salts: Int,
      aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int")
    val partial = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }.toSeq: _*)
  }
}
