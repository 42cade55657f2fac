package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for BENCH data: replicates a testdata
  * directory `copies`× with per-copy key shifts that keep every join
  * consistent (custkey/orderkey/partkey/suppkey shift together), and
  * decorrelates the content tables so the WORKLOAD SHAPE is preserved,
  * not distorted:
  *
  *  - `documents`: copy k > 0 suffixes every word with `~k` — token
  *    counts, lengths and per-doc structure unchanged, but vocabularies
  *    are disjoint across copies, so the near-dup queries don't drown in
  *    fabricated exact duplicates (which would turn a linear-scaling
  *    check into a quadratic pair explosion).
  *  - `embeddings`: copy k flips each dimension by a seeded ±1 pattern —
  *    norms and the near-uniform distribution survive, cross-copy
  *    vectors decorrelate.
  *
  * Usage: `runMain graft.MakeScale <srcDir> <dstDir> [copies] [tables]`
  * where `tables` is an optional comma-separated subset (e.g.
  * `documents,embeddings` for a dedup/ANN-only scale run — ×100'ing
  * lineitem just to time the corpus chains is wasted minutes). The
  * output is for Bench only (correctness runs against the driver's own
  * parquet); generated data never ships in git.
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = Tables.table(spark, src, name)
    def keySpan(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val cSpan = keySpan(tbl("customer"), "c_custkey")
    val oSpan = keySpan(tbl("orders"), "o_orderkey")
    val pSpan = keySpan(tbl("part"), "p_partkey")
    val sSpan = keySpan(tbl("supplier"), "s_suppkey")

    /** Union of `copies` shifted replicas; `shifts` maps key column →
      * per-copy span, `extra` post-processes copy k.
      */
    def replicate(
        df: DataFrame, shifts: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { k =>
        val shifted = shifts.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, col(c) + lit(k * span))
        }
        extra(shifted, k)
      }.reduce(_.unionByName(_))

    def write(name: String, df: => DataFrame, parts: Int): Unit =
      if (only.forall(_.contains(name))) {
        df.repartition(parts)
          .write.mode("overwrite").parquet(s"$dst/$name.parquet")
        println(s"[makescale] $name done")
      }

    // fixed dims: copy as-is
    write("region", tbl("region"), 1)
    write("nation", tbl("nation"), 1)

    write("customer", replicate(tbl("customer"), Map("c_custkey" -> cSpan)), 8)
    write("supplier", replicate(tbl("supplier"), Map("s_suppkey" -> sSpan)), 4)
    write("part", replicate(tbl("part"), Map("p_partkey" -> pSpan)), 8)
    write("orders", replicate(tbl("orders"),
      Map("o_orderkey" -> oSpan, "o_custkey" -> cSpan)), 16)
    write("lineitem", replicate(tbl("lineitem"),
      Map("l_orderkey" -> oSpan, "l_partkey" -> pSpan, "l_suppkey" -> sSpan)), 32)

    val events = tbl("events")
    val eIdSpan = keySpan(events, "event_id")
    val uSpan = keySpan(events, "user_id")
    write("events", replicate(events,
      Map("event_id" -> eIdSpan, "user_id" -> uSpan)), 16)

    val docs = tbl("documents")
    val dSpan = keySpan(docs, "doc_id")
    write("documents", replicate(docs, Map("doc_id" -> dSpan),
      (d, k) =>
        if (k == 0) d
        else d.withColumn("text",
          concat_ws(" ", transform(split(col("text"), " "),
            w => concat(w, lit(s"~$k")))))), 16)

    val emb = tbl("embeddings")
    val vSpan = keySpan(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    write("embeddings", replicate(emb, Map("vec_id" -> vSpan),
      (d, k) => {
        if (k == 0) d
        else {
          val rnd = new scala.util.Random(1000L + k)
          val signs = array(Seq.fill(dim)(lit(if (rnd.nextBoolean()) 1.0f else -1.0f)): _*)
          d.withColumn("embedding", zip_with(col("embedding"), signs, (x, s) => x * s))
        }
      }), 8)

    spark.stop()
  }
}
