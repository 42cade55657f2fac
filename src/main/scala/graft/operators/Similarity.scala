package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The right baseline, and at
  *    scale still the right tool for a *bounded* query set (broadcast the
  *    queries, one scan of the corpus, partial top-k per partition via
  *    window over the query id).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are
  *    bucketed by sign-pattern; candidates come from an equi-join on the
  *    bucket key, so the 100 TB corpus is never cross-joined. Recall is
  *    tunable via number of planes / tables (probe cost vs recall).
  *
  * All vector math is `zip_with`/`aggregate` column expressions (computed
  * in double, codegen'd) — no UDF boundary.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (s, x) => s + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector.
    *
    * @param queries (qid, qvec) — expected small relative to corpus; it
    *                is broadcast so the corpus scan is shuffle-free until
    *                the final per-query top-k window.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qidCol: String = "qid", qvecCol: String = "qvec",
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    // excludeSelf assumes qids ARE corpus ids (the self-search case);
    // pass false when query ids come from a different id space, or a
    // numeric collision would silently drop a legitimate neighbor
    val paired = corpus.crossJoin(broadcast(queries))
    val scored = (if (excludeSelf) paired.filter(col(qidCol) =!= col(idCol)) else paired)
      .withColumn("sim", cosine(col(qvecCol), col(vecCol)))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("sim"))
  }

  /** Deterministic random hyperplanes (fixed seed → reproducible plans). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern bucket key for one vector against the planes. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: candidates share the LSH bucket with the query.
    * `numPlanes` trades recall (fewer planes → bigger buckets → higher
    * recall & cost). Multi-table variants union several bucketings.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int = 8, dim: Int = 64, tables: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    val bucketed = (0 until tables).map { t =>
      val planes = hyperplanes(numPlanes, dim, seed = 42L + t)
      val c = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
        .withColumn("tbl", lit(t))
      val q = queries.withColumn("bucket", lshBucket(col("qvec"), planes))
        .withColumn("tbl", lit(t))
      val joined = c.join(q, Seq("tbl", "bucket"))
      (if (excludeSelf) joined.filter(col("qid") =!= col("vec_id")) else joined)
        .select(col("qid"), col("vec_id"), col("qvec"), col("embedding"))
    }.reduce(_ unionByName _).distinct()
    val scored = bucketed.withColumn("sim", cosine(col("qvec"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }
}
