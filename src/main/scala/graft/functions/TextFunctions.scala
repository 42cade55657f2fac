package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators —
  * all pure `Column` expression trees (codegen'd by Catalyst, no UDFs),
  * so they stay inside WholeStageCodegen and scale linearly with rows.
  *
  * Algorithms follow the published constructions: MinHash resemblance
  * sketches (Broder, "On the resemblance and containment of documents",
  * SEQUENCES 1997), SimHash (Charikar, "Similarity estimation techniques
  * from rounding algorithms", STOC 2002), winnowing fingerprints
  * (Schleimer/Wilkerson/Aiken, "Winnowing: local algorithms for document
  * fingerprinting", SIGMOD 2003), and banded LSH as described in
  * Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets", ch. 3.
  */
object TextFunctions {

  /** Whitespace tokenization (lower-cased, trimmed). */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** k-word shingles as joined strings; empty array when doc is shorter
    * than k (guarded — Spark's sequence() would otherwise run backwards).
    */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** MinHash signature: for each of `numPerms` seeded hash functions, the
    * minimum over the shingle set. Backed by a single-pass custom Catalyst
    * expression (graft.expressions.MinHashSigExpr) — one xxhash + numPerms
    * multiply-adds per shingle, instead of numPerms full array traversals.
    */
  def minhashSignature(shingles: Column, numPerms: Int): Column =
    graft.expressions.Sketches.minhash(shingles, numPerms)

  /** LSH band keys: hash of each r-row slice of the signature. Two docs
    * sharing any band key are candidate near-duplicates.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * positions.
    */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact Jaccard over two token/shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") /
      size(array_union(da, db)).cast("double")
  }

  /** 64-bit SimHash: per-bit vote of the token hashes — bit i of the
    * result is 1 iff more token hashes have bit i set than not. The
    * 64-way bit unrolling happens at plan-build time (Scala loop), so the
    * runtime is a flat codegen'd expression.
    */
  def simhash64(toks: Column): Column =
    graft.expressions.Sketches.simhash(toks)

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** Equal-width block keys of a SimHash — by pigeonhole, two hashes
    * within Hamming distance `blocks`−1 share at least one block, making
    * these exact-match blocking keys for near-dup candidate generation
    * (Manku et al., WWW'07). 4 blocks (16-bit keys) is the at-scale
    * configuration; more blocks widen the guaranteed radius but shrink
    * the key space, so buckets — and candidate counts — grow.
    */
  def simhashBlocks(sim: Column, blocks: Int = 4): Column = {
    require(blocks > 1 && 64 % blocks == 0,
      s"blocks must divide 64, got $blocks")
    val width = 64 / blocks
    val mask = (1L << width) - 1L
    array((0 until blocks).map(i =>
      shiftright(sim, i * width).bitwiseAND(lit(mask))): _*)
  }

  /** Document fingerprint (winnowing-style): the `keep` smallest distinct
    * hashes of the k-gram shingle set — a compact order-independent
    * sketch; equal fingerprints ⇒ near-identical content.
    */
  def fingerprint(shingles: Column, keep: Int): Column =
    slice(array_sort(array_distinct(transform(shingles, x => xxhash64(x)))), 1, keep)

  /** Cross-engine-stable fingerprint: same bottom-k sketch but over
    * md5-hex prefixes (fixed-width lowercase hex, so lexicographic
    * order == numeric order in every engine) instead of xxhash64 —
    * membership in a dedup decision made with this sketch can be
    * recomputed outside Spark byte-for-byte.
    */
  def portableFingerprint(shingles: Column, keep: Int): Column =
    slice(array_sort(array_distinct(
      transform(shingles, x => substring(md5(x), 1, 16)))), 1, keep)

  /** Shingle-level repetition: fraction of k-gram occurrences that are
    * re-occurrences (1 − distinct/total) — the "repeated n-gram"
    * quality gate of curation pipelines; token-level uniq_ratio
    * ([[qualityFeatures]]) misses looped *phrases*, which is the common
    * failure mode of generated/boilerplate text.
    */
  def shingleDupRatio(shingles: Column): Column =
    lit(1.0) - size(array_distinct(shingles)).cast("double") /
      size(shingles).cast("double")

  /** Email-bearing-text scrubbing (the PII pass every shared corpus
    * needs). Same regex semantics in Java and RE2: char classes, `+`,
    * bounded repeat.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))

  def scrubEmails(text: Column, replacement: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, replacement)

  // --- language ID (n-gram/stopword heuristic over public stopword lists) ---
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans"))

  /** Count of distinct tokens appearing in `lang`'s stopword list. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect(array_distinct(toks),
      array(stopwords(lang).map(lit): _*)))

  /** Quality-scoring signals: token count, distinct-token ratio, mean
    * token length — the standard cheap text-quality features.
    */
  def qualityFeatures(text: Column): (Column, Column, Column) = {
    val t = tokens(text)
    val n = size(t)
    val uniq = size(array_distinct(t)).cast("double") / n.cast("double")
    val meanLen = aggregate(t, lit(0), (acc, x) => acc + length(x))
      .cast("double") / n.cast("double")
    (n, uniq, meanLen)
  }
}
