package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftExtensions

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 16) AS s").head().getSeq[Long](0)
    assert(sig.length == 16)
    val sim = spark.sql(
      "SELECT simhash64(array('spark', 'native', 'engine')) AS h").head().getLong(0)
    // deterministic: same input, same sketch
    val sim2 = spark.sql(
      "SELECT simhash64(array('spark', 'native', 'engine')) AS h").head().getLong(0)
    assert(sim == sim2)
    // near-dup arrays agree on most bits
    val simNear = spark.sql(
      "SELECT simhash64(array('spark', 'native', 'engines')) AS h").head().getLong(0)
    assert(java.lang.Long.bitCount(sim ^ simNear) < 32)
  }

  test("curation operators are callable from SQL and agree with the Scala API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions.{col, lit}
    // portable_bucket ≡ Sampling.portableBucket
    val sqlB = spark.sql("SELECT portable_bucket(123, 42) AS b").head().getLong(0)
    val apiB = spark.range(1).select(
      graft.operators.Sampling.portableBucket(lit(123L).cast("long"), 42L).as("b"))
      .head().getLong(0)
    assert(sqlB == apiB && sqlB >= 0 && sqlB < 1000000L)
    // doc_fingerprint over shingles, scrub, dup ratio
    val row = spark.sql(
      """SELECT doc_fingerprint('the quick brown fox jumps over', 4) AS fp,
        |       shingle_dup_ratio(ws_shingles('a b a b a b', 2)) AS r,
        |       email_count('ping a@b.co and c@d.org') AS n,
        |       scrub_emails('ping a@b.co now') AS s,
        |       size(ws_tokens('One  Two three')) AS t""".stripMargin).head()
    assert(row.getSeq[String](0).length == 4)
    assert(row.getDouble(1) > 0.5)
    assert(row.getInt(2) == 2)
    assert(row.getString(3) == "ping <EMAIL> now")
    assert(row.getInt(4) == 3)
    // SQL and DataFrame fingerprints are the same implementation
    val apiFp = spark.range(1).select(
      graft.functions.TextFunctions.portableFingerprint(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(
            lit("the quick brown fox jumps over")), 3), 4).as("fp"))
      .head().getSeq[String](0)
    assert(row.getSeq[String](0) == apiFp)
  }
}
