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
}
