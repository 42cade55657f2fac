package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokens: case folding, trimming, multi-space") {
    assert(one[scala.collection.Seq[String]](tokens(col("t")), "  Foo  BAR baz ") == Seq("foo", "bar", "baz"))
  }

  test("shingles shorter than k collapse to one joined shingle") {
    assert(one[scala.collection.Seq[String]](wordShingles(tokens(col("t")), 3), "a b") == Seq("a b"))
    assert(one[scala.collection.Seq[String]](wordShingles(tokens(col("t")), 2), "a b c") == Seq("a b", "b c"))
  }

  test("jaccard: identical=1, disjoint=0, bag semantics are set semantics") {
    val df = Seq(("a b c", "a b c"), ("a a b", "a b"), ("x y", "p q"))
      .toDF("l", "r")
      .select(jaccard(tokens(col("l")), tokens(col("r"))).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) == 1.0 && js(1) == 1.0 && js(2) == 0.0)
  }

  test("simhash is order-insensitive; minhash signature length is exact") {
    val a = one[Long](simhash64(tokens(col("t"))), "alpha beta gamma")
    val b = one[Long](simhash64(tokens(col("t"))), "gamma alpha beta")
    assert(a == b, "bag-of-words sketch must ignore order")
    val sig = one[scala.collection.Seq[Long]](
      minhashSignature(wordShingles(tokens(col("t")), 2), 32), "a b c d")
    assert(sig.length == 32)
  }

  test("empty-ish text does not explode any expression") {
    val df = Seq(" ", "x").toDF("t").select(
      tokenCount(col("t")).as("n"),
      simhash64(tokens(col("t"))).as("h"),
      stopwordHits(tokens(col("t")), "en").as("s"))
    assert(df.count() == 2) // no runtime failure
  }

  test("hamming64 counts differing bits") {
    val d = Seq((0L, -1L)).toDF("a", "b")
      .select(hamming64(col("a"), col("b")).as("h")).head().getInt(0)
    assert(d == 64)
  }
}
