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

  test("portable fingerprint: order-independent, content-sensitive") {
    val fp = concat_ws("|", portableFingerprint(wordShingles(tokens(col("t")), 2), 4))
    val a = one[String](fp, "the quick brown fox jumps")
    val b = one[String](fp, "THE  quick brown fox jumps ") // same tokens
    val c = one[String](fp, "an entirely different sentence here")
    assert(a == b && a != c)
    assert(a.split('|').forall(_.matches("[0-9a-f]{16}")), "md5-hex prefixes")
    assert(a.split('|').toSeq == a.split('|').toSeq.sorted, "bottom-k is sorted")
  }

  test("email scrub masks every occurrence and counts match") {
    val df = Seq(
      "reach a@b.co or c.d+x@e-f.org today",
      "no addresses here").toDF("t")
      .select(emailCount(col("t")).as("n"), scrubEmails(col("t")).as("s"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 2)
    assert(rows(0).getString(1) == "reach <EMAIL> or <EMAIL> today")
    assert(rows(1).getInt(0) == 0 && rows(1).getString(1) == "no addresses here")
  }

  test("shingle dup ratio: unique=0, fully repeated approaches 1") {
    val r = shingleDupRatio(wordShingles(tokens(col("t")), 2))
    assert(one[Double](r, "a b c d") == 0.0)
    val rep = one[Double](r, "a b a b a b a b") // "a b"/"b a" repeated
    assert(rep > 0.5)
  }

  test("hamming64 counts differing bits") {
    val d = Seq((0L, -1L)).toDF("a", "b")
      .select(hamming64(col("a"), col("b")).as("h")).head().getInt(0)
    assert(d == 64)
  }
}
