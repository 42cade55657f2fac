package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.table(spark, sf, "documents")

  test("split is disjoint, exhaustive, and stable across runs") {
    val Seq(train, valid, test) = Sampling.split(docs, "doc_id", Seq(0.8, 0.1, 0.1))
    val n = docs.count()
    assert(train.count() + valid.count() + test.count() == n)
    assert(train.join(valid, "doc_id").count() == 0)
    assert(train.join(test, "doc_id").count() == 0)
    assert(valid.join(test, "doc_id").count() == 0)
    // roughly proportional
    assert(math.abs(train.count().toDouble / n - 0.8) < 0.08)
    // stability: second evaluation yields the identical membership
    val Seq(train2, _, _) = Sampling.split(docs, "doc_id", Seq(0.8, 0.1, 0.1))
    assert(train.select("doc_id").exceptAll(train2.select("doc_id")).count() == 0)
  }

  test("deterministic sample is a subset relation across fractions") {
    val s10 = Sampling.deterministicSample(docs, "doc_id", 0.1)
    val s30 = Sampling.deterministicSample(docs, "doc_id", 0.3)
    // monotone: the 10% sample is contained in the 30% sample (same seed)
    assert(s10.join(s30, Seq("doc_id"), "left_anti").count() == 0)
    assert(s10.count() < s30.count())
  }

  test("portable bucket: in range, seeded, and label split covers every row") {
    val b42 = Sampling.portableBucket(col("doc_id"), 42L)
    val b7 = Sampling.portableBucket(col("doc_id"), 7L)
    val labeled = docs.select(col("doc_id"), b42.as("b42"), b7.as("b7"),
      Sampling.splitLabel(b42, Seq(0.8, 0.1, 0.1),
        Seq("train", "val", "test")).as("split"))
    val n = docs.count()
    assert(labeled.filter(col("b42") < 0 || col("b42") >= 1000000L).count() == 0)
    // different seeds give a genuinely different permutation
    assert(labeled.filter(col("b42") === col("b7")).count() < n / 100)
    val byLabel = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum == n, "split labels must be exhaustive")
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(math.abs(byLabel("train").toDouble / n - 0.8) < 0.08)
  }

  test("cut points: one exact integer list, exhaustive for awkward weights") {
    assert(Sampling.cutPoints(Seq(0.8, 0.1, 0.1)) == Seq(0L, 800000L, 900000L, 1000000L))
    assert(Sampling.cutPoints(Seq(2.0, 2.0)) == Seq(0L, 500000L, 1000000L))
    // fp-dependent intermediates (thirds truncate to 333333/666666) —
    // the exact values matter less than both engines SHARING them, but
    // the last cut must structurally close the bucket space
    val thirds = Sampling.cutPoints(Seq(1.0 / 3, 1.0 / 3, 1.0 / 3))
    assert(thirds == Seq(0L, 333333L, 666666L, 1000000L))
    assert(Sampling.cutPoints(Seq(0.1, 0.2, 0.7)).last == 1000000L)
  }

  test("stratified sample respects per-stratum fractions") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), default = 0.5)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == totals("en"))
    assert(!byLang.contains("de"))
    for (l <- Seq("es", "fr", "zh"))
      assert(math.abs(byLang(l).toDouble / totals(l) - 0.5) < 0.25)
  }
}
