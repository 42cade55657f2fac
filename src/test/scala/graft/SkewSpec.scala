package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed fact: 80% of rows on one key
  private lazy val fact = (1L to 5000L)
    .map(i => (if (i % 5 != 0) 7L else i % 100, i))
    .toDF("k", "v")
  private lazy val dim = (0L until 100L).map(i => (i, s"dim$i")).toDF("k", "name")

  test("salted join equals plain join on skewed data") {
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted left join preserves unmatched fact rows") {
    val factWithMiss = fact.union(Seq((999L, -1L)).toDF("k", "v"))
    val salted = Skew.saltedJoin(factWithMiss, dim, Seq("k"), salts = 4, joinType = "left")
    assert(salted.count() == factWithMiss.count())
    assert(salted.filter(col("k") === 999L).head().getAs[Any]("name") == null)
  }

  test("salted aggregation equals plain aggregation") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
    val salted = Skew.saltedAgg(fact, Seq("k"), salts = 8, Map(
      "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
      "total" -> (sum(col("v")), (c: org.apache.spark.sql.Column) => sum(c))))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
