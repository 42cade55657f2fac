package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Clause-level MERGE through the programmatic MergeBuilder API
  * (whenMatchedUpdate / whenNotMatchedInsert / whenNotMatchedBySource*):
  * standard SQL first-matching-clause semantics, target pre-image
  * visibility, store-assignment casts, CDF composition, and the loud
  * errors for mixing APIs or assigning unknown columns.
  */
class MergeClausesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-mrgcl").toString

  private def fresh(rows: Seq[(Long, String, Double)]): GraftTable = {
    val t = GraftTable(spark, tmp())
    t.overwrite(rows.toDF("id", "v", "amt"), Some("id"))
    t
  }

  test("partial UPDATE SET keeps unassigned columns from the target") {
    val t = fresh(Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    t.merge(Seq((1L, "A", 99.0)).toDF("id", "v", "amt"), Seq("id"))
      .whenMatchedUpdate(Seq("v" -> "s.v"))
      .execute()
    val got = t.scan.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // amt untouched — only v was assigned
    assert(got == Set((1L, "A", 10.0), (2L, "b", 20.0)))
  }

  test("SET value may combine target pre-image and source") {
    val t = fresh(Seq((1L, "a", 10.0)))
    t.merge(Seq((1L, "x", 5.0)).toDF("id", "v", "amt"), Seq("id"))
      .whenMatchedUpdate(Seq("amt" -> "t.amt + s.amt", "v" -> "concat(t.v, s.v)"))
      .execute()
    val r = t.scan.head()
    assert(r.getString(1) == "ax" && r.getDouble(2) == 15.0)
  }

  test("ordered clauses: first applying wins; insert defaults unassigned to NULL") {
    val t = fresh(Seq((1L, "keep", 1.0), (2L, "bump", 2.0)))
    t.merge(
      Seq((1L, "s1", 0.0), (2L, "s2", 0.0), (3L, "s3", 7.0))
        .toDF("id", "v", "amt"), Seq("id"))
      .whenMatchedUpdate(Seq("amt" -> "t.amt"), cond = Some("t.v = 'keep'"))
      .whenMatchedUpdate(Seq("amt" -> "t.amt + 1"))
      .whenNotMatchedInsert(Seq("id" -> "s.id", "amt" -> "s.amt"))
      .execute()
    val got = t.scan.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, Some("keep"), 1.0), (2L, Some("bump"), 3.0), (3L, None, 7.0)))
  }

  test("not-matched-by-source via API; change feed records the rewrite") {
    val t = fresh(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val v = t.merge(Seq((1L, "a2", 1.0)).toDF("id", "v", "amt"), Seq("id"))
      .whenMatchedUpdate(Seq("v" -> "s.v"))
      .whenNotMatchedBySourceDelete(cond = Some("t.id = 3"))
      .whenNotMatchedBySourceUpdate(Seq("v" -> "'stale'"))
      .withChangeFeed()
      .execute()
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (2L, "stale")))
    val changes = t.changeFeed(v).collect()
    val byType = changes.groupBy(_.getAs[String]("_change_type"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(byType("delete") == Set(3L))
    assert(byType("update_preimage") == Set(1L, 2L))
    assert(byType("update_postimage") == Set(1L, 2L))
  }

  test("store-assignment: SET value casts to the column type") {
    val t = fresh(Seq((1L, "a", 1.5)))
    // int literal 2 assigned to double column amt must land as 2.0
    t.merge(Seq((1L, "a", 0.0)).toDF("id", "v", "amt"), Seq("id"))
      .whenMatchedUpdate(Seq("amt" -> "2"))
      .execute()
    assert(t.scan.head().getDouble(2) == 2.0)
  }

  test("schema evolution: clause merge against a wider source") {
    val t = fresh(Seq((1L, "a", 1.0)))
    val src = Seq((1L, "a2", 1.0, "extra1"), (5L, "e", 5.0, "extra5"))
      .toDF("id", "v", "amt", "note")
    t.merge(src, Seq("id"))
      .whenMatchedUpdate(Seq("v" -> "s.v", "note" -> "s.note"))
      .whenNotMatchedInsert(Seq(
        "id" -> "s.id", "v" -> "s.v", "amt" -> "s.amt", "note" -> "s.note"))
      .execute()
    val got = t.scan.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getAs[String]("note"))).toSet
    assert(got == Set((1L, "a2", "extra1"), (5L, "e", "extra5")))
  }

  test("mixing clause and legacy APIs errors loudly") {
    val t = fresh(Seq((1L, "a", 1.0)))
    val e = intercept[IllegalArgumentException](
      t.merge(Seq((1L, "b", 1.0)).toDF("id", "v", "amt"), Seq("id"))
        .whenMatchedUpdateAll()
        .whenMatchedUpdate(Seq("v" -> "s.v"))
        .execute())
    assert(e.getMessage.contains("cannot mix"))
  }

  test("assignment to an unknown column errors loudly") {
    val t = fresh(Seq((1L, "a", 1.0)))
    val e = intercept[IllegalArgumentException](
      t.merge(Seq((1L, "b", 1.0)).toDF("id", "v", "amt"), Seq("id"))
        .whenMatchedUpdate(Seq("nope" -> "s.v"))
        .execute())
    assert(e.getMessage.contains("unknown column"))
  }

  test("insert-only clause merge: conditional inserts, dup sources both insert") {
    val t = fresh(Seq((1L, "a", 1.0)))
    t.merge(
      Seq((1L, "x", 0.0), (7L, "g", 7.0), (7L, "g2", 7.5), (8L, "h", -1.0))
        .toDF("id", "v", "amt"), Seq("id"))
      .whenNotMatchedInsert(
        Seq("id" -> "s.id", "v" -> "s.v", "amt" -> "s.amt"),
        cond = Some("s.amt >= 0"))
      .execute()
    val got = t.scan.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // matched row untouched; both id=7 duplicates insert (no matched clause
    // → no multiple-match ambiguity, standard SQL); negative amt filtered
    assert(got == Set((1L, "a"), (7L, "g"), (7L, "g2")))
  }

  test("clause merge against a RENAMED column (column mapping epoch)") {
    val t = fresh(Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    t.renameColumn("v", "label") // metadata-only; physical files still say v
    t.merge(Seq((1L, "A", 0.0), (3L, "c", 30.0)).toDF("id", "label", "amt"),
      Seq("id"))
      .whenMatchedUpdate(Seq("label" -> "concat(t.label, '+', s.label)"))
      .whenNotMatchedInsert(Seq(
        "id" -> "s.id", "label" -> "s.label", "amt" -> "s.amt"))
      .execute()
    val got = t.scan.select("id", "label", "amt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // pre-image read + write-back both go through the logical→physical
    // mapping: values must survive, not NULL out under the old name
    assert(got == Set((1L, "a+A", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("partitioned table: clause merge keeps the partition layout") {
    val t = GraftTable(spark, tmp())
    val df = (1L to 100L).map(i => (i, s"v$i", (i % 3).toString))
      .toDF("id", "v", "part")
    t.overwritePartitioned(df, Seq("part"), Seq("id"))
    t.merge(Seq((5L, "V5", "2")).toDF("id", "v", "part"), Seq("id"))
      .whenMatchedUpdate(Seq("v" -> "s.v"))
      .execute()
    val got = t.scan.filter("id = 5").head()
    // v updated, partition value untouched (unassigned)
    assert(got.getAs[String]("v") == "V5" && got.getAs[String]("part") == "2")
    assert(t.scan.count() == 100)
  }
}
