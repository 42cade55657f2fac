package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Opt-in post-write auto-compaction: small-file self-healing on the
  * table's own write cadence.
  */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("small appends self-heal once the threshold is crossed; opt-in only") {
    val root = Files.createTempDirectory("graft-ac").toString
    val t = GraftTable(spark, root)
    t.overwrite(Seq((0L, "x")).toDF("k", "v"), Some("k"))

    // default OFF: small appends pile up untouched
    (1 to 6).foreach(i => t.append(Seq((i.toLong, "a")).toDF("k", "v"), Some("k")))
    assert(t.filesOf(t.latestManifest.get).size == 7)
    assert(!t.history.map(_.operation).contains("compact"))

    // opt in: the next append past the threshold triggers one bin-pack
    t.setProperty(GraftTable.AutoCompactProperty, "true")
    t.setProperty(GraftTable.AutoCompactMinFilesProperty, "8")
    t.setProperty(GraftTable.AutoCompactTargetProperty, "1000")
    t.append(Seq((7L, "a")).toDF("k", "v"), Some("k")) // 8 small files → compact
    assert(t.history.head.operation == "compact",
      s"auto-compact should follow the threshold append: ${t.history.map(_.operation)}")
    val files = t.filesOf(t.latestManifest.get)
    assert(files.size == 1, s"8 tiny files bin-pack into one: $files")
    assert(t.scan.count() == 8, "no row lost or duplicated")
    // stats survive the rewrite → pruning still works
    assert(files.forall(_.ranges.exists(_.contains("k"))))

    // below the threshold again: appends stay cheap, no compaction storm
    t.append(Seq((8L, "b")).toDF("k", "v"), Some("k"))
    assert(t.history.head.operation == "append")
    assert(t.scan.count() == 9)

    // merge path triggers it too once files accumulate
    (9 to 14).foreach(i =>
      t.merge(Seq((i.toLong, "m")).toDF("k", "v"), Seq("k"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    assert(t.history.map(_.operation).count(_ == "compact") >= 2,
      s"merge-created small files must self-heal: ${t.history.map(_.operation)}")
    assert(t.scan.count() == 15)
  }
}
