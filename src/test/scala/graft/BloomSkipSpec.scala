package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomSkipping, GraftTable}

/** Bloom-filter file skipping for non-clustered keys: sidecar
  * maintenance through the write funnel, scan/merge/row-level pruning,
  * soundness (a file holding the key is NEVER dropped), and the sidecar
  * lifecycle under vacuum/clone/compact.
  */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-bloom").toString

  /** A table whose key is SCATTERED across files — every file's min/max
    * range spans nearly the whole domain, so range pruning is useless
    * and any skipping observed can only come from the blooms. Keys are
    * shuffled round-robin into `files` buckets.
    */
  private def scattered(n: Int = 4000, files: Int = 8): GraftTable = {
    val t = GraftTable(spark, tmp())
    t.setProperty(GraftTable.BloomProperty, "k")
    val df = (0 until n).map { i => // multiplicative-hash bijection on [0,n)
      (f"key-${(i.toLong * 2654435761L) % n}%09d", i.toLong)
    }.toDF("k", "n")
      .repartition(files, col("n") % files) // interleaved: ranges overlap
    t.overwriteStats(df, Seq("k"))
    t
  }

  test("write funnel attaches sidecars for property-listed columns") {
    val t = scattered()
    val fs = t.filesOf(t.latestManifest.get)
    assert(fs.nonEmpty && fs.forall(_.bloom.isDefined))
    val blooms = BloomSkipping.load(t.root, fs.head.bloom.get)
    assert(blooms.keySet == Set("k"))
  }

  test("executor-written sidecar bytes equal a driver-side rebuild") {
    // the sidecar build runs on executors (only path pairs return to the
    // driver); the payload must be byte-identical to what a driver-side
    // collect-and-encode of the same aggregation produces — the bitmap
    // is an OR-fold, so bytes are deterministic whatever the merge order
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val t = scattered(n = 2000, files = 4)
    val fs = t.filesOf(t.latestManifest.get)
    assert(fs.forall(_.bloom.isDefined))
    val est = math.max(1000L, fs.map(_.rows).max)
    val bits = math.min(1L * 1024 * 1024 * 8, est * 10L)
    val agg = ColumnBridge.toColumn(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.toExpr(col("k")))),
      Literal(est), Literal(bits)).toAggregateExpression()).as("__b")
    fs.foreach { f =>
      val rebuilt = spark.read.parquet(s"${t.root}/${f.path}")
        .agg(agg).head().getAs[Array[Byte]](0)
      val expected = BloomSkipping.encode(Seq("k" -> rebuilt))
      val actual = Files.readAllBytes(Paths.get(t.root, f.bloom.get))
      assert(java.util.Arrays.equals(actual, expected),
        s"sidecar bytes for ${f.path} differ from driver-side rebuild")
    }
  }

  test("SQL TBLPROPERTIES sets the multi-column (comma-valued) bloom list") {
    // 'k1,k2' is the documented multi-column form of this property — the
    // comma must survive the TBLPROPERTIES pair split as a literal.
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq(("a", 1L)).toDF("k", "n"), None)
    spark.sql(s"ALTER TABLE graft.`${t.root}` SET TBLPROPERTIES " +
      s"('${GraftTable.BloomProperty}' = 'k,n', 'graft.note' = 'a, b')")
    assert(t.properties(GraftTable.BloomProperty) == "k,n")
    assert(t.properties("graft.note") == "a, b")
    t.overwriteStats((0 until 100).map(i => (s"key-$i", i.toLong))
      .toDF("k", "n"), Seq("k"))
    val fs = t.filesOf(t.latestManifest.get)
    assert(fs.forall(_.bloom.isDefined))
    assert(BloomSkipping.load(t.root, fs.head.bloom.get).keySet == Set("k", "n"))
  }

  test("point lookup scans fewer files than the table holds; result exact") {
    val t = scattered()
    val all = t.filesOf(t.latestManifest.get)
    // every file's k-range overlaps the probe (scattered layout)
    val probe = t.scan.select("k").orderBy("k").limit(1).as[String].head()
    val q = t.scan.filter(col("k") === probe)
    q.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    val nFiles = scans(q.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).max
    assert(nFiles < all.size,
      s"bloom should prune a scattered point lookup below ${all.size} files, read $nFiles")
    assert(q.count() == 1)
  }

  test("soundness: every present key is found through the bloom path") {
    val t = scattered(n = 500, files = 4)
    val keys = t.scan.select("k").as[String].collect()
    // every single key must survive pruning (false positives keep files;
    // false NEGATIVES would lose rows — structural soundness check)
    val misses = keys.count(k => t.scan.filter(col("k") === k).count() != 1L)
    assert(misses == 0, s"$misses keys lost to over-pruning")
    // and an absent key returns empty without error
    assert(t.scan.filter(col("k") === "nope").count() == 0)
  }

  test("merge point batch on scattered keys touches fewer files") {
    val t = scattered()
    val before = t.filesOf(t.latestManifest.get)
    val sample = t.scan.select("k", "n").orderBy("k").limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1) + 1000000))
    val v = t.merge(sample.toSeq.toDF("k", "n"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val after = t.filesOf(t.manifest(v)).map(_.path).toSet
    val survived = before.map(_.path).toSet.intersect(after)
    // without blooms the all-overlapping ranges rewrite every file; with
    // them only the files that might hold the 3 keys are touched
    assert(survived.size >= before.size - 3,
      s"merge touched ${before.size - survived.size} files for a 3-key batch")
    assert(t.scan.filter("n >= 1000000").count() == 3)
    assert(t.scan.count() == 4000)
  }

  test("row-level delete on a scattered string key reads only bloom-hit files") {
    val t = scattered()
    val before = t.filesOf(t.latestManifest.get)
    val victim = t.scan.select("k").orderBy(desc("k")).limit(1).as[String].head()
    val v = t.delete(s"k = '$victim'")
    val after = t.filesOf(t.manifest(v)).map(_.path).toSet
    // only the file(s) the bloom admits were candidates; at most those
    // were rewritten
    assert(before.map(_.path).toSet.intersect(after).size >= before.size - 2)
    assert(t.scan.count() == 3999)
  }

  test("rewrites refresh sidecars; compact keeps skipping effective") {
    val t = scattered(n = 1000, files = 4)
    t.compact(targetFileRows = 250L)
    val fs = t.filesOf(t.latestManifest.get)
    assert(fs.forall(_.bloom.isDefined)) // fresh files, fresh sidecars
    val k = t.scan.select("k").limit(1).as[String].head()
    assert(t.scan.filter(col("k") === k).count() == 1)
  }

  test("vacuum keeps referenced sidecars, reclaims superseded ones; clone links") {
    val t = scattered(n = 400, files = 2)
    val oldSidecars = t.filesOf(t.latestManifest.get).flatMap(_.bloom)
    val clone = t.cloneAt(t.latestVersion.get, tmp() + "/c")
    assert(clone.filesOf(clone.latestManifest.get).flatMap(_.bloom) == oldSidecars)
    assert(oldSidecars.forall(b => Files.exists(Paths.get(clone.root, b))))

    t.compact(targetFileRows = 100L) // supersedes the old files+sidecars
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(oldSidecars.forall(b => !Files.exists(Paths.get(t.root, b))))
    val kept = t.filesOf(t.latestManifest.get).flatMap(_.bloom)
    assert(kept.nonEmpty &&
      kept.forall(b => Files.exists(Paths.get(t.root, b))))
    // the clone's hard-linked copies are untouched by the source vacuum
    assert(oldSidecars.forall(b => Files.exists(Paths.get(clone.root, b))))
    assert(clone.scan.count() == 400)
  }

  test("blooms compose with deletion vectors (mask never widens a bloom)") {
    val t = scattered(n = 600, files = 3)
    val k = t.scan.select("k").limit(1).as[String].head()
    t.delete(s"k = '$k'", deletionVectors = Some(true))
    assert(t.scan.filter(col("k") === k).count() == 0)
    assert(t.scan.count() == 599)
    // files keep their sidecars through the masking commit
    assert(t.filesOf(t.latestManifest.get).forall(_.bloom.isDefined))
  }

  test("tables without the property are untouched (no sidecars, no probes)") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), Some("id"))
    assert(t.filesOf(t.latestManifest.get).forall(_.bloom.isEmpty))
    assert(t.scan.filter("id = 5").count() == 1)
  }
}
