package graft

import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftTable, Manifest}

/** Test double counting driver-side manifest JSON reads — the metric the
  * txn index and the batched feed repair exist to bound.
  */
class CountingTable(root: String) extends GraftTable(TestSpark.spark, root) {
  var manifestReads = 0
  override def manifest(version: Long): Manifest = {
    manifestReads += 1
    super.manifest(version)
  }
}

/** The `_graft/txns` idempotent-writer index: replay lookups must cost
  * O(1) manifest reads regardless of table age (SilverLoader runs one
  * per entity per load), must self-heal after a crash lost the index
  * write, and must remember markers past the vacuum horizon.
  */
class TxnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-txn").toString

  /** v1 from a real write, then `commits-1` metadata-only commits each
    * carrying txn marker "app:<version>" — a deep history built without
    * paying for data jobs.
    */
  private def deepTable(root: String, commits: Int): GraftTable = {
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    val m = t.latestManifest.get
    val schema = StructType.fromDDL(m.schema)
    (2 to commits).foreach { i =>
      t.commit(schema, m.files, Some(i - 1L), op = "merge",
        txn = Some(s"app:$i"), txnApp = Some("app"))
    }
    t
  }

  test("indexed txn lookups on a deep table read zero manifests") {
    val root = tmp()
    deepTable(root, 120)
    val ct = new CountingTable(root)
    assert(ct.txnVersion("app", "app:120").contains(120L))
    assert(ct.txnVersion("app", "app:5").contains(5L))
    assert(ct.lastTxn("app").contains(120L))
    assert(ct.txnVersion("app", "app:999").isEmpty)
    assert(ct.manifestReads == 0,
      s"a 120-version table's replay checks must not scan its history " +
        s"(read ${ct.manifestReads} manifests) — this is the per-load hot path")
  }

  test("a commit missing from the index is found in the crash window and healed") {
    val root = tmp()
    val t = deepTable(root, 50)
    // crash simulation: the commit's manifest rename landed but the
    // post-commit index write did not (txnApp = None produces exactly
    // that on-disk state)
    val m = t.latestManifest.get
    t.commit(StructType.fromDDL(m.schema), m.files, Some(50L), op = "merge",
      txn = Some("app:51"))
    val ct = new CountingTable(root)
    assert(ct.txnVersion("app", "app:51").contains(51L))
    assert(ct.manifestReads == 1,
      s"only the crash window (1 manifest) may be scanned, read ${ct.manifestReads}")
    // found-by-scan markers heal the index: the next lookup is pure index
    val ct2 = new CountingTable(root)
    assert(ct2.txnVersion("app", "app:51").contains(51L))
    assert(ct2.lastTxn("app").contains(51L))
    assert(ct2.manifestReads == 0)
  }

  test("replay markers survive vacuum (the index outlives manifests)") {
    val root = tmp()
    val t = deepTable(root, 30)
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    intercept[java.nio.file.NoSuchFileException](t.manifest(5L))
    assert(t.txnVersion("app", "app:5").contains(5L),
      "an indexed marker must stay detectable after its manifest is vacuumed — " +
        "replay depth must not couple to retention")
    // the legacy appId-less form honestly forgets (documented caveat)
    assert(t.txnVersion("app:5").isEmpty)
  }
}
