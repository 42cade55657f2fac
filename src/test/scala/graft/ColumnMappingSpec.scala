package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftTable}

/** In-JVM hook for the append/schema-change race test: fires exactly
  * once from an executor task mid-way through an append's file write,
  * opening the write→commit window a real concurrent writer would hit.
  */
object AppendRaceHook {
  @volatile var fire: () => Unit = () => ()
  val once = new java.util.concurrent.atomic.AtomicBoolean(true)
  def arm(f: () => Unit): Unit = { fire = f; once.set(false) }
  // the concurrent writer runs on its own (non-task) thread so its own
  // Spark jobs never execute inside the caller's task context
  def maybeFire(): Unit = if (once.compareAndSet(false, true)) {
    val th = new Thread(() => fire())
    th.start(); th.join()
  }
}

/** Column mapping (Delta parity): RENAME/DROP COLUMN as metadata-only
  * commits — physical file names never change, reads alias, writes
  * rename, stats/bloom pruning stays live, and a dropped column can
  * never resurrect through a later re-add.
  */
class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cmap").toString

  private def freshTable(): GraftTable = {
    val t = GraftTable(spark, tmp())
    t.overwriteStats((1L to 100L).map(i => (i, s"v$i", i % 7))
      .toDF("id", "v", "grp").repartitionByRange(4, col("id")), Seq("id"))
    t
  }

  test("rename is metadata-only: same files, new name, values intact") {
    val t = freshTable()
    val before = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val v = t.renameColumn("v", "label")
    val after = t.filesOf(t.manifest(v)).map(_.path).toSet
    assert(before == after, "rename must not rewrite any data file")
    assert(t.scan.columns.toSeq == Seq("id", "label", "grp"))
    assert(t.scan.filter("id = 42").select("label").head().getString(0) == "v42")
    assert(t.snapshot.columns.toSeq == Seq("id", "label", "grp"))
    assert(t.snapshot.filter(col("label") === "v7").count() == 1)
  }

  test("filters and pruning keep working on a renamed column") {
    val t = freshTable()
    t.renameColumn("id", "key")
    // stats are keyed under the old physical name; a filter on the new
    // logical name must still prune file listing AND return exact rows
    val hit = t.scan.filter("key BETWEEN 10 AND 15")
    assert(hit.count() == 6)
    val scanned = hit.select(input_file_name()).distinct().count()
    assert(scanned == 1, s"expected 1 range file scanned, got $scanned")
  }

  test("writes after a rename land under the original physical name") {
    val t = freshTable()
    t.renameColumn("v", "label")
    t.append(Seq((101L, "v101", 3L)).toDF("id", "label", "grp"), Some("id"))
    assert(t.scan.count() == 101)
    assert(t.scan.filter("id = 101").select("label").head().getString(0) == "v101")
    // merge speaks the new name too
    t.merge(Seq((101L, "patched", 3L)).toDF("id", "label", "grp"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.scan.filter("id = 101").select("label").head().getString(0) == "patched")
    // and the parquet files themselves still spell the ORIGINAL name
    val raw = spark.read.parquet(
      t.filesOf(t.latestManifest.get).map(f => s"${t.root}/${f.path}"): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("label"))
  }

  test("time travel reads each version under its own names") {
    val t = freshTable()
    val v1 = t.latestManifest.get.version
    val v2 = t.renameColumn("v", "label")
    assert(t.snapshotAt(v1).columns.toSeq == Seq("id", "v", "grp"))
    assert(t.snapshotAt(v1).filter(col("v") === "v9").count() == 1)
    assert(t.snapshotAt(v2).columns.toSeq == Seq("id", "label", "grp"))
    val pinned = spark.read.format("graft")
      .option("versionAsOf", v1.toString).load(t.root)
    assert(pinned.columns.toSeq == Seq("id", "v", "grp"))
  }

  test("drop is metadata-only; re-adding the name cannot resurrect values") {
    val t = freshTable()
    val before = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val v = t.dropColumn("v")
    assert(t.filesOf(t.manifest(v)).map(_.path).toSet == before)
    assert(t.scan.columns.toSeq == Seq("id", "grp"))
    // schema evolution re-adds a column NAMED v: fresh physical name —
    // old rows read NULL, never the retired column's stored strings
    t.append(Seq((200L, 1L, "new")).toDF("id", "grp", "v"), Some("id"))
    val rows = t.scan.filter("id IN (1, 200)").orderBy("id").collect()
    assert(rows(0).isNullAt(2), "old rows must NOT resurrect dropped values")
    assert(rows(1).getString(2) == "new")
  }

  test("concurrent DROP COLUMN between write and commit is a conflict, not NULLs") {
    val t = freshTable()
    // the batch's evaluation (during the append's file write) lands a
    // DROP COLUMN v commit — after the append derived physical names,
    // before it commits. The rebase would re-union v under a FRESH
    // physical name (v_2) while the batch's files spell v, so the rows
    // would silently read NULL; the guard must surface a retryable
    // conflict instead.
    AppendRaceHook.arm(() => { GraftTable(spark, t.root).dropColumn("v"); () })
    val hooked = udf((i: Long) => { AppendRaceHook.maybeFire(); i })
    val batch = (201L to 210L).map(i => (i, s"v$i", i % 7))
      .toDF("id", "v", "grp").withColumn("id", hooked(col("id")))
    val e = intercept[java.util.ConcurrentModificationException] {
      t.appendStats(batch, Seq("id"))
    }
    assert(e.getMessage.contains("re-mapped column(s) v"))
    // and the table is intact: drop landed, no appended rows committed
    assert(t.scan.columns.toSeq == Seq("id", "grp"))
    assert(t.scan.count() == 100)

    // a benign concurrent commit (plain append) still rebases lock-free
    AppendRaceHook.arm(() =>
      { GraftTable(spark, t.root).append(
          Seq((500L, 0L)).toDF("id", "grp"), Some("id")); () })
    val batch2 = (301L to 310L).map(i => (i, i % 7))
      .toDF("id", "grp").withColumn("id", hooked(col("id")))
    t.appendStats(batch2, Seq("id"))
    assert(t.scan.count() == 111)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN over a registered table") {
    val t = freshTable()
    GraftCatalog.register(spark, "demo", "cmap_t", t)
    spark.sql(s"ALTER TABLE graft.`${t.root}` RENAME COLUMN v TO label")
    spark.catalog.refreshTable("demo.cmap_t")
    val r = spark.sql(
      "SELECT label FROM demo.cmap_t WHERE id = 5").head()
    assert(r.getString(0) == "v5")
    // aggregation + predicate through spark.sql on the renamed column
    assert(spark.sql(
      "SELECT count(*) FROM demo.cmap_t WHERE label LIKE 'v%'")
      .head().getLong(0) == 100)
    spark.sql(s"ALTER TABLE graft.`${t.root}` DROP COLUMN grp")
    spark.catalog.refreshTable("demo.cmap_t")
    assert(spark.sql("SELECT * FROM demo.cmap_t").columns.toSeq ==
      Seq("id", "label"))
  }

  test("DELETE/UPDATE (COW and MOR) on a renamed column's table") {
    val t = freshTable()
    t.renameColumn("id", "key")
    t.delete("key <= 5")
    assert(t.scan.count() == 95)
    t.update(Map("v" -> "'x'"), "key = 50")
    assert(t.scan.filter("v = 'x'").count() == 1)
    // merge-on-read: mask rows under the mapping, fastCount agrees
    t.delete("key = 6", deletionVectors = Some(true))
    assert(t.scan.count() == 94)
    assert(t.fastCount == 94)
    assert(t.scan.filter("key = 6").count() == 0)
    // SQL over the DV-masked, column-mapped relation
    GraftCatalog.register(spark, "demo", "cmap_dv", t)
    assert(spark.sql("SELECT count(*) FROM demo.cmap_dv").head().getLong(0) == 94)
    assert(spark.sql("SELECT count(*) FROM demo.cmap_dv WHERE key <= 10")
      .head().getLong(0) == 4)
  }

  test("change feed spans a rename: one logical schema for old and new rows") {
    val t = GraftTable(spark, tmp())
    t.appendWithChangeFeed((1L to 5L).map(i => (i, s"a$i")).toDF("id", "v"), Seq("id"))
    t.renameColumn("v", "label")
    t.appendWithChangeFeed(Seq((6L, "b6")).toDF("id", "label"), Seq("id"))
    val feed = t.changeFeed()
    assert(feed.columns.toSeq == Seq("id", "label", "_change_type", "_commit_version"))
    assert(feed.count() == 6)
    assert(feed.filter(col("id") === 2).select("label").head().getString(0) == "a2")
    // merge-diffed change rows after the rename read back too
    t.merge(Seq((6L, "patched")).toDF("id", "label"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().withChangeFeed().execute()
    val upd = t.changeFeed().filter(col("_change_type") === "update_postimage")
    assert(upd.select("label").head().getString(0) == "patched")
  }

  test("clone and restore carry the mapping") {
    val t = freshTable()
    val vRenamed = t.renameColumn("v", "label")
    val c = t.cloneAt(vRenamed, tmp())
    assert(c.scan.columns.toSeq == Seq("id", "label", "grp"))
    assert(c.scan.filter("id = 3").select("label").head().getString(0) == "v3")
    // restore past the rename rewinds the logical name
    val v3 = t.renameColumn("label", "name2")
    t.restore(vRenamed)
    assert(t.scan.columns.toSeq == Seq("id", "label", "grp"))
    assert(v3 < t.latestManifest.get.version)
  }

  test("rename guards: constraints, partition drop, reserved and dup names") {
    val t = freshTable()
    t.addCheck("pos", "id > 0")
    val e = intercept[IllegalArgumentException](t.renameColumn("id", "key"))
    assert(e.getMessage.contains("constraint"))
    intercept[IllegalArgumentException](t.dropColumn("id"))
    t.dropCheck("pos")
    intercept[IllegalArgumentException](t.renameColumn("v", "grp")) // exists
    intercept[IllegalArgumentException](t.renameColumn("nope", "x")) // absent
    intercept[IllegalArgumentException](t.renameColumn("v", "_change_type"))

    val p = GraftTable(spark, tmp())
    p.overwritePartitioned(
      (1L to 10L).map(i => (i, i % 3)).toDF("id", "part"), Seq("part"))
    intercept[IllegalArgumentException](p.dropColumn("part"))
    // renaming a partition column updates the declaration
    p.renameColumn("part", "bucket")
    assert(p.partitionCols == Seq("bucket"))
    p.append(Seq((11L, 1L)).toDF("id", "bucket"))
    assert(p.scan.count() == 11)
  }

  test("bloom sidecars keep skipping across a rename (property follows)") {
    val t = GraftTable(spark, tmp())
    t.setProperty(GraftTable.BloomProperty, "k")
    // scattered keys: ranges overlap every file, only blooms can skip
    t.overwriteStats((0L until 400L).map(i => (i * 7919 % 400, i))
      .toDF("k", "n").repartition(8), Seq("n"))
    t.renameColumn("k", "key")
    assert(t.properties(GraftTable.BloomProperty) == "key")
    val hit = t.scan.filter("key = 77")
    assert(hit.count() == 1)
    val scanned = hit.select(input_file_name()).distinct().count()
    assert(scanned < 8, s"bloom skipping dead after rename: scanned $scanned/8")
    // post-rename writes still attach sidecars (under the physical name)
    t.append(Seq((1000L, 9999L)).toDF("key", "n"), Some("n"))
    assert(t.filesOf(t.latestManifest.get).forall(_.bloom.isDefined))
    assert(t.scan.filter("key = 1000").count() == 1)
  }

  test("ADD COLUMN: metadata-only, null-backfilled, retired-collision-safe") {
    val t = freshTable()
    val before = t.filesOf(t.latestManifest.get).map(_.path).toSet
    // explicit add through SQL, parameterized type with a comma
    spark.sql(s"ALTER TABLE graft.`${t.root}` ADD COLUMNS " +
      "(score DECIMAL(10,2), note STRING)")
    assert(t.filesOf(t.latestManifest.get).map(_.path).toSet == before)
    assert(t.scan.columns.toSeq == Seq("id", "v", "grp", "score", "note"))
    assert(t.scan.filter("score IS NOT NULL").count() == 0) // backfill
    t.append(Seq((300L, "x", 1L, "1.50", "n"))
      .toDF("id", "v", "grp", "score", "note")
      .withColumn("score", col("score").cast("decimal(10,2)")), Some("id"))
    assert(t.scan.filter("score = 1.50").count() == 1)
    // drop then explicit re-ADD: fresh physical, no resurrection
    t.dropColumn("v")
    t.addColumn("v", "string")
    assert(t.scan.filter("id = 1").select("v").head().isNullAt(0))
    intercept[IllegalArgumentException](t.addColumn("id", "long")) // exists
  }

  test("writes conform drifted column types to the declared schema") {
    val t = GraftTable(spark, tmp())
    t.overwriteStats(Seq((1L, "a")).toDF("id", "v")
      .withColumn("score", lit("9.25").cast("decimal(10,2)")), Seq("id"))
    // append with DRIFTED types: decimal(38,18) score, int id — both must
    // land as the table's declared types or every later read of the new
    // file fails with a parquet type mismatch
    t.append(Seq((2, BigDecimal("1.505"))).toDF("id", "score")
      .withColumn("v", lit("b")), Some("id"))
    assert(t.scan.count() == 2)
    assert(t.scan.schema("score").dataType.simpleString == "decimal(10,2)")
    assert(t.scan.filter("id = 2").select("score").head()
      .getDecimal(0).toPlainString == "1.51") // cast rounded to (10,2)
    // merge with a drifted type conforms too
    t.merge(Seq((3, "c", "2.000")).toDF("id", "v", "score")
      .withColumn("id", col("id").cast("int"))
      .withColumn("score", col("score").cast("decimal(30,10)")), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.scan.count() == 3)
    assert(t.scan.filter("id = 3").select("score").head()
      .getDecimal(0).toPlainString == "2.00")
  }

  test("SQL DML speaks the renamed names (DELETE/UPDATE/MERGE INTO)") {
    val t = freshTable()
    t.renameColumn("id", "key")
    t.renameColumn("v", "label")
    GraftCatalog.register(spark, "demo", "cmap_dml", t)
    spark.sql("DELETE FROM demo.cmap_dml WHERE key <= 5")
    assert(t.scan.count() == 95)
    spark.sql("UPDATE demo.cmap_dml SET label = 'xx' WHERE key = 50")
    assert(spark.sql(
      "SELECT count(*) FROM demo.cmap_dml WHERE label = 'xx'")
      .head().getLong(0) == 1)
    Seq((6L, "back", 0L), (200L, "new", 4L)).toDF("key", "label", "grp")
      .createOrReplaceTempView("cmap_src")
    spark.sql("""MERGE INTO demo.cmap_dml t USING cmap_src s
      ON t.key = s.key
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(t.scan.count() == 96) // 95 + new key 200 (key 6 matched→updated)
    assert(t.scan.filter("key = 6").select("label").head().getString(0) == "back")
    assert(t.scan.filter("key = 200").select("label").head().getString(0) == "new")
  }

  test("REORG PURGE sheds dropped-column data from the files") {
    val t = freshTable()
    t.dropColumn("v")
    // pre-purge: files still physically carry the dropped column
    val before = t.filesOf(t.latestManifest.get)
    val raw = spark.read
      .parquet(before.map(f => s"${t.root}/${f.path}"): _*)
    assert(raw.columns.contains("v"))
    val v = t.reorgPurge()
    val after = t.filesOf(t.manifest(v))
    assert(after.map(_.path).toSet.intersect(before.map(_.path).toSet).isEmpty,
      "every dropped-column-carrying file must be rewritten")
    val rawAfter = spark.read
      .parquet(after.map(f => s"${t.root}/${f.path}"): _*)
    assert(!rawAfter.columns.contains("v"), "dropped bytes must be gone")
    assert(t.scan.count() == 100)
    // converged: a second purge is a no-op (no DV, no retired bytes)
    assert(t.reorgPurge() == v)
  }

  test("compact and REORG PURGE materialize the mapping away") {
    val t = freshTable()
    t.renameColumn("v", "label")
    t.delete("id = 10", deletionVectors = Some(true))
    t.compact()
    // content survives the full rewrite (mask applied, names mapped)
    assert(t.scan.count() == 99)
    assert(t.scan.filter("label = 'v11'").count() == 1)
    assert(t.scan.columns.toSeq == Seq("id", "label", "grp"))
    // a rewritten table keeps reading correctly post-REORG too
    t.delete("id = 11", deletionVectors = Some(true))
    t.reorgPurge()
    assert(t.scan.count() == 98)
    assert(t.scan.filter("label = 'v12'").count() == 1)
  }
}
