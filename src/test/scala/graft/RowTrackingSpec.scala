package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Row tracking (Delta row-ID parity): stable per-row ids that survive
  * every rewrite — merge, COW/MOR UPDATE and DELETE, replaceWhere,
  * compaction, z-order — enabling EXACT change pairing by identity
  * ([[GraftTable.changesBetweenByRow]]) where key-based pairing misreads
  * key-changing updates as delete+insert.
  */
class RowTrackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-rowtrack").toString

  private def df3(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("id", "name", "amount")

  /** id → _row_id map of the current snapshot (unique ids asserted). */
  private def idsOf(t: GraftTable): Map[Long, Long] = {
    val got = t.snapshotWithRowIds()
      .select(col("id"), col(GraftTable.RowIdOut))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._2).distinct.length == got.length,
      s"duplicate row ids: ${got.mkString(", ")}")
    got.toMap
  }

  test("enable is a metadata-only commit; ids are unique and stable reads") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), Some("id"))
    val bytesBefore = t.filesOf(t.latestManifest.get)
      .map(f => Files.size(java.nio.file.Paths.get(t.root, f.path))).sum
    val v = t.enableRowTracking()
    assert(v == 2L)
    assert(t.enableRowTracking() == 2L) // idempotent
    val bytesAfter = t.filesOf(t.latestManifest.get)
      .map(f => Files.size(java.nio.file.Paths.get(t.root, f.path))).sum
    assert(bytesBefore == bytesAfter, "enable must not rewrite data")
    val ids = idsOf(t)
    assert(ids.size == 3)
    assert(idsOf(t) == ids) // re-read: same assignment
    // pre-enablement versions cannot serve ids — loud, never NULLs
    val e = intercept[IllegalArgumentException](t.snapshotWithRowIdsAt(1L))
    assert(e.getMessage.contains("row tracking"))
  }

  test("appends allocate fresh non-colliding ranges; hwm never reuses") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0)), Some("id"))
    t.enableRowTracking()
    val ids1 = idsOf(t)
    t.append(df3((2L, "b", 2.0), (3L, "c", 3.0)))
    t.append(df3((4L, "d", 4.0)))
    val ids2 = idsOf(t)
    assert(ids2.size == 4)
    assert(ids2(1L) == ids1(1L), "append must not move existing ids")
  }

  test("COW update/delete preserve surviving ids; update keeps the changed row's id") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), Some("id"))
    t.enableRowTracking()
    val before = idsOf(t)
    t.update(Map("amount" -> "amount * 10"), "id = 2")
    val afterU = idsOf(t)
    assert(afterU == before, "COW update moved row ids")
    t.delete("id = 3")
    val afterD = idsOf(t)
    assert(afterD == before - 3L, "COW delete changed surviving ids")
  }

  test("MOR update/delete preserve ids (file and positions never move)") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), Some("id"))
    t.enableRowTracking()
    val before = idsOf(t)
    t.update(Map("amount" -> "0.0"), "id = 1", deletionVectors = Some(true))
    assert(idsOf(t) == before, "MOR update moved row ids")
    t.delete("id = 2", deletionVectors = Some(true))
    assert(idsOf(t) == before - 2L, "MOR delete changed surviving ids")
  }

  test("OPTIMIZE and z-order are invisible to row identity") {
    val t = GraftTable(spark, tmp())
    t.overwrite(
      (0L until 200L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount")
        .repartition(8), Some("id"))
    t.enableRowTracking()
    val before = idsOf(t)
    val v0 = t.latestVersion.get
    t.compact(targetFileRows = 50L)
    assert(idsOf(t) == before, "compact moved row ids")
    t.compactZOrder("id", "amount", targetFileRows = 50L)
    assert(idsOf(t) == before, "z-order moved row ids")
    // the CDF witness: identity diff across two rewrites = NO changes
    assert(t.changesBetweenByRow(v0, t.latestVersion.get).count() == 0L)
  }

  test("merge: updated rows keep ids, inserts get fresh distinct ids (fast + clause paths)") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id"))
    t.enableRowTracking()
    val before = idsOf(t)
    // fast path (updateAll+insertAll, broadcastable batch)
    t.merge(df3((2L, "B", 2.2), (3L, "c", 3.0)), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val after = idsOf(t)
    assert(after(1L) == before(1L) && after(2L) == before(2L),
      "merge moved matched/kept row ids")
    assert(!before.values.toSet.contains(after(3L)), "insert reused an id")
    // clause path
    t.merge(df3((3L, "C", 3.3), (4L, "d", 4.0)), Seq("id"))
      .whenMatchedUpdate(Seq("amount" -> "source.amount"))
      .whenNotMatchedInsert(Seq(
        "id" -> "source.id", "name" -> "source.name",
        "amount" -> "source.amount")).execute()
    val after2 = idsOf(t)
    assert(after2(3L) == after(3L), "clause-path update moved the row id")
    assert(after2.size == 4 && after2.values.toSet.size == 4)
  }

  test("replaceWhere keeps untouched-slice ids, replaced slice gets fresh ids") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0), (11L, "x", 11.0)), Some("id"))
    t.enableRowTracking()
    val before = idsOf(t)
    t.overwriteWhere(df3((12L, "y", 12.0)), "id >= 10")
    val after = idsOf(t)
    assert(after(1L) == before(1L) && after(2L) == before(2L),
      "replaceWhere moved kept-row ids")
    assert(!before.values.toSet.contains(after(12L)))
  }

  test("changesBetweenByRow pairs a KEY-changing update as update, not delete+insert") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id"))
    t.enableRowTracking()
    val v0 = t.latestVersion.get
    t.update(Map("id" -> "20"), "id = 2") // the key itself changes
    t.compact(targetFileRows = 100L) // and a rewrite lands in between
    val v1 = t.latestVersion.get
    val ch = t.changesBetweenByRow(v0, v1)
      .select("id", "_change_type", GraftTable.RowIdOut)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val rid = idsOf(t)(20L)
    assert(ch == Set((2L, "update_preimage", rid), (20L, "update_postimage", rid)),
      s"got $ch — key-based pairing would have produced delete+insert")
    // key-based diff on the same versions DOES misread it — the contrast
    val byKey = t.changesBetween(v0, v1, Seq("id"))
      .select("_change_type").as[String].collect().sorted
    assert(byKey.toSeq == Seq("delete", "insert"))
  }

  test("the row-id namespace is reserved — user columns refused loudly") {
    val t = GraftTable(spark, tmp())
    // physical names: refused on every commit, tracking or not (a stray
    // materialized id would be served as real after enablement)
    val e1 = intercept[IllegalArgumentException](
      t.overwrite(Seq((1L, 5L)).toDF("id", "_graft_row_id")))
    assert(e1.getMessage.contains("reserved"))
    assert(e1.getMessage.contains("RENAME COLUMN"), "must name the escape hatch")
    // user-facing names: fine while tracking is off (converted/legacy
    // tables keep committing) — enablement is what refuses them
    t.overwrite(Seq((1L, 5L)).toDF("id", "_row_id"))
    t.append(Seq((2L, 6L)).toDF("id", "_row_id"))
    val e2 = intercept[IllegalArgumentException](t.enableRowTracking())
    assert(e2.getMessage.contains("RENAME COLUMN"))
    assert(!t.rowTrackingEnabled)
    // once tracked, the read-surface names are refused on commits too
    val t2 = GraftTable(spark, tmp())
    t2.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t2.enableRowTracking()
    val e3 = intercept[IllegalArgumentException](
      t2.overwrite(Seq((1L, 5L)).toDF("id", "_row_commit_version")))
    assert(e3.getMessage.contains("RENAME COLUMN"))
  }

  test("clone inherits tracking: same ids, allocation continues above the watermark") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id"))
    t.enableRowTracking()
    t.update(Map("amount" -> "9.9"), "id = 1") // a materialized-id file too
    val ids = idsOf(t)
    val c = t.cloneAt(t.latestVersion.get, tmp() + "/clone")
    assert(idsOf(c) == ids, "clone must serve the source's exact ids")
    c.append(df3((3L, "c", 3.0)))
    val after = idsOf(c)
    assert(after.size == 3 && after.values.toSet.size == 3,
      "clone reissued an id the cloned files already carry")
  }

  test("converted (pv) Hive-import tables preserve ids through DML and compaction") {
    val dir = tmp() + "/hive"
    (1L to 300L)
      .map(i => (i, s"v$i", 2020 + (i % 2).toInt, (i % 3).toInt + 1))
      .toDF("k", "v", "yyyy", "mm")
      .repartition(2)
      .write.partitionBy("yyyy", "mm").parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    t.enableRowTracking()
    def kIds(): Map[Long, Long] = t.snapshotWithRowIds()
      .select(col("k"), col(GraftTable.RowIdOut))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = kIds()
    assert(before.size == 300 && before.values.toSet.size == 300)
    t.update(Map("v" -> "'up'"), "k % 50 = 0") // pv-funnel rewrite
    val afterU = kIds()
    assert(afterU == before, "pv rewrite moved row ids")
    t.delete("k <= 10")
    assert(kIds() == before.filter(_._1 > 10L))
    t.compact(targetFileRows = 1000L)
    assert(kIds() == before.filter(_._1 > 10L), "pv compact moved row ids")
  }

  test("row commit versions: last-modified survives copies, bumps on updates") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id")) // v1
    t.enableRowTracking() // v2 — backfill default
    def rcvOf(): Map[Long, Long] = t.snapshotWithRowIds()
      .select(col("id"), col(GraftTable.RowCommitOut))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rcvOf() == Map(1L -> 2L, 2L -> 2L))
    t.append(df3((3L, "c", 3.0))) // v3
    assert(rcvOf() == Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
    t.update(Map("amount" -> "9.9"), "id = 2") // v4 — COW
    assert(rcvOf() == Map(1L -> 2L, 2L -> 4L, 3L -> 3L))
    t.compact(targetFileRows = 100L) // v5 — copies must NOT bump
    assert(rcvOf() == Map(1L -> 2L, 2L -> 4L, 3L -> 3L),
      "compaction bumped last-modified versions")
    // merge: matched update bumps, untouched keeps, insert gets fresh
    val v6 = t.merge(df3((3L, "C", 3.3), (4L, "d", 4.0)), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(rcvOf() == Map(1L -> 2L, 2L -> 4L, 3L -> v6, 4L -> v6))
    // the incremental read: rows modified since v3 straight off a snapshot
    val since = t.snapshotWithRowIds()
      .filter(col(GraftTable.RowCommitOut) > 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(since == Set(2L, 3L, 4L))
    // MOR update bumps via post-image default; DV-masked file keeps others
    t.update(Map("amount" -> "0.0"), "id = 1", deletionVectors = Some(true))
    val after = rcvOf()
    assert(after(1L) == t.latestVersion.get && after(2L) == 4L)
  }

  test("changedSince: manifest-level file skip, exact rows, stable under OPTIMIZE") {
    val t = GraftTable(spark, tmp())
    t.overwrite(
      (0L until 200L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount")
        .repartition(4), Some("id")) // v1, several files
    t.enableRowTracking() // v2
    val cut = t.latestVersion.get
    t.append(df3((1000L, "x", 0.5), (1001L, "y", 1.5))) // v3
    t.update(Map("amount" -> "-1.0"), "id = 7") // v4 — COW rewrite
    // file skip: the untouched original files never open
    val m = t.latestManifest.get
    val pruned = t.filesChangedSince(m, cut)
    assert(pruned.size < t.filesOf(m).size && pruned.nonEmpty,
      s"expected a strict file subset: ${pruned.size} of ${t.filesOf(m).size}")
    assert(t.filesOf(m).diff(pruned).forall(_.rcv.exists(_ <= cut)))
    def changed(): Set[Long] = t.changedSince(cut)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(changed() == Set(7L, 1000L, 1001L))
    // OPTIMIZE re-packs old rows into new files; materialized versions
    // keep the row-level answer identical (pruning loses, truth doesn't)
    t.compact(targetFileRows = 1000L)
    assert(changed() == Set(7L, 1000L, 1001L),
      "compaction changed the changed-since answer")
    assert(t.changedSince(t.latestVersion.get).count() == 0L)
  }

  test("concurrent appends never collide on row ids (lock-free allocation)") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((0L, "z", 0.0)), Some("id"))
    t.enableRowTracking()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit =
            for (b <- 0 until 3) {
              val base = w * 10000L + b * 100L
              t.append((base until base + 25L).map(i => (i, s"w$w", 1.0))
                .toDF("id", "name", "amount"))
            }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val ids = t.snapshotWithRowIds()
      .select(col(GraftTable.RowIdOut)).collect().map(_.getLong(0))
    assert(ids.length == 1 + 4 * 3 * 25)
    assert(ids.distinct.length == ids.length,
      "concurrent appends allocated overlapping row-id ranges")
  }

  test("SQL surface: TBLPROPERTIES enables tracking; table_changes_by_row pairs by id") {
    val root = tmp()
    val t = GraftTable(spark, root)
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id"))
    spark.sql(
      s"ALTER TABLE graft.`$root` SET TBLPROPERTIES ('graft.rowTracking' = 'true')")
    assert(t.rowTrackingEnabled)
    val v0 = t.latestVersion.get
    spark.sql(s"UPDATE graft.`$root` SET id = 20 WHERE id = 2")
    t.compact(targetFileRows = 100L)
    val ch = spark.sql(
      s"SELECT id, _change_type FROM table_changes_by_row('graft.`$root`', $v0)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((2L, "update_preimage"), (20L, "update_postimage")),
      s"got $ch")
    // disabling is refused loudly
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$root` SET TBLPROPERTIES ('graft.rowTracking' = 'false')"))
    assert(e.getMessage.contains("cannot be disabled"))
    // the changed-since TVF: same file-skipped read, SQL-side
    val since = spark.sql(
      s"SELECT id FROM table_changed_since('graft.`$root`', $v0)")
      .collect().map(_.getLong(0)).toSet
    assert(since == Set(20L), s"got $since")
  }

  test("overwrite and truncate keep the id namespace monotone — retired ids never reissue") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id"))
    t.enableRowTracking()
    val retired = idsOf(t).values.toSet
    t.overwrite(df3((9L, "z", 9.0)), Some("id"))
    assert(t.rowTrackingEnabled, "overwrite dropped the watermark")
    val afterOw = idsOf(t)
    assert(afterOw.values.toSet.intersect(retired).isEmpty,
      "overwrite reissued a retired id")
    t.truncate()
    t.append(df3((10L, "w", 10.0)))
    val afterTr = idsOf(t)
    assert(afterTr.values.toSet
      .intersect(retired ++ afterOw.values.toSet).isEmpty,
      "truncate reissued a retired id")
  }

  test("restore to a pre-enablement version keeps tracking on with fresh unique ids") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id")) // v1
    t.enableRowTracking() // v2
    t.append(df3((3L, "c", 3.0))) // v3
    t.restore(1) // v4: restored files predate enablement (no baseRowId)
    assert(t.rowTrackingEnabled, "restore must not drop the watermark")
    val ids = idsOf(t) // fresh assignment for the restored entries
    assert(ids.keySet == Set(1L, 2L))
    t.append(df3((4L, "d", 4.0)))
    val after = idsOf(t)
    assert(after.size == 3 && after.values.toSet.size == 3,
      "post-restore append collided with restored ids")
  }

  private def deletedIdsOf(t: GraftTable, since: Long): Set[Long] =
    t.deletedSince(since)
      .select(GraftTable.RowIdOut).collect().map(_.getLong(0)).toSet

  test("deletedSince: COW delete, MOR delete, replaceWhere shrink — and rewrites report nothing") {
    val t = GraftTable(spark, tmp())
    t.overwrite(
      (1L to 10L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"),
      Some("id"))
    t.enableRowTracking()
    val v0 = t.latestVersion.get
    val ids0 = idsOf(t)
    // COW delete of two rows
    t.delete("id IN (2, 3)")
    assert(deletedIdsOf(t, v0) == Set(ids0(2L), ids0(3L)))
    // MOR delete (deletion vector — no file removed, DV grows)
    val v1 = t.latestVersion.get
    t.delete("id = 4", deletionVectors = Some(true))
    assert(deletedIdsOf(t, v1) == Set(ids0(4L)), "DV growth must report the masked row")
    assert(deletedIdsOf(t, v0) == Set(ids0(2L), ids0(3L), ids0(4L)),
      "windows compose: the older cut sees both deletes")
    // MOR UPDATE masks a position but MOVES the row — not a delete
    val v2 = t.latestVersion.get
    t.update(Map("amount" -> "-1.0"), "id = 5", deletionVectors = Some(true))
    assert(deletedIdsOf(t, v2) == Set.empty,
      "a MOR update's masked pre-image position is a move, not a delete")
    // compaction / z-order: pure rewrites contribute ZERO deletions
    val v3 = t.latestVersion.get
    t.compact(targetFileRows = 3L)
    assert(deletedIdsOf(t, v3) == Set.empty, "compaction must be invisible")
    assert(deletedIdsOf(t, v0) == Set(ids0(2L), ids0(3L), ids0(4L)),
      "compaction must not corrupt an older window either")
    // replaceWhere shrink: the slice reloads with fewer rows — the
    // missing ones are deletions, the reloaded ones are fresh identity
    val v4 = t.latestVersion.get
    val ids4 = idsOf(t)
    t.overwriteWhere(Seq((8L, "h8", 88.0)).toDF("id", "name", "amount"),
      "id >= 8")
    val del4 = deletedIdsOf(t, v4)
    assert(del4 == Set(ids4(8L), ids4(9L), ids4(10L)),
      s"slice shrink must retire every replaced id, got $del4")
    // the SQL TVF serves the same set
    val viaSql = spark.sql(
      s"SELECT _row_id FROM table_deleted_since('graft.`${t.root}`', $v4)")
      .collect().map(_.getLong(0)).toSet
    assert(viaSql == del4)
    // changedSince + deletedSince compose into a complete mirror sync
    val mirror = t.snapshotWithRowIdsAt(v4).drop(GraftTable.RowCommitOut)
    val ups = t.changedSince(v4).drop(GraftTable.RowCommitOut)
    val order = Seq("id", "name", "amount", GraftTable.RowIdOut)
    val synced = mirror
      .join(ups.select(GraftTable.RowIdOut), Seq(GraftTable.RowIdOut), "left_anti")
      .unionByName(ups)
      .join(t.deletedSince(v4), Seq(GraftTable.RowIdOut), "left_anti")
      .select(order.map(col): _*) // exceptAll is positional; joins reorder
    val want = t.snapshotWithRowIds().drop(GraftTable.RowCommitOut)
      .select(order.map(col): _*)
    assert(synced.exceptAll(want).isEmpty && want.exceptAll(synced).isEmpty,
      "upserts+deletes must reproduce the latest snapshot exactly")
  }

  test("deletedSince: overwrite and truncate retire every id; pre-tracking cut refused") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id")) // v1 untracked
    t.enableRowTracking() // v2
    val v2 = t.latestVersion.get
    val old = idsOf(t).values.toSet
    t.overwrite(df3((9L, "z", 9.0)), Some("id"))
    assert(deletedIdsOf(t, v2) == old, "overwrite retires every prior id")
    val v3 = t.latestVersion.get
    t.truncate()
    assert(deletedIdsOf(t, v3) == idsOf0(t, v3),
      "truncate retires the overwritten row's id")
    val e = intercept[IllegalArgumentException](t.deletedSince(1L))
    assert(e.getMessage.contains("row tracking"))
    // the TVF validates its arity loudly
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM table_deleted_since('graft.`${t.root}`')"))
    assert(e2.getMessage.contains("expects"), e2.getMessage)
  }

  private def idsOf0(t: GraftTable, v: Long): Set[Long] =
    t.snapshotWithRowIdsAt(v).select(GraftTable.RowIdOut)
      .collect().map(_.getLong(0)).toSet

  test("syncSince/syncMirror: one-call complete mirror sync — bootstrap, DML window, evolution") {
    val t = GraftTable(spark, tmp())
    t.overwrite(
      (1L to 10L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"),
      Some("id"))
    t.enableRowTracking()
    val mirror = GraftTable(spark, tmp() + "/m")
    def mirrorRows(cols: String*): Set[Seq[Any]] =
      mirror.snapshot.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    def sourceRows(cols: String*): Set[Seq[Any]] =
      t.snapshotWithRowIds().drop(GraftTable.RowCommitOut)
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    // first call bootstraps the FULL snapshot regardless of the cursor
    val c0 = t.syncMirror(mirror, 0L)
    assert(mirrorRows("id", "name", GraftTable.RowIdOut) ==
      sourceRows("id", "name", GraftTable.RowIdOut))
    // a window with every shape: key-changing update, COW delete, MOR
    // delete, insert, and a compaction that must contribute nothing
    t.update(Map("id" -> "20"), "id = 2")
    t.delete("id = 3")
    t.delete("id = 4", deletionVectors = Some(true))
    t.append(df3((11L, "k", 11.0)))
    t.compact(targetFileRows = 100L)
    // the one-call surface tags each half
    val sync = t.syncSince(c0)
    val acts = sync.select("_sync_action").collect().map(_.getString(0))
    assert(acts.count(_ == "delete") == 2 && acts.count(_ == "upsert") >= 2,
      s"got ${acts.toSeq}")
    val c1 = t.syncMirror(mirror, c0)
    assert(c1 == t.latestVersion.get)
    assert(mirrorRows("id", "name", "amount", GraftTable.RowIdOut) ==
      sourceRows("id", "name", "amount", GraftTable.RowIdOut),
      "mirror must equal the source exactly after one sync call")
    // schema evolution inside the window widens the mirror
    t.addColumn("note", "STRING")
    t.merge(Seq((20L, "noted"), (12L, "fresh")).toDF("id", "note"), Seq("id"))
      .whenMatchedUpdate(Seq("note" -> "s.note"))
      .whenNotMatchedInsert(Seq("id" -> "s.id", "note" -> "s.note"))
      .execute()
    t.syncMirror(mirror, c1)
    assert(mirrorRows("id", "name", "amount", "note", GraftTable.RowIdOut) ==
      sourceRows("id", "name", "amount", "note", GraftTable.RowIdOut),
      "evolution must widen the mirror with nullable backfill")
    // the SQL TVF serves the same pairing
    val viaSql = spark.sql(
      s"SELECT _sync_action, count(*) AS n FROM " +
        s"table_sync_since('graft.`${t.root}`', $c0) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql.getOrElse("delete", 0L) == 2L)
  }

  test("SYNC INTO statement: bootstrap, incremental, and the no-SINCE refusal") {
    val base = tmp()
    val t = GraftTable(spark, s"$base/src")
    t.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), Some("id"))
    t.enableRowTracking()
    val (srcSql, mirSql) = (s"graft.`$base/src`", s"graft.`$base/mirror`")
    // bootstrap: no SINCE on a missing mirror = full pinned snapshot
    val c0 = spark.sql(s"SYNC $srcSql INTO $mirSql").head().getLong(0)
    val mirror = GraftTable(spark, s"$base/mirror")
    assert(mirror.snapshot.count() == 3 && c0 == t.latestVersion.get)
    // incremental: the statement applies the full change algebra
    t.update(Map("id" -> "20"), "id = 2")
    t.delete("id = 3")
    t.append(Seq((4L, "d")).toDF("id", "name"))
    val c1 = spark.sql(s"SYNC $srcSql INTO $mirSql SINCE VERSION $c0")
      .head().getLong(0)
    assert(c1 == t.latestVersion.get)
    def rows(tt: GraftTable) = tt.snapshot.select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(mirror) == Set((1L, "a"), (20L, "b"), (4L, "d")))
    assert(rows(mirror) == rows(t))
    // no SINCE on an EXISTING mirror must refuse, not silently rebuild
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SYNC $srcSql INTO $mirSql").collect()
    }
    assert(e.getMessage.contains("SINCE"), e.getMessage)
  }

  test("deletedSince: a vacuumed cut fails loudly with a retention error, not FileNotFound") {
    val t = GraftTable(spark, tmp())
    t.overwrite(
      (1L to 10L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"),
      Some("id"))
    t.enableRowTracking()
    val cut = t.latestVersion.get
    t.delete("id IN (2, 3)") // COW: the pre-image file leaves the manifest
    assert(deletedIdsOf(t, cut).size == 2) // answerable while retained
    // retire the removed pre-image file, as a concurrent or past-horizon
    // VACUUM would — the diff must refuse with a NAMED retention error
    // BEFORE launching the scan, never a raw FileNotFoundException
    val nowPaths = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val removed = t.filesOf(t.manifest(cut))
      .filterNot(f => nowPaths.contains(f.path))
    assert(removed.nonEmpty)
    removed.foreach(f =>
      Files.delete(java.nio.file.Paths.get(t.root, f.path)))
    val e = intercept[IllegalStateException](t.deletedSince(cut))
    assert(e.getMessage.contains("vacuumed") &&
      e.getMessage.contains("retention"), s"got: ${e.getMessage}")
  }

  test("restore to a pre-enablement CHUNKED version re-allocates instead of wedging") {
    val t = GraftTable(spark, tmp())
    t.manifestChunkFiles = 4
    t.overwrite(
      (0L until 100L).map(i => (i, s"n$i", i.toDouble))
        .toDF("id", "name", "amount").repartition(10), Some("id")) // v1: chunked
    assert(t.latestManifest.get.chunks.exists(_.nonEmpty),
      "fixture must actually be chunked")
    t.enableRowTracking() // v2
    t.update(Map("amount" -> "-1.0"), "id = 5") // v3
    t.restore(1) // v1's chunk refs reference files with no baseRowId
    assert(t.rowTrackingEnabled, "restore must not drop the watermark")
    // the id read must work (carried-verbatim chunk refs would throw) …
    val ids = idsOf(t)
    assert(ids.size == 100 && ids.values.toSet.size == 100)
    // … and so must every subsequent rewrite op
    t.update(Map("amount" -> "-2.0"), "id = 7")
    val after = idsOf(t)
    assert(after(9L) == ids(9L), "untouched restored row lost its id")
  }

  test("merge fast-path output is independent of tracking state under duplicate target pks") {
    def run(track: Boolean): Seq[(Long, String, Double)] = {
      val t = GraftTable(spark, tmp())
      // raw appends CAN duplicate a pk — the merge shape must not let
      // tracking's id-carry join fan the landed row back out
      t.append(df3((1L, "a", 1.0), (2L, "b", 2.0)))
      t.append(df3((1L, "a2", 1.5)))
      if (track) t.enableRowTracking()
      t.merge(df3((1L, "A", 9.0), (3L, "c", 3.0)), Seq("id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
      t.snapshot.select("id", "name", "amount")
        .as[(Long, String, Double)].collect().toSeq.sorted
    }
    val untracked = run(track = false)
    val tracked = run(track = true)
    assert(tracked == untracked,
      s"tracking changed merge output: $tracked vs $untracked")
  }

  test("tracking works across the chunked-manifest threshold") {
    val t = GraftTable(spark, tmp())
    t.manifestChunkFiles = 8
    t.overwrite(
      (0L until 400L).map(i => (i, s"n$i", i.toDouble))
        .toDF("id", "name", "amount").repartition(20), Some("id"))
    t.enableRowTracking()
    assert(t.latestManifest.get.chunks.exists(_.nonEmpty),
      "fixture must actually be chunked")
    val ids = idsOf(t)
    assert(ids.size == 400 && ids.values.toSet.size == 400)
    t.update(Map("amount" -> "-1.0"), "id = 5")
    assert(idsOf(t) == ids, "chunked rewrite moved ids")
  }

  test("ids survive a schema-evolving merge and serve under time travel") {
    val t = GraftTable(spark, tmp())
    t.overwrite(df3((1L, "a", 1.0), (2L, "b", 2.0)), Some("id"))
    t.enableRowTracking()
    val vEnabled = t.latestVersion.get
    val before = idsOf(t)
    t.merge(
      Seq((2L, "B", 2.2, "new"), (3L, "c", 3.0, "new"))
        .toDF("id", "name", "amount", "extra"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(idsOf(t)(2L) == before(2L))
    // time travel re-serves the OLD assignment exactly
    val old = t.snapshotWithRowIdsAt(vEnabled)
      .select(col("id"), col(GraftTable.RowIdOut))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(old == before)
  }
}
