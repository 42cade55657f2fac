package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GraftTable, ManifestFile, StatsPruning}

/** MERGE INTO for [[GraftTable]] — the engine's flagship operator,
  * reproducing the reference's upsert
  * (/root/reference/COPY_MSQL_TO_SILVER.py:200-209:
  * `merge(source, pkCond).whenMatchedUpdateAll().whenNotMatchedInsertAll()`)
  * plus the op-aware delete mode the reference lacks (SURVEY §2.9: CT
  * deletes arrive as 'D' rows and the reference upserts them as nulls;
  * `whenMatchedDelete` is the corrected semantics).
  *
  * Execution shape (designed for 100 TB):
  *  1. **File pruning** — only target files whose stats-column [min,max]
  *     intersects the source batch's key range are read and rewritten;
  *     everything else is carried into the new version untouched. An
  *     incremental batch touching 0.1% of the key space rewrites ~0.1%
  *     of the files, not the table.
  *  2. **Single shuffle** — both sides are struct-packed and full-outer
  *     joined on the primary key once; matched/unmatched routing is pure
  *     column logic on top (codegen-friendly, AQE/skew-join eligible) —
  *     no second anti-join pass over the target.
  *  3. **Schema evolution** — output schema is target ∪ source
  *     (SURVEY §1.3); columns missing on either side are null-backfilled.
  *  4. **Atomic swap** — new files + surviving files become version N+1
  *     via the manifest commit; readers of version N are never disturbed.
  */
object MergeBuilder {
  /** Source batches up to this many rows take the broadcast-anti fast
    * path (only the distinct keys are broadcast — ~8-50 B/row).
    */
  val BroadcastSourceRows: Long = 4000000L

  /** Bloom-refinement caps: batches with more distinct keys than
    * `BloomProbeKeys`, or whose keys × bloom-carrying candidate files
    * exceed `BloomProbeBudget` driver probes, skip the refinement and
    * keep the (sound) range verdict.
    */
  val BloomProbeKeys: Long = 10000L
  val BloomProbeBudget: Long = 50000000L

  /** Delta-parity multiple-match error (raised mid-scan via raise_error,
    * so neither path needs an extra pre-pass over the source).
    */
  val MultiMatchError: String =
    "MERGE multiple-match: a target row matched more than one source row " +
      "on the primary key; de-duplicate the source batch (e.g. latest-per-key)"
}

class MergeBuilder(
    table: GraftTable,
    source: DataFrame,
    pkCols: Seq[String]) {

  private var updateAll = false
  private var insertAll = false
  private var deleteCond: Option[Column] = None
  private var changeFeed = false
  private var txnId: Option[String] = None
  private var txnApp: Option[String] = None

  /** Idempotent-writer marker (Delta txn parity): records
    * "appId:version" in the commit so an at-least-once replay can check
    * `table.lastTxn(appId)` and skip a batch that already landed —
    * including its change-feed publication, which would otherwise
    * double-deliver to downstream consumers. The appId also keys the
    * table's txn index, making the replay lookup O(1) instead of a
    * manifest-history scan.
    */
  def withTxn(appId: String, version: Long): MergeBuilder = {
    txnId = Some(s"$appId:$version"); txnApp = Some(appId); this
  }

  /** Marker + writer identity for writers whose batch identity is a
    * value (a watermark range) rather than a counter — checked back
    * with `GraftTable.txnVersion(appId, marker)` through the indexed
    * fast path.
    */
  def withTxnMarker(appId: String, marker: String): MergeBuilder = {
    txnId = Some(marker); txnApp = Some(appId); this
  }

  /** Legacy raw-marker form (no appId → no index entry; replay checks
    * fall back to the full-history scan and forget markers past the
    * vacuum horizon). Prefer the two-argument form.
    */
  def withTxnMarker(marker: String): MergeBuilder = {
    txnId = Some(marker); this
  }

  /** Store this merge's row-level changes under `_changes/v<version>/`
    * (Delta CDF parity). The diff runs over the merge's OWN touched/new
    * files — O(batch), never O(table) — and feeds
    * [[GraftTable.changeFeed]] / [[GraftTable.readChangeStream]].
    */
  def withChangeFeed(): MergeBuilder = { changeFeed = true; this }

  /** ref :208 — overwrite all columns of matched rows with source values. */
  def whenMatchedUpdateAll(): MergeBuilder = { updateAll = true; this }

  /** ref :209 — insert source rows with no target match. */
  def whenNotMatchedInsertAll(): MergeBuilder = { insertAll = true; this }

  /** Corrected CDC mode: matched source rows satisfying `condSql`
    * (evaluated against source columns, e.g. "SyncOperation = 'D'") are
    * deleted from the target; such rows are never inserted either.
    */
  def whenMatchedDelete(condSql: String): MergeBuilder =
    whenMatchedDelete(expr(condSql))

  /** Column form of [[whenMatchedDelete]] — the SQL MERGE INTO path
    * arrives here with an already-parsed condition.
    */
  def whenMatchedDelete(cond: Column): MergeBuilder = {
    deleteCond = Some(cond); this
  }

  /** Run the merge; returns the newly committed version. */
  def execute(): Long = {
    val spark = table.spark
    val m = table.latestManifest.getOrElse(
      throw new IllegalStateException(s"merge into uncommitted table ${table.root}"))
    val targetSchema = StructType.fromDDL(m.schema)
    val sourceSchema = source.schema
    val unified = GraftTable.unionSchema(targetSchema, sourceSchema)
    val statsCol = pkCols.head
    // partitioned tables: merge output keeps the partition clustering and
    // partition-column stats, so the layout survives incremental loads.
    // (Partition columns prune the merge itself only when part of the pk
    // — a pk that can move across partitions makes pruning on them
    // unsound, so it is never done implicitly.)
    val partCols = m.partitionCols.getOrElse(Nil)
    // pk first: the head is the "primary" legacy stats column and should
    // stay a footer-friendly type (partition cols are often dates)
    val statsCols = (pkCols ++ partCols).distinct
    def arranged(result: DataFrame): DataFrame =
      if (partCols.nonEmpty) table.clusterBy(result, partCols) else result
    // physical naming for this merge's output files (identity unless the
    // table has renamed/dropped columns) — shared by the write funnel
    // calls and the change-feed diff's read-back
    val writeMapping = GraftTable.derivedMapping(unified.fieldNames.toSeq, Some(m))

    // ---- 1. file pruning on the pk ranges of the source batch ----
    // one probe pass computes min/max for EVERY pk column plus the batch
    // size (for join-strategy selection); a file survives pruning only if
    // its range overlaps the batch on every key column with stats —
    // composite keys prune multiplicatively.
    val aggs = pkCols.flatMap(c =>
      Seq(min(col(c)).cast("string"), max(col(c)).cast("string"))) :+ count(lit(1))
    val bounds = source.agg(aggs.head, aggs.tail: _*).head()
    val srcRanges: Map[String, (Option[String], Option[String])] =
      pkCols.zipWithIndex.map { case (c, i) =>
        c -> (Option(bounds.getString(2 * i)), Option(bounds.getString(2 * i + 1)))
      }.toMap
    val srcRows = bounds.getLong(2 * pkCols.length)
    val (srcLo, srcHi) = srcRanges(statsCol)
    def colType(c: String) = targetSchema.fields.find(_.name == c).map(_.dataType)
    // file stats are keyed by PHYSICAL column names; pk columns are
    // logical — translate before comparing (identity map on tables that
    // never renamed)
    val p2l = m.logicalByPhysical
    def overlaps(f: ManifestFile): Boolean = {
      val fr = StatsPruning.fileRanges(f)
        .map { case (c, r) => p2l.getOrElse(c, c) -> r }
        .view.filterKeys(pkCols.contains).toMap
      if (fr.isEmpty) true // no stats → must assume the file matches
      else fr.forall { case (c, (fLo, fHi)) =>
        srcRanges(c) match {
          case (Some(lo), Some(hi)) =>
            StatsPruning.rangesOverlap(colType(c), fLo, fHi, lo, hi)
          case _ => false // empty source batch touches nothing
        }
      }
    }
    // full file resolution (chunked manifests included) — this read also
    // warms the table's chunk cache, so the commit-time swap re-checks
    // chunk membership without re-reading any chunk JSON
    val (rangeTouched, _) = table.filesOf(m).partition(overlaps)
    // Bloom refinement for point batches on NON-clustered keys: when the
    // table's key layout is scattered (uuid-ish CDC keys, interleaved
    // appends), every file's range overlaps every batch and `overlaps`
    // prunes nothing — per-file blooms then drop the files that cannot
    // hold ANY batch key. Bounded on both sides: the distinct-key
    // collect caps at BloomProbeKeys, and the driver probe work caps at
    // BloomProbeBudget; past either cap the range verdict stands
    // (sound — blooms only ever sharpen). False positives only KEEP a
    // file, so correctness never depends on the bloom.
    val touched = {
      val withBlooms = rangeTouched.count(_.bloom.isDefined)
      if (withBlooms == 0 || srcRows <= 0 ||
          srcRows > MergeBuilder.BloomProbeKeys ||
          srcRows * withBlooms > MergeBuilder.BloomProbeBudget) rangeTouched
      else {
        val keyRows = source.select(pkCols.map(col).toIndexedSeq: _*)
          .distinct().limit(MergeBuilder.BloomProbeKeys.toInt + 1).collect()
        if (keyRows.length > MergeBuilder.BloomProbeKeys) rangeTouched
        else {
          // bloom sidecars key by PHYSICAL name too
          val hashesByCol: Map[String, Seq[Long]] = pkCols.zipWithIndex.map {
            case (c, i) =>
              val dt = targetSchema(c).dataType
              m.physicalOf(c) -> keyRows.toSeq.map(_.get(i)).filter(_ != null)
                .map(v => graft.sources.BloomSkipping.hashOf(v, dt)).distinct
          }.toMap
          rangeTouched.filter(f =>
            graft.sources.BloomSkipping.fileMayMatch(table.root, f, hashesByCol))
        }
      }
    }

    // ---- 2. struct-packed single full-outer join over touched files ----
    // DV-masked read: a touched file's deletion vector must hide its
    // masked rows from the join, or a merge would resurrect them; the
    // rewrite below then lands the file WITHOUT a DV — merge naturally
    // materializes masks away, exactly like compaction
    val target =
      if (touched.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], targetSchema)
      else table.readMasked(touched, targetSchema, m.mapping)

    // NULL delete-conditions must read as "not deleted" on every path:
    // without the coalesce the fast path's filter(!delCol) drops the row
    // (NULL is not true) while still anti-joining away its target match —
    // i.e. a NULL turns into a delete only when the batch is small.
    val delCol = deleteCond
      .map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))

    // ---- fast path: the reference's universal mode (updateAll+insertAll)
    // reduces to `target ANTI source.keys ∪ source\deletes` — and an anti
    // join CAN broadcast a small incremental batch, where the general
    // full-outer join always shuffles both sides. A 1k-row CDC batch
    // against a 100 TB table then touches only the pruned files, with no
    // shuffle of the target at all.
    if (updateAll && insertAll && srcRows <= MergeBuilder.BroadcastSourceRows) {
      // Per-key source counts ride the same broadcast that drives the
      // anti-join semantics: a matched key seen >1 times in the source
      // raises Delta's multiple-match error mid-scan, while unmatched
      // duplicates insert (also Delta parity). NULL keys never match, so
      // they can never trip the guard.
      val keyCounts = broadcast(
        source.groupBy(pkCols.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("__srcn")))
      val kept = target.join(keyCounts, pkCols, "left")
        .filter(
          when(col("__srcn") > 1,
            raise_error(lit(MergeBuilder.MultiMatchError)).cast("boolean"))
            .otherwise(col("__srcn").isNull))
        .drop("__srcn")
      val landed = source.filter(!delCol)
      val result = kept.unionByName(landed, allowMissingColumns = true)
        .select(unified.fieldNames.map(col).toIndexedSeq: _*)
      val newFiles = table.writeDataFiles(arranged(result), statsCols, writeMapping,
        conformTo = Some(unified))
      val staged = stageChanges(target, newFiles, unified, writeMapping)
      val v = table.swap(
        touched.map(_.path).toSet, newFiles, unified, m.version, overlaps, txnId, txnApp)
      staged.foreach(table.publishChangeFeed(v, _))
      return v
    }

    val t = target.select(
      pkCols.map(col) :+ struct(targetSchema.fieldNames.map(col).toIndexedSeq: _*).as("__t"): _*)
    // per-key source multiplicity for the multiple-match guard; the window
    // hash-partitions on the pk, which the full-outer join needs anyway,
    // so no extra exchange is introduced
    val srcW = org.apache.spark.sql.expressions.Window
      .partitionBy(pkCols.map(col).toIndexedSeq: _*)
    val s = source
      .withColumn("__del", delCol)
      .withColumn("__srcn", count(lit(1)).over(srcW))
      .withColumn("__srn", row_number().over(srcW.orderBy(lit(1))))
      .select(pkCols.map(col) :+
        struct((sourceSchema.fieldNames.map(col) :+ col("__del") :+
          col("__srcn") :+ col("__srn")).toIndexedSeq: _*).as("__s"): _*)

    val j = t.join(s, pkCols, "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val tOnly = col("__s").isNull
    val sOnly = col("__t").isNull
    val isDel = coalesce(col("__s").getField("__del"), lit(false))

    // matched rows always survive (updated or kept) unless delete-marked;
    // source-only rows land only in insert mode and never when delete-marked.
    // Multiple source rows for one matched target: with a matched clause
    // (update/delete) the outcome is ambiguous — Delta raises a multiple-
    // match error and so do we (mid-scan, no extra pass). WITHOUT a
    // matched clause (insert-only merge) Delta does no such check; the
    // target row must then come through exactly once, so only the first
    // joined duplicate keeps it (all render identical target fields).
    val hasMatchedClause = updateAll || deleteCond.isDefined
    val matchedKeep =
      if (hasMatchedClause) matched && !isDel
      else matched && col("__s").getField("__srn") === 1
    val keepBase =
      tOnly || matchedKeep || (sOnly && lit(insertAll) && !isDel)
    val keep =
      if (hasMatchedClause)
        when(matched && col("__s").getField("__srcn") > 1,
          raise_error(lit(MergeBuilder.MultiMatchError)).cast("boolean"))
          .otherwise(keepBase)
      else keepBase

    def fieldOf(sideStruct: String, schema: StructType, f: StructField): Column =
      if (schema.fieldNames.contains(f.name)) col(sideStruct).getField(f.name)
      else lit(null).cast(f.dataType)

    val outCols = unified.fields.map { f =>
      if (pkCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else {
        val fromT = fieldOf("__t", targetSchema, f)
        val fromS = fieldOf("__s", sourceSchema, f)
        when(tOnly, fromT)
          .when(matched, if (updateAll) fromS else fromT)
          .otherwise(fromS) // sOnly insert
          .as(f.name)
      }
    }
    val result = j.filter(keep).select(outCols.toIndexedSeq: _*)

    // ---- 3. write new files, 4. atomic swap ----
    val newFiles = table.writeDataFiles(arranged(result), statsCols, writeMapping,
      conformTo = Some(unified))
    val staged = stageChanges(target, newFiles, unified, writeMapping)
    val v = table.swap(
      touched.map(_.path).toSet, newFiles, unified, m.version, overlaps, txnId, txnApp)
    staged.foreach(table.publishChangeFeed(v, _))
    v
  }

  /** Diff the touched-file pre-image against the merge's new files and
    * STAGE it as change data (published post-commit by an atomic
    * rename). The inputs are the ones this merge already isolated, so
    * CDF costs one extra pass over the batch's files only (untouched
    * files cannot contain changed rows); staging runs BEFORE the commit,
    * so a diff failure fails the merge cleanly and the pre-image files
    * are still manifest-referenced — no vacuum race, no committed-but-
    * threw ambiguity.
    */
  private def stageChanges(
      beforeTouched: DataFrame, newFiles: Seq[ManifestFile],
      unified: StructType,
      mapping: Map[String, String]): Option[java.nio.file.Path] = {
    if (!changeFeed) return None
    // same reserved-name guard the append path applies: a source column
    // named _change_type would collide with the diff's own classifier
    // (duplicate-column write failure at best, mislabeled CDF at worst)
    GraftTable.requireNoReservedCdfCols(unified.fieldNames.toSeq)
    val spark = table.spark
    // the new files are PHYSICAL-named (write funnel applies the column
    // mapping) — read them under the physical schema and alias back to
    // the unified logical names the diff speaks
    val physical =
      if (mapping.isEmpty) unified
      else StructType(unified.fields.map(f =>
        f.copy(name = mapping.getOrElse(f.name, f.name))))
    val after =
      if (newFiles.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], unified)
      else {
        val raw = spark.read.schema(physical)
          .parquet(newFiles.map(f => s"${table.root}/${f.path}"): _*)
        if (mapping.isEmpty) raw
        else raw.select(unified.fields.map(f =>
          col(s"`${mapping.getOrElse(f.name, f.name)}`").as(f.name)).toIndexedSeq: _*)
      }
    Some(table.stageChangeFeed(table.diffFrames(beforeTouched, after, pkCols)))
  }
}
