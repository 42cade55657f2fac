package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three extraction shapes of the reference
  * (/root/reference/COPY_MSQL_TO_SILVER.py:159-176), as native Spark
  * plans over parquet sources instead of SQL text pushed to SQL Server.
  *
  * Change feeds are modeled as a side table `<entity>_changes` with the
  * entity's pk columns + SYS_CHANGE_VERSION (monotonic long) +
  * SYS_CHANGE_OPERATION ('I'|'U'|'D') — the same shape SQL Server
  * CHANGETABLE returns (ref :171) and Debezium/Delta-CDF feeds share.
  *
  * Scale: all three shapes are single-pass scans with pushed-down
  * predicates; the CT join broadcasts the (small, incremental) change set
  * against the snapshot, or shuffles on pk when the batch is large — left
  * to Catalyst/AQE.
  */
object Extractor {
  val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Default watermarks meaning "never loaded" (ref :231). */
  val CtDefault = "0"
  val TmstpDefault = "2000-01-01"

  /** S2 (ref :159-160): full scan + audit columns. */
  def fullExtract(source: DataFrame): DataFrame =
    source.select(col("*"),
      current_timestamp().as("SyncDateTime"),
      lit("I").as("SyncOperation"))

  /** The reference's watermark predicate is a *string* comparison on the
    * style-120 rendering — opaque to parquet pushdown. This helper pairs
    * it with a redundant, strictly-weaker native timestamp bound
    * (fmt(ts) > wm ⟹ ts > wm, since fmt truncates downward), which DOES
    * push to the scan — at 100 TB that is the difference between pruning
    * row groups at the source and reading everything to filter in the
    * engine. Exact string semantics still decide row membership.
    */
  def wmPredicate(source: DataFrame, tsCol: String, oldWatermark: String): org.apache.spark.sql.Column = {
    val wm = normalizeWm(oldWatermark)
    val tsType = source.schema(tsCol).dataType.typeName
    (col(tsCol) > lit(wm).cast(tsType)) &&
      (date_format(col(tsCol), TsFmt) > lit(wm))
  }

  /** S4 (ref :175-176): timestamp-incremental scan. Deliberately keeps
    * the reference's second-truncated *string* comparison (SURVEY §4:
    * rows inside the watermark second are skipped — documented fidelity),
    * plus the pushable bound from [[wmPredicate]].
    */
  def tmstpExtract(source: DataFrame, tsCol: String, oldWatermark: String): DataFrame =
    source
      .filter(wmPredicate(source, tsCol, oldWatermark))
      .select(col("*"),
        current_timestamp().as("SyncDateTime"),
        lit("I").as("SyncOperation"))

  /** S3 (ref :162-174): CDC scan — changed keys newer than the watermark
    * LEFT JOINed to the current snapshot; deletes miss the join and come
    * back with NULL payload (the reference's shape).
    */
  def ctExtract(
      changes: DataFrame, snapshot: DataFrame,
      pkCols: Seq[String], oldVersion: Long): DataFrame = {
    // SQL Server's CHANGETABLE(CHANGES ...) returns NET changes — one row
    // per key. A raw change log may hold several versions per key in the
    // window; reduce to the latest so the merge source has unique pks.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pkCols.map(col): _*)
      .orderBy(col("SYS_CHANGE_VERSION").desc)
    val newChanges = changes
      .filter(col("SYS_CHANGE_VERSION") > oldVersion)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((pkCols.map(c => col(c)) :+ col("SYS_CHANGE_OPERATION")).toIndexedSeq: _*)
    val payload = snapshot.columns.filterNot(pkCols.contains)
    newChanges.join(snapshot, pkCols, "left")
      .select((pkCols.map(col) ++ payload.map(col) :+
        current_timestamp().as("SyncDateTime") :+
        col("SYS_CHANGE_OPERATION").as("SyncOperation")).toIndexedSeq: _*)
  }

  /** S5/A1 (ref :128-134), TMSTP probe: MAX style-120 string past the old
    * watermark; None when no new rows (the reference's str(None) hazard,
    * null-checked here as SURVEY §4 prescribes).
    */
  def probeTmstpWatermark(
      source: DataFrame, tsCol: String, oldWatermark: String): Option[String] =
    Option(source
      .filter(wmPredicate(source, tsCol, oldWatermark))
      .agg(max(date_format(col(tsCol), TsFmt)))
      .head().getString(0))

  /** S5/F6 (ref :129): CT probe — the engine's CHANGE_TRACKING_CURRENT_VERSION()
    * is the max version present in the change feed (0 for an empty feed).
    */
  def probeCtWatermark(changes: DataFrame): Long = {
    val v = changes.agg(max("SYS_CHANGE_VERSION")).head()
    if (v.isNullAt(0)) 0L else v.getLong(0)
  }

  /** Date-only watermarks ('2000-01-01') compare against 19-char style-120
    * strings; pad to second precision like CONVERT style 120 would.
    */
  private def normalizeWm(wm: String): String =
    if (wm.length <= 10) wm + " 00:00:00" else wm.take(19)
}
