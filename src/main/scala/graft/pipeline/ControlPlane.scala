package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ControlQueries
import graft.sources.GraftTable

/** A registered source→target table mapping with sync metadata —
  * mirrors dbo.Entities (/root/reference/dbrconfig.sql:20-31).
  */
case class Entity(
    entityId: Long,
    fromEntityName: String,
    toEntityName: String,
    fromZone: String,
    toZone: String,
    watermarkType: String, // 'CT' | 'TMSTP'
    timestampColumn: Option[String],
    primaryKeys: String) { // comma-separated, as in the reference
  def pkCols: Seq[String] = primaryKeys.split(",").map(_.trim).toSeq
  /** ref COPY_MSQL_TO_SILVER.py:115-117 — '<db>.<table>' path derivation. */
  def dbAndTable: (String, String) = toEntityName.split("\\.") match {
    case Array(db, tbl) => (db, tbl)
    case _ => ("default", toEntityName)
  }
}

/** One load's progress record — mirrors dbo.Watermarks
  * (/root/reference/dbrconfig.sql:33-43). A row with loadEndDatetime=None
  * is an *open* (uncommitted) load and is ignored by the orchestration
  * query; the open→extract→write→close protocol plus idempotent merge
  * gives effectively-once loads (SURVEY §2.9).
  */
case class WatermarkRecord(
    watermarkId: Long,
    entityId: Long,
    dateWatermark: Option[Timestamp],
    ctWatermark: Option[Long],
    loadStartDatetime: Timestamp,
    loadEndDatetime: Option[Timestamp])

/** Parquet-backed control plane: the Entities + Watermarks tables and the
  * OpenWatermark / CloseWatermark procedures
  * (/root/reference/dbrconfig.sql:45-83, 85-91), re-expressed on
  * [[GraftTable]] so control state gets the same atomic-commit guarantees
  * as data. Control tables are tiny; every read broadcasts.
  */
class ConfigStore(spark: SparkSession, root: String) {
  import spark.implicits._

  val entitiesTable = GraftTable(spark, s"$root/entities")
  val watermarksTable = GraftTable(spark, s"$root/watermarks")

  def registerEntities(es: Seq[Entity]): Unit = {
    val df = es.toDF(
      "EntityId", "FromEntityName", "ToEntityName", "FromZone", "ToZone",
      "WatermarkType", "TimestampColumn", "PrimaryKeys").coalesce(1)
    if (entitiesTable.exists) entitiesTable.append(df) else entitiesTable.overwrite(df)
  }

  def entities: Seq[Entity] =
    entitiesTable.snapshot
      .select("EntityId", "FromEntityName", "ToEntityName", "FromZone", "ToZone",
        "WatermarkType", "TimestampColumn", "PrimaryKeys")
      .collect()
      .map(r => Entity(r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), Option(r.getString(6)), r.getString(7)))
      .toSeq

  /** dbo.OpenWatermark (dbrconfig.sql:45-83): allocate the next id and
    * record the *new* watermark value with an open (NULL end) load window.
    * Returns the allocated WatermarkId (the proc's SCOPE_IDENTITY()).
    *
    * Id allocation (max+1) is serialized in-process only — like the
    * reference, the deployment model is ONE orchestrator process per
    * control plane (its SQL Server identity column provided cross-process
    * uniqueness). Multiple orchestrator processes sharing a control plane
    * would need an external id source or per-entity control roots.
    */
  def openWatermark(entityId: Long, watermarkType: String, watermark: String): Long = synchronized {
    val now = new Timestamp(System.currentTimeMillis())
    val id = 1L + (if (watermarksTable.exists)
      watermarksTable.snapshot.agg(max("WatermarkId")).head().getLong(0)
    else 0L)
    val rec =
      if (watermarkType == "CT")
        WatermarkRecord(id, entityId, None, Some(watermark.toLong), now, None)
      else
        WatermarkRecord(id, entityId, Some(Timestamp.valueOf(watermark + (if (watermark.length <= 10) " 00:00:00" else ""))), None, now, None)
    // control tables are tiny — single-file writes keep manifests and
    // the per-load job count small
    val df = Seq(rec).toDF(
      "WatermarkId", "EntityId", "DateWatermark", "CTWatermark",
      "LoadStartDatetime", "LoadEndDatetime").coalesce(1)
    if (watermarksTable.exists) watermarksTable.append(df)
    else watermarksTable.overwrite(df)
    id
  }

  /** dbo.CloseWatermark (dbrconfig.sql:85-91): stamp LoadEndDatetime —
    * implemented as a merge on the watermark id (dogfooding the engine's
    * own upsert).
    */
  def closeWatermark(watermarkId: Long): Unit = synchronized {
    // read-modify-overwrite of the (tiny) control table; the versioned
    // commit keeps concurrent readers on the prior manifest. (The data
    // path uses the real merge — see SilverLoader.)
    val updated = watermarksTable.snapshot
      .withColumn("LoadEndDatetime",
        when(col("WatermarkId") === watermarkId, current_timestamp().cast("timestamp"))
          .otherwise(col("LoadEndDatetime")))
      .coalesce(1)
    watermarksTable.overwrite(updated)
  }

  /** Watermarks as a DataFrame; empty (typed) before the first load. */
  def watermarksDf: DataFrame =
    if (watermarksTable.exists) watermarksTable.snapshot
    else Seq.empty[WatermarkRecord].toDF(
      "WatermarkId", "EntityId", "DateWatermark", "CTWatermark",
      "LoadStartDatetime", "LoadEndDatetime")

  /** EP1 (ref COPY_MSQL_TO_SILVER.py:223-250): entities with their latest
    * closed watermark, string-rendered and defaulted.
    */
  def entitiesWithWatermarks(): DataFrame =
    ControlQueries.entitiesWithWatermarks(entitiesTable.snapshot, watermarksDf)
}
