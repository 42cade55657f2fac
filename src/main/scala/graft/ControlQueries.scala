package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's orchestration query (EP1), shared by the control plane
  * (graft.pipeline.ConfigStore) and the oracle query battery.
  *
  * Mirrors /root/reference/COPY_MSQL_TO_SILVER.py:223-250: entities LEFT
  * JOIN the latest *closed* watermark per entity, watermark rendered as a
  * string (CT version cast / TMSTP style-120 format), defaulted to '0' /
  * '2000-01-01' when no closed watermark exists.
  *
  * Scale: the control tables are tiny (one row per entity / per load), so
  * both sides are broadcast-friendly; the window partitions by EntityId.
  */
object ControlQueries {
  val TsFmt = "yyyy-MM-dd HH:mm:ss"

  def entitiesWithWatermarks(entities: DataFrame, watermarks: DataFrame): DataFrame = {
    // ref :241: ROW_NUMBER() OVER (PARTITION BY EntityId ORDER BY LoadStartDatetime DESC)
    // WatermarkId added as a deterministic tie-break (identity column ⇒ later open = larger id).
    val w = Window.partitionBy("EntityId")
      .orderBy(col("LoadStartDatetime").desc, col("WatermarkId").desc)
    // ref :235-240: CASE WatermarkType WHEN 'TMSTP' THEN CONVERT(VARCHAR(21), DateWatermark, 120)
    //               WHEN 'CT' THEN CAST(CTWatermark AS VARCHAR(21)) END
    val wmType = entities.select("EntityId", "WatermarkType")
      .withColumnRenamed("WatermarkType", "__wt")
    val latest = watermarks
      .filter(col("LoadEndDatetime").isNotNull) // ref :245 — open loads don't count
      .join(broadcast(wmType), Seq("EntityId"))
      .withColumn("Watermark",
        when(col("__wt") === "TMSTP", date_format(col("DateWatermark"), TsFmt))
          .when(col("__wt") === "CT", col("CTWatermark").cast("string")))
      .withColumn("RN", row_number().over(w))
      .filter(col("RN") === 1) // ref :248
      .select("EntityId", "Watermark")
    // ref :231: COALESCE(wo.Watermark, CASE WHEN e.WatermarkType='CT' THEN '0' ELSE '2000-01-01' END)
    entities.join(broadcast(latest), Seq("EntityId"), "left")
      .withColumn("Watermark",
        coalesce(col("Watermark"),
          when(col("WatermarkType") === "CT", "0").otherwise("2000-01-01")))
  }
}
