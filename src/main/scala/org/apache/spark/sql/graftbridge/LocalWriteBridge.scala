package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-side single-file parquet writer for TINY control-plane
  * batches (a watermark open/close is ONE row): Spark's write command
  * costs ~100-150 ms of fixed overhead per invocation (job + task +
  * commit protocol + staging renames) regardless of row count, and the
  * pipeline protocol pays it twice per load cycle. Writing the rows
  * through the SAME `ParquetWriteSupport` Spark's own parquet sink uses
  * — same schema metadata, same timestamp encoding, same rebase
  * handling, codec from the same session conf — produces a file
  * bit-compatible with what `df.coalesce(1).write.parquet` lands, with
  * zero jobs. NEVER used for data-plane writes: anything distributed or
  * non-trivially sized belongs in the write funnel.
  */
object LocalWriteBridge {

  private class RowWriterBuilder(
      path: org.apache.hadoop.fs.Path)
    extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Write `rows` (external Rows matching `schema`) as ONE parquet file
    * at `file`. The hadoop conf starts from the session's
    * (`newHadoopConf` carries every explicitly-set SQL conf); the keys
    * `ParquetWriteSupport.init` asserts on are then pinned from the
    * live SQLConf so defaults ride along too.
    */
  def writeRows(
      spark: SparkSession, file: java.nio.file.Path,
      schema: StructType, rows: Seq[Row]): Unit = {
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val codec = CompressionCodecName.fromConf(
      sqlConf.parquetCompressionCodec.toUpperCase(java.util.Locale.ROOT))
    val toInternal = CatalystTypeConverters.createToCatalystConverter(schema)
    val writer = new RowWriterBuilder(
      new org.apache.hadoop.fs.Path(file.toUri))
      .withConf(conf)
      .withCompressionCodec(codec)
      .build()
    try rows.foreach(r => writer.write(toInternal(r).asInstanceOf[InternalRow]))
    finally writer.close()
  }
}
