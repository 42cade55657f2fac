package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog/DDL surface (SURVEY S7/S10, ref COPY_MSQL_TO_SILVER.py:187-196):
  * the reference CREATEs a database + registers each silver Delta folder
  * as a metastore table so downstream SQL can query it. Here a
  * [[GraftTable]] snapshot is registered as a view over the *current
  * manifest's* files (a raw parquet-location table would also read dead
  * files from old versions — the manifest is the source of truth).
  */
object GraftCatalog {

  /** `CREATE DATABASE IF NOT EXISTS` passthrough (ref :187-189). */
  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** Register the table's current snapshot as `db`.`name` (ref :195-196).
    * The persistent view enumerates the current manifest's files, so it
    * pins exactly one committed version — re-register after each load to
    * advance readers (the reference re-runs CREATE TABLE the same way).
    * (At warehouse scale this would be a manifest-aware DataSourceV2
    * relation instead of SQL text; the catalog semantics are identical.)
    */
  def register(spark: SparkSession, db: String, name: String, table: GraftTable): Unit = {
    ensureDatabase(spark, db)
    val m = table.latestManifest.getOrElse(
      throw new IllegalStateException(s"register of uncommitted table ${table.root}"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(m.schema)
    // project the MANIFEST schema per file: after schema evolution older
    // files lack newer columns (a positional `SELECT *` union would
    // mismatch arities), so each branch selects the union schema with
    // NULL casts for columns that file does not have. Files written in
    // the same batch directory share a schema, so one footer probe per
    // batch suffices — registration is O(batches), not O(files).
    val batchCols: Map[String, Set[String]] =
      m.files.groupBy(f => f.path.take(math.max(0, f.path.lastIndexOf('/'))))
        .map { case (dir, fs) =>
          dir -> (try spark.read.parquet(s"${table.root}/${fs.head.path}").columns.toSet
                  catch { case _: Exception => schema.fieldNames.toSet })
        }
    def branch(path: String): String = {
      val fileCols = batchCols(path.take(math.max(0, path.lastIndexOf('/'))))
      val cols = schema.fields.map { f =>
        if (fileCols.contains(f.name)) s"`${f.name}`"
        else s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`"
      }.mkString(", ")
      s"SELECT $cols FROM parquet.`${table.root}/$path`"
    }
    val body =
      if (m.files.isEmpty) {
        val cols = schema.fields
          .map(f => s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`").mkString(", ")
        s"SELECT $cols WHERE 1 = 0"
      } else m.files.map(f => branch(f.path)).mkString(" UNION ALL ")
    spark.sql(s"CREATE OR REPLACE VIEW `$db`.`$name` AS $body")
  }

  /** ref :190 — the create-vs-merge decision probe. */
  def tableExists(spark: SparkSession, db: String, name: String): Boolean =
    spark.catalog.tableExists(s"`$db`.`$name`")

  /** S14 (ref :78-81): the declared-but-unused bronze path scheme —
    * Hive-style date partitioning `yyyy=/MM=/dd=` derived from a
    * timestamp column. Partition values prune at the directory level, so
    * a day-ranged query never lists the other days' files.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("yyyy", date_format(col(tsCol), "yyyy"))
      .withColumn("MM", date_format(col(tsCol), "MM"))
      .withColumn("dd", date_format(col(tsCol), "dd"))
      .write.mode("overwrite")
      .partitionBy("yyyy", "MM", "dd")
      .parquet(path)
}
