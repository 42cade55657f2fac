package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.StructType

/** Native streaming SOURCE: `spark.readStream.format("graft").load(root)`
  * (Delta `readStream` parity — the uniform format-string complement to
  * [[GraftTable.readChangeStream]], which serves the stored CDF instead).
  *
  * Semantics (Delta's streaming-source model):
  *  - **Initial snapshot**: the first micro-batch serves the table's
  *    full contents as of the latest version at stream start (DV-masked,
  *    logical column names) — then the stream tails subsequent commits.
  *    `option("startingVersion", <v>|<tag>|"latest")` skips the snapshot
  *    and tails from commit `v` on ("latest" = only commits after start).
  *  - **Tail**: each later micro-batch serves exactly the data files
  *    ADDED by the versions in `(lastOffset, latest]`, walked
  *    version-by-version so a file added then compacted away inside one
  *    batch window is still delivered once. Maintenance commits
  *    (compact / zorder / purge / column DDL / restore-to-same-data)
  *    rewrite or re-reference rows without changing them — their files
  *    are never re-served (Delta's dataChange=false).
  *  - **Changes**: a commit that rewrites or removes live rows (merge
  *    touching existing keys, DELETE/UPDATE, overwrite) breaks
  *    append-only delivery. Default: fail loudly. With
  *    `option("ignoreChanges", "true")` the rewritten files are served
  *    (their surviving rows may re-deliver — Delta's documented
  *    ignoreChanges contract). For row-accurate deltas use the stored
  *    change feed ([[GraftTable.readChangeStream]]).
  *
  * Offsets are table VERSIONS (durable, monotone), so checkpoint
  * restart resumes exactly: the recovered offset is the last version
  * whose batch committed downstream, and `getBatch(recovered, latest)`
  * re-derives the same file set from the immutable manifests.
  *
  * The per-batch read rides the same funnel as every other reader
  * ([[GraftTable.readMasked]]: explicit schema, DV masks, column-mapping
  * aliases), wrapped via [[PlanBridge.asStreaming]] the way the built-in
  * Kafka source wraps its batch plans.
  */
class GraftStreamSource(
    spark: SparkSession, root: String, parameters: Map[String, String])
  extends Source {

  private val table = GraftTable(spark, root)

  private def opt(key: String): Option[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private val ignoreChanges =
    opt("ignoreChanges").exists(_.equalsIgnoreCase("true"))

  /** CDF mode (`option("readChangeFeed", "true")`, Delta parity): rows
    * carry `_change_type` + `_commit_version`. The initial snapshot
    * serves as 'insert' rows; the tail serves each version's STORED
    * change feed when one exists, and derives 'insert' rows from the
    * added files for add-only commits without one (Delta's CDC-file /
    * add-file derivation split). A row-rewriting commit with no stored
    * feed is a gap the stream cannot fill — it fails loudly naming the
    * writer options that store the feed.
    */
  private val readChangeFeed =
    opt("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  /** Commits that rewrite/re-reference rows without changing table
    * contents — never served to the stream (Delta dataChange=false).
    */
  private val MaintenanceOps = Set(
    "compact", "zorder", "purge", "rename column", "drop column",
    "add column")

  private def latestRequired: Manifest = table.latestManifest.getOrElse(
    throw new IllegalStateException(
      s"graft streaming source requires a committed table at $root"))

  /** Stream-fixed logical TABLE schema, captured at stream start. */
  private val tableSchema: StructType = StructType.fromDDL(latestRequired.schema)

  /** The stream's output schema: the table schema, plus the CDF columns
    * in readChangeFeed mode.
    */
  override val schema: StructType =
    if (readChangeFeed) StructType(tableSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType)))
    else tableSchema

  /** startingVersion resolved at source creation: None = initial
    * snapshot; Some(v) = tail commits >= v ("latest" and tag names
    * resolve through the table's version refs). `startingTimestamp`
    * (Delta parity) resolves to the first commit AT-OR-AFTER the cut —
    * the tail starts there; a timestamp past every commit behaves like
    * "latest" (only new commits).
    */
  private val startingVersion: Option[Long] = opt("startingVersion").map {
    case s if s.equalsIgnoreCase("latest") => latestRequired.version + 1
    case s => table.resolveVersionRef(s)
  }.orElse(opt("startingTimestamp").map { ts =>
    val cut = GraftDataSource.parseTimestampCut(ts)
    table.history.reverseIterator // oldest → newest
      .find(h => h.committedAt.nonEmpty &&
        !java.time.Instant.parse(h.committedAt).isBefore(cut))
      .map(_.version)
      .getOrElse(latestRequired.version + 1)
  })

  private def verOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = table.latestVersion.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = verOf(end)
    def tailFrom(fromExclusive: Long): DataFrame =
      if (readChangeFeed) cdfTail(fromExclusive, endV)
      else tail(fromExclusive, endV)
    start match {
      case Some(s) => tailFrom(verOf(s))
      case None => startingVersion match {
        case Some(sv) => tailFrom(sv - 1)
        case None => snapshotBatch(endV)
      }
    }
  }

  private def empty: DataFrame = PlanBridge.asStreaming(spark,
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** Snapshot rows; in CDF mode they render as 'insert' at the snapshot
    * version (Delta's initial-snapshot CDF contract).
    */
  private def snapshotBatch(v: Long): DataFrame = {
    val m = table.manifest(v)
    val files = table.filesOf(m)
    if (files.isEmpty) empty
    else {
      val base = table.readMasked(files, tableSchema, m.mapping)
      PlanBridge.asStreaming(spark,
        if (readChangeFeed)
          base.withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(v))
        else base)
    }
  }

  /** CDF tail: stored change-feed rows for versions that published one;
    * derived 'insert' rows (from the added files) for add-only commits
    * without one; a loud gap error for row-rewriting commits without.
    */
  private def cdfTail(fromExclusive: Long, endV: Long): DataFrame = {
    val stored = table.changeFeedVersions.toSet
    val dataVersions = ((fromExclusive + 1) to endV).flatMap { v =>
      val m = table.manifest(v)
      val op = m.operation.getOrElse("write")
      if (MaintenanceOps.contains(op)) None else Some((v, m, op))
    }
    if (dataVersions.isEmpty) return empty
    val (haveStored, derive) = dataVersions.partition(t => stored.contains(t._1))
    val derived = derive.flatMap { case (v, m, op) =>
      val prevIds: Map[String, Option[String]] =
        if (v <= 1) Map.empty
        else table.filesOf(table.manifest(v - 1)).map(f => f.path -> f.dv).toMap
      val files = table.filesOf(m)
      val curIds = files.map(f => f.path -> f.dv).toMap
      if (prevIds.exists { case (p, dv) => !curIds.get(p).contains(dv) })
        throw new IllegalStateException(
          s"graft CDF stream at $root: version $v ($op) rewrote or removed " +
            "rows but published no change feed — the stream cannot derive " +
            "its deltas. Write with .withChangeFeed() / appendWithChangeFeed" +
            " / sink option changeFeed=true, or start past it with " +
            "option(\"startingVersion\", ...)")
      val added = files.filterNot(f => prevIds.get(f.path).contains(f.dv))
      if (added.isEmpty) None
      else Some(table.readMasked(added, tableSchema, m.mapping)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v)))
    }
    val storedDf =
      if (haveStored.isEmpty) Nil
      else Seq(table.changeFeed(haveStored.map(_._1).min)
        .filter(col("_commit_version") <= endV))
    val parts = (derived ++ storedDf).map(df =>
      df.select(schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*))
    if (parts.isEmpty) empty
    else PlanBridge.asStreaming(spark, parts.reduce(_.unionByName(_)))
  }

  /** Files added by data-changing versions in `(fromExclusive, endV]`,
    * each read under ITS version's column mapping (a rename between
    * batches must not misread the tail's physical names).
    */
  private def tail(fromExclusive: Long, endV: Long): DataFrame = {
    val perVersion = ((fromExclusive + 1) to endV).flatMap { v =>
      val m = table.manifest(v)
      val op = m.operation.getOrElse("write")
      if (MaintenanceOps.contains(op)) None
      else {
        val prevIds: Map[String, Option[String]] =
          if (v <= 1) Map.empty
          else table.filesOf(table.manifest(v - 1)).map(f => f.path -> f.dv).toMap
        val files = table.filesOf(m)
        val curIds = files.map(f => f.path -> f.dv).toMap
        // identity is (path, dv): a DV landing on an existing file
        // deletes rows from it — a data change, exactly like a rewrite
        val removedAny = prevIds.exists { case (p, dv) =>
          !curIds.get(p).contains(dv)
        }
        if (removedAny && !ignoreChanges) throw new IllegalStateException(
          s"graft streaming source at $root: version $v ($op) rewrote or " +
            "removed existing rows; the stream serves appends only. Either " +
            "restart with option(\"ignoreChanges\", \"true\") to receive " +
            "rewritten files (surviving rows may re-deliver), or consume " +
            "row-accurate changes via GraftTable.readChangeStream()")
        val added = files.filterNot(f => prevIds.get(f.path).contains(f.dv))
        if (added.isEmpty) None
        else {
          // stream schema is fixed at start: a mid-stream DROP/RENAME of
          // a column the stream serves cannot be represented — fail loud
          val vSchema = StructType.fromDDL(m.schema)
          val missing =
            tableSchema.fieldNames.filterNot(vSchema.fieldNames.contains)
          if (missing.nonEmpty) throw new IllegalStateException(
            s"graft streaming source at $root: version $v no longer has " +
              s"column(s) ${missing.mkString(", ")} the stream started " +
              "with; restart the stream to pick up the new schema")
          Some((added, m.mapping))
        }
      }
    }
    if (perVersion.isEmpty) empty
    else {
      // one read per distinct mapping epoch (one, in the common
      // rename-free case) — columns ADDED after stream start are simply
      // not selected (explicit stream schema), Delta-style
      val dfs = perVersion.groupBy(_._2).map { case (mapping, group) =>
        table.readMasked(group.flatMap(_._1), tableSchema, mapping)
      }.toSeq
      PlanBridge.asStreaming(spark, dfs.reduce(_.unionByName(_)))
    }
  }

  override def stop(): Unit = ()
}
