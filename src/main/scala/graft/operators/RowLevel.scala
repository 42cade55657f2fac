package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StructType

import graft.sources.{GraftTable, Manifest, ManifestFile, StatsPruning}

/** Row-level DELETE / UPDATE for [[GraftTable]] — the Delta-parity
  * copy-on-write the reference's tables get for free from Delta
  * (`DELETE FROM` / `UPDATE` on the silver tables behind
  * /root/reference/COPY_MSQL_TO_SILVER.py:195-196; the notebook itself
  * reaches row deletion only through MERGE's nulled-upsert quirk, so
  * these are the *general* statements a user of that stack also has).
  *
  * Execution shape (designed for 100 TB):
  *  1. **Stats pruning** — the condition's conjunctive bounds are tested
  *     against per-file manifest min/max (same [[StatsPruning]] algebra
  *     the scan and MERGE use), so only candidate files are read at all.
  *  2. **Exact touched-file resolution** — one column-pruned pass over
  *     the candidates finds the files that actually HOLD matching rows
  *     (`_metadata.file_path`); a candidate whose rows all miss the
  *     condition is carried into the new version untouched instead of
  *     being byte-identically rewritten. A narrow predicate on a huge
  *     table rewrites only the files with matches.
  *  3. **Copy-on-write rewrite** — touched files are re-written without
  *     the deleted rows (or with assignments applied); everything else
  *     rides by reference through the chunk-local [[GraftTable.swap]].
  *     Readers of the base version are never disturbed; concurrent
  *     disjoint writers rebase exactly like MERGE.
  *  4. **Change feed** — with `changeFeed = true` the op stages its row
  *     changes pre-commit (delete rows / update post-images) and
  *     publishes them under the landed version — O(touched), never
  *     O(table).
  *
  * SQL semantics: a NULL condition never matches (rows with a NULL
  * verdict are kept by DELETE and left unchanged by UPDATE); an op whose
  * condition matches no rows is a no-op returning the current version —
  * no empty commit.
  *
  * Both entry forms land in the same rewrite: the string API (Scala
  * users) parses its SQL fragments once up front; the Expression API
  * (the `DELETE FROM` / `UPDATE` statement path in
  * [[graft.sources.GraftDmlRule]]) passes the parser's trees through.
  */
object RowLevel {

  private[graft] def delete(
      table: GraftTable, condSql: String, changeFeed: Boolean,
      txn: Option[String], txnApp: Option[String]): Long =
    deleteExpr(table, parse(table, condSql), changeFeed, txn, txnApp)

  private[graft] def update(
      table: GraftTable, set: Map[String, String], condSql: String,
      changeFeed: Boolean, txn: Option[String], txnApp: Option[String]): Long =
    updateExpr(table, set.toSeq.map { case (c, e) => c -> parse(table, e) },
      parse(table, condSql), changeFeed, txn, txnApp)

  private[graft] def deleteExpr(
      table: GraftTable, cond: Expression, changeFeed: Boolean,
      txn: Option[String], txnApp: Option[String]): Long =
    rewrite(table, cond, "delete", Nil, changeFeed, txn, txnApp)

  private[graft] def updateExpr(
      table: GraftTable, set: Seq[(String, Expression)], cond: Expression,
      changeFeed: Boolean, txn: Option[String], txnApp: Option[String]): Long = {
    require(set.nonEmpty, "UPDATE needs at least one SET assignment")
    rewrite(table, cond, "update", set, changeFeed, txn, txnApp)
  }

  private def parse(table: GraftTable, sql: String): Expression =
    table.spark.sessionState.sqlParser.parseExpression(sql)

  private def rewrite(
      table: GraftTable, condExpr: Expression, op: String,
      assign: Seq[(String, Expression)], changeFeed: Boolean,
      txn: Option[String], txnApp: Option[String]): Long = {
    val spark = table.spark
    val m = table.latestManifest.getOrElse(throw new IllegalStateException(
      s"$op on uncommitted table ${table.root}"))
    val schema = StructType.fromDDL(m.schema)
    if (changeFeed) GraftTable.requireNoReservedCdfCols(schema.fieldNames.toSeq)
    assign.foreach { case (c, _) => require(
      schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"UPDATE SET references unknown column $c") }
    val cond = coalesce(ColumnBridge.toColumn(condExpr), lit(false))

    // ---- 1. stats pruning on the condition's conjunctive bounds ----
    val bounds =
      StatsPruning.queryBounds(pruningPredicates(condExpr, schema), schema)
    def mayMatch(f: ManifestFile): Boolean =
      StatsPruning.fileMayMatch(schema, StatsPruning.fileRanges(f), bounds)
    val candidates = table.filesOf(m).filter(mayMatch)
    if (candidates.isEmpty) return m.version

    def read(files: Seq[ManifestFile]): DataFrame =
      spark.read.schema(schema)
        .parquet(files.map(f => s"${table.root}/${f.path}"): _*)

    // ---- 2. exact touched files: which candidates hold matching rows ----
    // driver list bounded by the candidate file count — the same order
    // as the manifest listing itself, never the row count
    val matchedPaths = read(candidates).filter(cond)
      .select(col("_metadata.file_path")).distinct().collect()
      .map(r => table.relPath(r.getString(0))).toSet
    if (matchedPaths.isEmpty) return m.version
    val touched = candidates.filter(f => matchedPaths.contains(f.path))

    // ---- 3. copy-on-write rewrite of the touched files ----
    val before = read(touched)
    def applied(src: DataFrame): Seq[Column] = schema.fields.toSeq.map { f =>
      assign.find(_._1.equalsIgnoreCase(f.name)) match {
        case Some((_, e)) =>
          when(cond, ColumnBridge.toColumn(e).cast(f.dataType))
            .otherwise(src(f.name)).as(f.name)
        case None => src(f.name)
      }
    }
    val after = op match {
      case "delete" => before.filter(!cond)
      case _ => before.select(applied(before): _*)
    }
    val partCols = m.partitionCols.getOrElse(Nil)
    val arranged =
      if (partCols.nonEmpty) table.clusterBy(after, partCols) else after
    val newFiles = table.writeDataFiles(arranged, statsColsOf(table, m))

    // ---- 4. stage change rows pre-commit, publish post-commit ----
    val staged = if (!changeFeed) None else Some(table.stageChangeFeed(op match {
      case "delete" =>
        before.filter(cond).withColumn("_change_type", lit("delete"))
      case _ =>
        // post-images of rows the assignments actually CHANGED — a row
        // matching the condition whose values are already the assigned
        // ones is not a change and must not double-deliver downstream
        val preImage = struct(schema.fieldNames.map(col).toIndexedSeq: _*)
        before
          .withColumn("__post", struct(applied(before).toIndexedSeq: _*))
          .filter(cond && !(preImage <=> col("__post")))
          .select(schema.fieldNames.map(n =>
            col("__post").getField(n).as(n)).toIndexedSeq :+
            lit("update_postimage").as("_change_type"): _*)
    }))

    val v = table.swap(touched.map(_.path).toSet, newFiles, schema, m.version,
      mayConflict = mayMatch, txn = txn, txnApp = txnApp, op = op)
    staged.foreach(table.publishChangeFeed(v, _))
    v
  }

  /** Stats columns to carry through the rewrite: the table's existing
    * per-file stats layout (legacy primary first, then the ranged
    * columns, then partition columns) — a DELETE must not silently strip
    * the min/max that keep the NEXT merge's pruning alive.
    */
  private def statsColsOf(table: GraftTable, m: Manifest): Seq[String] = {
    val fs = table.filesOf(m)
    val primary = fs.flatMap(_.statsCol).headOption.toSeq
    val ranged = fs.headOption.toSeq
      .flatMap(f => StatsPruning.fileRanges(f).keys.toSeq.sorted)
    (primary ++ ranged ++ m.partitionCols.getOrElse(Nil)).distinct
  }

  /** The condition rendered as conjunctive predicates over RESOLVED
    * attribute refs — the shape [[StatsPruning.queryBounds]] consumes.
    * Resolution is a pure name substitution (no analyzer pass), so the
    * trees reach `queryBounds` WITHOUT type coercion — a cross-family
    * comparison (string column vs numeric literal) arrives as a bare
    * attribute-vs-literal shape that an analyzed plan would wrap in
    * Casts. `queryBounds` therefore gates extraction on literal/column
    * type-family agreement; a cross-family, unresolved, or exotic shape
    * contributes no bound (file kept, never wrongly pruned).
    */
  private def pruningPredicates(
      parsed: Expression, schema: StructType): Seq[Expression] = {
    val resolved = parsed.transformUp {
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        schema.fields.find(_.name.equalsIgnoreCase(u.nameParts.head))
          .map(f => AttributeReference(f.name, f.dataType)())
          .getOrElse(u)
    }
    splitConjunctive(resolved)
  }

  private[graft] def splitConjunctive(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctive(l) ++ splitConjunctive(r)
    case other => Seq(other)
  }
}
