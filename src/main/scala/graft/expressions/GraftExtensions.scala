package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: exposes the engine's custom
  * Catalyst expressions AND the curation operators (built-in-expression
  * compositions) to SQL users.
  *
  * Catalyst expressions inject pre-session:
  *   spark.builder.withExtensions(new GraftExtensions)  // or
  *   --conf spark.sql.extensions=graft.expressions.GraftExtensions
  *   then: SELECT minhash_sig(shingles, 64), simhash64(tokens) FROM docs
  *
  * The SQL-defined curation functions need a LIVE session — call
  * `GraftExtensions.register(spark)` (idempotent; also covers the
  * injections above for an already-built session):
  *   then: SELECT portable_bucket(id, 42), doc_fingerprint(text, 8),
  *                scrub_emails(text), shingle_dup_ratio(ws_shingles(text, 3))
  *         FROM docs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  // Only the Catalyst expressions and the parser can be injected
  // pre-session; the SQL-defined curation functions need a live
  // session — call GraftExtensions.register(spark) (idempotent) after
  // session build.
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    // the Delta-parity statement surface (DESCRIBE DETAIL/HISTORY,
    // OPTIMIZE, RESTORE, VACUUM, constraints, SHALLOW CLONE) for graft
    // tables; everything else passes to the delegate untouched
    ext.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(delegate, Option(session)))
    // SELECT ... FROM t VERSION AS OF n / TIMESTAMP AS OF ts (Spark
    // parses these natively; this rule resolves them for graft tables).
    // Hints batch, NOT the resolution batch: the analyzer's own
    // RelationResolution throws TIME_TRAVEL-unsupported for v1 sources
    // before an extendedResolutionRule would run, so graft relations
    // must be substituted before resolution starts.
    ext.injectHintResolutionRule(session =>
      new graft.sources.GraftTimeTravelRule(session))
    // DELETE FROM / UPDATE / MERGE INTO on graft tables (also parsed
    // natively by Spark; resolved only for v2 sources). Same batch, same
    // reason: the substitution must beat relation resolution's
    // v1-unsupported check.
    ext.injectHintResolutionRule(session =>
      new graft.sources.GraftDmlRule(session))
    // column mapping: alias physical-named graft scans back to logical
    // names (main resolution batch — the Project must exist before user
    // attribute references resolve). Identity tables match nothing.
    ext.injectResolutionRule(session =>
      new graft.sources.GraftColumnMapRule(session))
    // deletion-vector masking for graft scans (post-hoc: needs resolved
    // relations; substitutes an already-analyzed anti-join subtree)
    ext.injectPostHocResolutionRule(session =>
      new graft.sources.GraftDvMaskRule(session))
    // metadata-only aggregates: unfiltered count(*) (and min/max of
    // stats-covered integral/date columns) over a graft scan answers
    // from the manifest — zero data files opened (Delta
    // OptimizeMetadataOnlyQuery parity)
    ext.injectOptimizerRule(session =>
      new graft.sources.GraftMetadataAggRule(session))
    // SELECT * FROM table_changes('t', from [, to]) — the stored change
    // feed as a SQL table function (Delta CDF read parity)
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(table, fromVersion[, toVersion]) - stored change feed rows"),
      (args: Seq[Expression]) => graft.sources.GraftTableChanges.plan(args)))
    // SELECT * FROM table_changes_by_row('t', from [, to]) — the same
    // window paired by STABLE ROW ID (row tracking): exact
    // update_preimage/postimage pairing, rewrites invisible
    ext.injectTableFunction((
      FunctionIdentifier("table_changes_by_row"),
      info("table_changes_by_row",
        "table_changes_by_row(table, fromVersion[, toVersion]) - " +
          "snapshot diff paired by stable row id"),
      (args: Seq[Expression]) => graft.sources.GraftTableChangesByRow.plan(args)))
    // SELECT * FROM table_changed_since('t', v) — rows modified after v
    // off one snapshot, file-skipped by per-file commit versions
    ext.injectTableFunction((
      FunctionIdentifier("table_changed_since"),
      info("table_changed_since",
        "table_changed_since(table, sinceVersion) - rows modified after " +
          "the cut (row tracking)"),
      (args: Seq[Expression]) => graft.sources.GraftTableChangedSince.plan(args)))
    // SELECT * FROM table_deleted_since('t', v) — the deletion
    // complement: _row_id of rows deleted after the cut, manifest-delta
    // derived (a compaction contributes nothing)
    ext.injectTableFunction((
      FunctionIdentifier("table_deleted_since"),
      info("table_deleted_since",
        "table_deleted_since(table, sinceVersion) - row ids deleted " +
          "after the cut (row tracking)"),
      (args: Seq[Expression]) => graft.sources.GraftTableDeletedSince.plan(args)))
    // SELECT * FROM table_sync_since('t', v) — the COMPLETE mirror sync
    // in one call: upserts + deletes off ONE pinned version, tagged by
    // _sync_action, so consumers can't split the pair across states
    ext.injectTableFunction((
      FunctionIdentifier("table_sync_since"),
      info("table_sync_since",
        "table_sync_since(table, sinceVersion) - upserts and deletes " +
          "since the cut off one pinned version (row tracking)"),
      (args: Seq[Expression]) => graft.sources.GraftTableSyncSince.plan(args)))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr, numPerms) - MinHash signature of a string array"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(arr) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

  /** The curation operators as SQL scalar functions (Spark 4 `CREATE
    * FUNCTION … RETURN <expr>`): same expression trees the Scala API
    * builds (asserted equal in ExtensionsSpec), fully analyzed and
    * codegen'd like any built-in — a plain SQL user gets the whole
    * curation surface without touching the Scala API. (Function-registry
    * injection doesn't work for these: a Column composed from
    * `functions._` bridges to an unresolved ColumnNode the analyzer
    * won't resolve inside a registry-built expression.)
    */
  private val EmailSqlPattern =
    graft.functions.TextFunctions.EmailPattern.replace("\\", "\\\\")

  val curationSql: Seq[String] = Seq(
    """CREATE OR REPLACE TEMPORARY FUNCTION portable_bucket(id BIGINT, seed BIGINT)
      |RETURNS BIGINT RETURN pmod(CAST(conv(substring(md5(
      |  concat(CAST(id AS STRING), ':', CAST(seed AS STRING))), 1, 8), 16, 10)
      |  AS BIGINT), 1000000)""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION ws_tokens(text STRING)
      |RETURNS ARRAY<STRING> RETURN split(trim(lower(text)), '\\s+')""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION ws_shingles(text STRING, k INT)
      |RETURNS ARRAY<STRING> RETURN
      |CASE WHEN size(split(trim(lower(text)), '\\s+')) >= k
      |  THEN transform(sequence(1, size(split(trim(lower(text)), '\\s+')) - (k - 1)),
      |         i -> array_join(slice(split(trim(lower(text)), '\\s+'), i, k), ' '))
      |  ELSE array(array_join(split(trim(lower(text)), '\\s+'), ' ')) END""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(text STRING, keep INT)
      |RETURNS ARRAY<STRING> RETURN
      |slice(array_sort(array_distinct(transform(ws_shingles(text, 3),
      |  x -> substring(md5(x), 1, 16)))), 1, keep)""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION shingle_dup_ratio(sh ARRAY<STRING>)
      |RETURNS DOUBLE RETURN
      |1.0d - CAST(size(array_distinct(sh)) AS DOUBLE) / CAST(size(sh) AS DOUBLE)""".stripMargin,
    s"""CREATE OR REPLACE TEMPORARY FUNCTION email_count(text STRING)
       |RETURNS INT RETURN regexp_count(text, '$EmailSqlPattern')""".stripMargin,
    s"""CREATE OR REPLACE TEMPORARY FUNCTION scrub_emails(text STRING)
       |RETURNS STRING RETURN regexp_replace(text, '$EmailSqlPattern', '<EMAIL>')""".stripMargin)

  /** Imperative registration for an already-built session (tests, REPL):
    * the Catalyst sketch expressions plus the SQL-defined curation
    * functions.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
    curationSql.foreach(spark.sql(_))
  }
}
