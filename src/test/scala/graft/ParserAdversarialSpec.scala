package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftSqlParser, GraftTable}

/** Adversarial inputs against the regex statement dispatcher: keywords
  * inside string literals, comments, quoted identifiers, multi-statement
  * input, escape sequences. The contract under test is NEVER-SILENT:
  * every statement either parses to its intended meaning or refuses
  * loudly — no input may quietly reroute to the wrong handler or
  * truncate at a literal.
  */
class ParserAdversarialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-adv").toString

  // ---- helper units ------------------------------------------------------

  test("stripLeadingComments: line, block, stacked, unterminated") {
    val f = GraftSqlParser.stripLeadingComments _
    assert(f("-- note\nOPTIMIZE t") == "OPTIMIZE t")
    assert(f("/* note */ VACUUM t") == "VACUUM t")
    assert(f("  -- a\n\t/* b\nc */  -- d\n  SELECT 1") == "SELECT 1")
    // comments INSIDE the statement are not this helper's business
    assert(f("SELECT 1 -- trailing") == "SELECT 1 -- trailing")
    // unterminated block comment flows through for the delegate's error
    assert(f("/* never closed").startsWith("/*"))
    // a '--' INSIDE a leading comment line cannot eat the statement
    assert(f("-- x -- y\nSELECT 2") == "SELECT 2")
  }

  test("splitReplaceWhere: literals and subqueries never truncate the condition") {
    val f = GraftSqlParser.splitReplaceWhere _
    assert(f("v = 'a SELECT b' SELECT 1, 'x'") ==
      ("v = 'a SELECT b'", "SELECT 1, 'x'"))
    assert(f("id IN ( SELECT max(id) FROM src ) SELECT * FROM batch") ==
      ("id IN ( SELECT max(id) FROM src )", "SELECT * FROM batch"))
    assert(f("`weird FROM col` > 0 VALUES (1)") ==
      ("`weird FROM col` > 0", "VALUES (1)"))
    assert(f("d >= '2024-01-01' WITH cte AS (SELECT 1 AS a) SELECT a FROM cte") ==
      ("d >= '2024-01-01'", "WITH cte AS (SELECT 1 AS a) SELECT a FROM cte"))
    // keyword as a PREFIX of an identifier is not a query head
    assert(f("selection > 0 SELECT 1") == ("selection > 0", "SELECT 1"))
    val e = intercept[IllegalArgumentException](f("v = 'only a condition'"))
    assert(e.getMessage.contains("REPLACE WHERE"))
  }

  test("parseColumnDefs: backslash-escaped and doubled quotes in DEFAULTs") {
    val f = GraftSqlParser.parseColumnDefs _
    assert(f("""k BIGINT, v STRING DEFAULT 'it\'s, fine'""") ==
      Seq("k" -> "BIGINT", "v" -> """STRING DEFAULT 'it\'s, fine'"""))
    assert(f("k BIGINT, v STRING DEFAULT 'it''s, fine'") ==
      Seq("k" -> "BIGINT", "v" -> "STRING DEFAULT 'it''s, fine'"))
    // unterminated literal refuses loudly, never splits mid-string
    val e = intercept[IllegalArgumentException](f("v STRING DEFAULT 'oops"))
    assert(e.getMessage.contains("unterminated"))
  }

  // ---- end-to-end through spark.sql --------------------------------------

  test("leading comments do not reroute graft statements to the delegate") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), Some("id"))
    val rows = spark.sql(s"-- maintenance run\nDESCRIBE HISTORY graft.`$root`")
      .collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
    spark.sql(s"/* nightly */ OPTIMIZE graft.`$root`")
    assert(GraftTable(spark, root).latestVersion.get >= 1L)
    val dry = spark.sql(s"  -- a\n/* b */ VACUUM graft.`$root` DRY RUN")
    assert(dry.columns.nonEmpty)
  }

  test("REPLACE WHERE with a query-head keyword inside the condition literal") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, "a SELECT b"), (2L, "keep")).toDF("id", "v"),
      Some("id"))
    // the incoming row must itself satisfy the predicate (the operator's
    // contract) — what's under test is that the CONDITION survives the
    // literal keyword instead of truncating at 'a SELECT…'
    spark.sql(s"INSERT INTO graft.`$root` REPLACE WHERE v = 'a SELECT b' " +
      "SELECT 5L AS id, 'a SELECT b' AS v")
    val got = GraftTable(spark, root).scan.as[(Long, String)].collect().toSet
    assert(got == Set((2L, "keep"), (5L, "a SELECT b")))
  }

  test("CHECK expression with parens and keywords inside its literal") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, "ok")).toDF("id", "v"), Some("id"))
    spark.sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT no_ddl " +
      "CHECK (v <> 'CHECK (x) SELECT')")
    assert(GraftTable(spark, root).checks ==
      Map("no_ddl" -> "v <> 'CHECK (x) SELECT'"))
    intercept[Exception] {
      GraftTable(spark, root)
        .appendStats(Seq((2L, "CHECK (x) SELECT")).toDF("id", "v"), Seq("id"))
    }
  }

  test("TBLPROPERTIES values carrying SQL text and delimiters round-trip") {
    val root = s"${tmp()}/t"
    GraftTable(spark, root).overwrite(Seq((1L, 1L)).toDF("k", "v"))
    spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES (" +
      "'note' = 'MERGE INTO t; DROP TABLE u -- not a statement', " +
      "'cols' = 'a,b(c)=d')")
    val props = GraftTable(spark, root).properties
    assert(props("note") == "MERGE INTO t; DROP TABLE u -- not a statement")
    assert(props("cols") == "a,b(c)=d")
  }

  test("multi-statement input refuses loudly — never partial execution") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, 1L)).toDF("k", "v"))
    val before = t.latestVersion.get
    intercept[Exception] {
      spark.sql(s"OPTIMIZE graft.`$root`; OPTIMIZE graft.`$root`")
    }
    assert(GraftTable(spark, root).latestVersion.get == before,
      "no partial statement may have executed")
  }

  test("DEFAULT with a backslash-escaped quote lands through CREATE TABLE") {
    val root = s"${tmp()}/t"
    spark.sql(s"CREATE TABLE graft.`$root` " +
      """(k BIGINT, v STRING DEFAULT 'it\'s') USING graft""")
    spark.sql(s"INSERT INTO graft.`$root` (k) VALUES (1)")
    val got = GraftTable(spark, root).scan.as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "it's")))
  }
}
