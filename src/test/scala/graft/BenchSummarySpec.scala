package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round 5 went red because Bench's final summary line grew ~25 chars per
  * query and outran the driver's ~2000-char stdout-tail capture at 75
  * queries. The fix bounds the line to the top-K slowest queries; this spec
  * is the regression guard the verdict asked for — the bound must hold for
  * batteries far larger than today's.
  */
class BenchSummarySpec extends AnyFunSuite {

  private def synthetic(n: Int): Map[String, Double] =
    (1 to n).map { i =>
      // realistic worst-case name lengths (current longest is 26 chars)
      f"q$i%03d_some_rather_long_operator_name" -> (i * 0.037)
    }.toMap

  test("summary line stays bounded at 200 synthetic queries") {
    val m = synthetic(200)
    val line = Bench.summaryLine(m, m.values.sum, "/root/testdata/sf0.1")
    assert(line.length <= Bench.SummaryMaxChars,
      s"line was ${line.length} chars: $line")
  }

  test("summary line stays bounded at 1000 synthetic queries") {
    val m = synthetic(1000)
    val line = Bench.summaryLine(m, m.values.sum, "/root/testdata/sf0.1")
    assert(line.length <= Bench.SummaryMaxChars)
  }

  test("summary line carries the A/B verdict when present and stays bounded") {
    val m = synthetic(200)
    val ab = """{"old":"abc1234","new":"def5678","shared":109,""" +
      """"old_s":137.4,"new_s":141.2,"ratio":0.973}"""
    val line = Bench.summaryLine(m, m.values.sum, "/root/testdata/sf0.1", Some(ab))
    assert(line.contains(s""""ab":$ab"""))
    assert(line.length <= Bench.SummaryMaxChars,
      s"line was ${line.length} chars: $line")
    assert(!line.contains("\n"))
  }

  test("summary line is valid single-line JSON with the driver's keys") {
    val m = synthetic(75)
    val line = Bench.summaryLine(m, m.values.sum, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    // cheap structural check without a JSON lib: the driver greps for
    // these keys in the captured tail
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
                  "\"queries\":{", "\"sf\":", "\"n\":75"))
      assert(line.contains(k), s"missing $k in $line")
    // Spark can parse it as JSON — same class of parser as the driver's
    val spark = TestSpark.spark
    import spark.implicits._
    val parsed = spark.read.json(spark.createDataset(Seq(line)))
    assert(parsed.columns.contains("metric"))
    assert(parsed.select("value").head.getDouble(0) > 0)
  }

  test("queries map carries exactly the top-K slowest, 3-decimal") {
    val m = Map("fast" -> 0.1, "mid" -> 1.0, "slow" -> 5.0,
                "slower" -> 7.0, "slowest" -> 9.0, "glacial" -> 11.0)
    val line = Bench.summaryLine(m, m.values.sum, "sf")
    assert(line.contains("\"glacial\":11.000"))
    assert(line.contains("\"slowest\":9.000"))
    assert(line.contains("\"slow\":5.000"))
    assert(!line.contains("\"fast\""), "6th-slowest must be dropped")
  }

  test("failed queries (median -1) never enter the top-k map") {
    val m = Map("ok" -> 0.5, "broken" -> -1.0)
    val line = Bench.summaryLine(m, 0.5, "sf")
    assert(!line.contains("broken"))
    assert(line.contains("\"ok\":0.500"))
  }
}
