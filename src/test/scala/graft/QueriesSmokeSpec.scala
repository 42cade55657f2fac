package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
    // Fail loudly if any generated code does not compile; production
    // sessions silently fall back to interpreted mode, which round-1
    // bench showed costs ~8x on the sketch-heavy queries.
    .config("spark.sql.codegen.fallback", "false")
    .getOrCreate()
}

/** Every registered query runs at sf0.001 and yields a usable result. */
class QueriesSmokeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("events reads from two threads agree (no conf mutation on read path)") {
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try counts.add(Tables.table(TestSpark.spark, sf, "events").count())
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent events read failed: ${errs.peek()}")
    assert(counts.size == 2 && counts.toArray.distinct.length == 1)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without matching query: $extra")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(TestSpark.spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
