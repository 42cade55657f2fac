package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingBacklogBench

/** Sustained-backlog + kill/restart witness for the source→sink chain:
  * exactly-once across the restart is asserted INSIDE the harness
  * (loss or dupes throw); here the latency record must be real and
  * FLAT — a second-half median drifting far above the first half means
  * a per-batch cost that scales with the table (the O(table) hazard at
  * 100 TB), which is exactly what bounded-trigger streaming must not do.
  */
class StreamingBacklogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("backlog drain: flat per-batch latency, exactly-once across restart") {
    val s = StreamingBacklogBench.run(spark,
      nCommits = 24, rowsPerCommit = 200, maxFilesPerTrigger = 2)
    assert(s.rows == 24L * 200)
    assert(s.batches >= 6, s"expected a real multi-batch drain: $s")
    assert(s.restartBatches >= 1, s"the restarted query must do real work: $s")
    assert(s.firstHalfP50 > 0.0 && s.secondHalfP50 > 0.0, s"real medians: $s")
    // flatness: generous 4x + 2s slack absorbs CI noise while still
    // catching any per-batch cost that grows with processed volume
    assert(s.secondHalfP50 <= s.firstHalfP50 * 4 + 2.0,
      s"per-batch latency rose across the drain: $s")
  }
}
