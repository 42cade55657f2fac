package graft

import org.scalatest.funsuite.AnyFunSuite

/** The setup/measured split in BENCH_DETAIL is only as good as the
  * accumulator's arithmetic: double-counted nesting or a leaky reset would
  * silently misattribute fixture time to the operator under test.
  */
class BenchPhasesSpec extends AnyFunSuite {

  test("setup time accumulates and drains") {
    BenchPhases.reset()
    BenchPhases.setup { Thread.sleep(20) }
    BenchPhases.setup { Thread.sleep(20) }
    val s = BenchPhases.drainSeconds()
    assert(s >= 0.030 && s < 5.0, s"accumulated $s")
    assert(BenchPhases.drainSeconds() == 0.0, "drain must zero")
  }

  test("nested setup blocks count once, not twice") {
    BenchPhases.reset()
    BenchPhases.setup {
      BenchPhases.setup { Thread.sleep(30) }
      Thread.sleep(10)
    }
    val s = BenchPhases.drainSeconds()
    // double-counting would yield >= 70ms (30 inner + 40 outer)
    assert(s >= 0.035 && s < 0.065, s"nested accumulation was $s")
  }

  test("setup returns the body's value and rethrows its exception") {
    BenchPhases.reset()
    assert(BenchPhases.setup { 42 } == 42)
    intercept[IllegalStateException] {
      BenchPhases.setup { throw new IllegalStateException("boom") }
    }
    // time still billed on the throwing path
    assert(BenchPhases.drainSeconds() >= 0.0)
  }
}
