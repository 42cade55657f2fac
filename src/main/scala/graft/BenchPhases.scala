package graft

/** Setup-vs-operator time attribution for the bench harness.
  *
  * Fixture-style queries (q17–q19, q56–q58, q70–q71, q75–q76) build their
  * inputs — temp-dir base tables, config rows, placeholder corpus state —
  * inside the same function whose total wall time the bench records, so a
  * regression in the operator under test (merge, incremental load, export,
  * store sync) could hide inside fixture noise, and vice versa. Query code
  * marks fixture blocks with [[setup]]; [[Bench]] resets the accumulator
  * before each timed run and reports `setup` and `measured = total − setup`
  * separately in BENCH_DETAIL.json.
  *
  * Only eager fixture work is worth marking: wrapping a lazy DataFrame
  * construction attributes ~0ns and is harmless but pointless.
  *
  * Nested [[setup]] blocks count once (depth-tracked per thread): an outer
  * fixture helper that calls another marked helper must not double-bill
  * the overlap. Accumulation is process-global because the bench runs
  * queries sequentially on one caller thread; outside the bench the
  * accumulator is never read, so marks cost two `nanoTime` calls.
  */
object BenchPhases {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Run `body`, billing its wall time to fixture setup (outermost only). */
  def setup[T](body: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = System.nanoTime() - t0
      depth.set(d)
      if (d == 0) { acc.addAndGet(dt); () }
    }
  }

  /** Zero the accumulator (bench calls this before each timed run). */
  def reset(): Unit = acc.set(0L)

  /** Seconds accumulated since the last reset/drain, and zero it. */
  def drainSeconds(): Double = acc.getAndSet(0L) / 1e9
}
