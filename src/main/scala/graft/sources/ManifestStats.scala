package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.types._

/** ANALYZE-from-manifest: fill the Spark catalog's CBO statistics for a
  * registered graft table straight from the manifest — table size, row
  * count, per-column min/max/ndv AND an equi-height histogram derived
  * from the per-file ranges the manifest already holds. Zero data files
  * opened: Spark's own `ANALYZE ... FOR COLUMNS` pays a full table scan
  * (and a second pass for histograms under
  * `spark.sql.statistics.histogram.enabled`); at 100 TB that scan IS the
  * reason tables go un-analyzed. This pays O(files) driver work instead
  * and feeds the CBO the same planning signal — including the
  * skewed-dimension case where min/max alone misestimates a range
  * filter's selectivity by orders of magnitude and the histogram flips
  * the join back to broadcast (CatalogSpec witness).
  *
  * Model: each file's rows spread uniformly over its [min, max] range
  * (exactly the assumption Spark's estimator makes INSIDE a histogram
  * bin), so the table's distribution is the piecewise-uniform mixture of
  * its files — the sharper the write clustering, the sharper the
  * histogram, and graft's clustered writes keep per-file ranges tight by
  * design. Bins are cut at equal-mass quantiles of that mixture's CDF.
  *
  * Conservative by construction: a column emits stats only when EVERY
  * live file carries a range for it (a partial histogram would
  * misrepresent the uncovered mass); non-numeric columns emit min/max
  * and counts without a histogram (Spark only defines numeric bins).
  * Null counts are not tracked in file stats, so they are reported as 0
  * — an estimate; these are planning hints, never correctness inputs.
  */
object ManifestStats {

  /** What the last manifest-ANALYZE of a root installed — enough to
    * decide, from the NEW manifest's inline counts alone (no chunk
    * opens), whether DML churn has drifted the distribution past the
    * refresh threshold.
    */
  private case class Analyzed(db: String, table: String, cols: Seq[String],
      version: Long, files: Long, rows: Long)

  /** (session, root) → last install. Session-scoped like the catalog
    * stats themselves; entries are tiny and die with the JVM.
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Analyzed]()

  // keyed on the STABLE session UUID, not identityHashCode: identity
  // hashes can collide across sessions (or recur after a GC'd session),
  // cross-wiring an auto-refresh to another session's registration
  // a UUID per live session (weak keys: a collected session's entry —
  // and thus its id — dies with it, so no new session can inherit it
  // the way a recycled identityHashCode could)
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def key(spark: SparkSession, root: String): String = {
    val id = sessionIds.computeIfAbsent(
      spark, _ => java.util.UUID.randomUUID().toString)
    s"$id:$root"
  }

  /** Auto-refresh churn threshold: fraction of row- or file-count drift
    * since the last ANALYZE past which a commit re-derives the stats.
    */
  private def churnThreshold(spark: SparkSession): Double =
    spark.conf.getOption("spark.graft.stats.autoRefreshChurn")
      .map(_.toDouble).getOrElse(0.1)

  /** Post-commit hook ([[GraftTable.commitSet]]): if this root was
    * manifest-ANALYZEd and the commit's cumulative churn since then
    * passes the threshold, re-run the same ANALYZE — O(files) driver
    * work, zero data IO — so a plan the histogram won (the CatalogSpec
    * broadcast flip) survives DML drift without a manual re-ANALYZE.
    * Stats are planning hints: any failure here is swallowed, a commit
    * can never fail on them.
    */
  private[graft] def maybeRefresh(
      spark: SparkSession, t: GraftTable, version: Long): Unit = {
    val a = registry.get(key(spark, t.root))
    if (a == null || version <= a.version) return
    try {
      val m = t.manifest(version)
      val chunks = m.chunks.getOrElse(Nil)
      val files = m.files.length.toLong + chunks.map(_.files.toLong).sum
      val rows = m.files.map(_.liveRows).sum + chunks.map(_.rows).sum
      def drift(now: Long, then0: Long): Double =
        math.abs(now - then0).toDouble / math.max(then0, 1L)
      if (math.max(drift(files, a.files), drift(rows, a.rows)) >=
        churnThreshold(spark))
        analyze(spark, a.db, a.table, t, a.cols)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // stats are hints — never fail a commit on them — but a missed
        // refresh must be diagnosable, not invisible
        org.slf4j.LoggerFactory.getLogger(getClass).debug(
          s"stats auto-refresh skipped for ${a.db}.${a.table} at " +
            s"version $version: ${e.getMessage}")
    }
  }

  /** Compute and install catalog stats for `db.table` (must be
    * registered, e.g. via [[GraftCatalog.register]]) from `t`'s latest
    * manifest. Returns the column names that actually received stats.
    */
  def analyze(
      spark: SparkSession, db: String, table: String, t: GraftTable,
      cols: Seq[String]): Seq[String] = {
    val m = t.latestManifest.getOrElse(throw new IllegalStateException(
      s"ANALYZE of uncommitted table ${t.root}"))
    val files = t.filesOf(m)
    val schema = StructType.fromDDL(m.schema)
    val rowCount = files.map(_.liveRows).sum
    val sizeInBytes = math.max(1L, files.flatMap(_.bytes).sum)
    val numBins = spark.conf.getOption("spark.sql.statistics.histogram.numBins")
      .map(_.toInt).getOrElse(254)

    val colStats: Map[String, CatalogColumnStat] = cols.flatMap { c =>
      val field = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"ANALYZE: no column `$c` in ${t.root}"))
      val phys = m.physicalOf(field.name)
      val entries = files.flatMap(f =>
        StatsPruning.fileRanges(f).get(phys).map {
          case (lo, hi) => (lo, hi, f.liveRows) })
      // full coverage or nothing: files without a range for this column
      // hold mass the histogram cannot place
      if (entries.map(_._3).sum != rowCount || rowCount == 0) None
      else {
        val dt = Some(field.dataType)
        val minS = entries.map(_._1).min(Ordering.fromLessThan[String](
          (a, b) => StatsPruning.cmp(dt, a, b) < 0))
        val maxS = entries.map(_._2).max(Ordering.fromLessThan[String](
          (a, b) => StatsPruning.cmp(dt, a, b) < 0))
        val integral = field.dataType match {
          case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
          case _ => false
        }
        val fractional = field.dataType match {
          case _: FloatType | _: DoubleType | _: DecimalType => true
          case _ => false
        }
        val numericEntries: Option[Seq[(Double, Double, Long)]] =
          if (!integral && !fractional) None
          else try Some(entries.map(e => (e._1.toDouble, e._2.toDouble, e._3)))
          catch { case _: NumberFormatException => None }
        val hist = numericEntries.flatMap(equiHeight(_, numBins, integral))
        // ndv is only derivable from ranges on integral columns (value
        // width bounds it). For strings/fractionals the manifest carries
        // no distinctness signal — emit None (CatalogColumnStat allows
        // it) rather than rowCount, which would report a 3-value status
        // column as fully distinct and flip joins the WRONG way.
        val ndv: Option[BigInt] = numericEntries match {
          case Some(es) if integral =>
            val width = es.map(_._2).max - es.map(_._1).min
            Some(BigInt(math.min(rowCount, width.toLong + 1L)))
          case _ => None
        }
        Some(field.name -> CatalogColumnStat(
          distinctCount = ndv,
          min = Some(minS), max = Some(maxS),
          nullCount = Some(BigInt(0)), // not tracked in file stats
          avgLen = Some(field.dataType.defaultSize.toLong),
          maxLen = Some(field.dataType.defaultSize.toLong),
          histogram = hist))
      }
    }.toMap

    spark.sessionState.catalog.alterTableStats(
      TableIdentifier(table, Some(db)),
      Some(CatalogStatistics(
        BigInt(sizeInBytes), Some(BigInt(rowCount)), colStats)))
    registry.put(key(spark, t.root),
      Analyzed(db, table, cols, m.version, files.length.toLong, rowCount))
    colStats.keys.toSeq
  }

  /** Equi-height histogram of the piecewise-uniform mixture: bin edges
    * are equal-mass quantiles of the CDF implied by the per-file
    * (lo, hi, rows) ranges. Zero-width ranges are point masses. Per-bin
    * ndv is capped by the bin's integer width for integral columns.
    */
  private[graft] def equiHeight(
      entries: Seq[(Double, Double, Long)], numBins: Int,
      integral: Boolean): Option[Histogram] = {
    val total = entries.map(_._3).sum
    if (total <= 0 || entries.isEmpty || numBins < 1) return None
    val bps = entries.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    if (bps.length == 1)
      return Some(Histogram(total.toDouble,
        Array(HistogramBin(bps.head, bps.head, 1L))))
    // mass per breakpoint segment [bps(i), bps(i+1)): uniform overlap
    // fractions, point masses assigned to the segment they start
    val segMass = Array.fill(bps.length - 1)(0.0)
    val idx = bps.zipWithIndex.toMap
    entries.foreach { case (lo, hi, r) =>
      if (hi <= lo) {
        val i = math.min(idx(lo), bps.length - 2)
        segMass(i) += r.toDouble
      } else {
        var i = idx(lo)
        while (i < idx(hi)) {
          segMass(i) += r.toDouble * (bps(i + 1) - bps(i)) / (hi - lo)
          i += 1
        }
      }
    }
    // inverse CDF by linear interpolation inside segments
    val cum = segMass.scanLeft(0.0)(_ + _) // cum(i) = mass before bps(i)
    def invCdf(target: Double): Double = {
      if (target <= 0) return bps.head
      if (target >= cum.last) return bps.last
      var i = 0
      while (cum(i + 1) < target) i += 1
      val segM = cum(i + 1) - cum(i)
      if (segM <= 0) bps(i + 1)
      else bps(i) + (target - cum(i)) / segM * (bps(i + 1) - bps(i))
    }
    val height = cum.last / numBins
    val cuts = (0 to numBins).map(j => invCdf(j * height))
    val bins = cuts.sliding(2).map { case Seq(lo, hi) =>
      val ndv =
        if (integral)
          math.max(1L, math.min(height.toLong + 1L, math.floor(hi).toLong - math.ceil(lo).toLong + 1L))
        else math.max(1L, height.toLong)
      HistogramBin(lo, hi, ndv)
    }.toArray
    Some(Histogram(height, bins))
  }
}
