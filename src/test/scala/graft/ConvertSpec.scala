package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** CONVERT TO GRAFT: in-place import of an existing parquet directory —
  * no file rewritten, footer-built stats, and the converted table is a
  * full citizen (time travel, DML, merge, SQL statement surface).
  */
class ConvertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-conv").toString

  private def plainParquet(dir: String, n: Long = 1000L): Unit =
    (1L to n).map(i => (i, s"v$i", i * 1.5)).toDF("k", "v", "amt")
      .repartitionByRange(4, col("k"))
      .write.parquet(dir)

  private def listParquet(dir: String): Set[(String, Long)] = {
    val walk = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis))
        .toSet
    } finally walk.close()
  }

  test("convert in place: same files, footer stats, content identical") {
    val dir = s"${tmp()}/t"
    plainParquet(dir)
    val before = listParquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"))
    // zero rewrite: exactly the same files with the same mtimes
    assert(listParquet(dir) == before, "convert must not touch any data file")
    assert(t.scan.count() == 1000)
    assert(t.scan.agg(sum("k")).head().getLong(0) == (1L to 1000L).sum)
    // footer stats landed: every file carries a k-range, so pruning works
    val m = t.latestManifest.get
    assert(m.operation.contains("convert"))
    val files = t.filesOf(m)
    assert(files.nonEmpty && files.forall(f =>
      f.ranges.exists(_.contains("k")) || (f.min.isDefined && f.max.isDefined)))
    // range-clustered input → a point DELETE rewrites a strict subset
    val v2 = t.delete("k = 10")
    assert(v2 == 2 && t.scan.count() == 999)
    val survivors = t.filesOf(t.latestManifest.get).map(_.path).toSet
    val originals = files.map(_.path).toSet
    assert((originals & survivors).nonEmpty,
      s"stats pruning must keep untouched imported files: $survivors")
  }

  test("converted table supports time travel, merge and streaming reads") {
    val dir = s"${tmp()}/t"
    plainParquet(dir, 100L)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"))
    t.merge(Seq((1L, "V1", 0.0), (101L, "new", 1.0)).toDF("k", "v", "amt"),
      Seq("k")).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.scan.count() == 101)
    assert(t.snapshotAt(1).count() == 100, "v1 pins the imported state")
    val got = spark.read.format("graft").load(dir)
      .filter(col("k") === 1L).head().getString(1)
    assert(got == "V1")
  }

  test("SQL statement: CONVERT TO GRAFT parquet.`path` STATS (...)") {
    val dir = s"${tmp()}/t"
    plainParquet(dir, 50L)
    val r = spark.sql(s"CONVERT TO GRAFT parquet.`$dir` STATS (k)").head()
    assert(r.getString(0) == dir && r.getLong(1) == 1L && r.getLong(2) > 0L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) == 50)
    // converting twice errors loudly
    val e = intercept[Exception](spark.sql(s"CONVERT TO GRAFT parquet.`$dir`"))
    assert(e.getMessage.contains("already a graft table"))
  }

  test("timestamp stats column falls back to the Spark pass") {
    val dir = s"${tmp()}/t"
    (1 to 200).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2026-02-${i % 28 + 1}%02d 00:00:00")))
      .toDF("k", "ts").repartitionByRange(3, col("k")).write.parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k", "ts"))
    val files = t.filesOf(t.latestManifest.get)
    assert(files.forall(_.ranges.exists(r => r.contains("k") && r.contains("ts"))),
      s"fallback pass must produce ranges for both columns: $files")
    assert(t.scan.count() == 200)
  }

  test("unknown stats column and empty directory error loudly") {
    val dir = s"${tmp()}/t"
    plainParquet(dir, 10L)
    val e1 = intercept[IllegalArgumentException](
      GraftTable.convertParquet(spark, dir, Seq("nope")))
    assert(e1.getMessage.contains("stats column"))
    val empty = s"${tmp()}/empty"
    Files.createDirectories(Paths.get(empty))
    val e2 = intercept[IllegalArgumentException](
      GraftTable.convertParquet(spark, empty))
    assert(e2.getMessage.contains("no parquet files"))
  }

  test("Hive-partitioned directory is refused, not silently de-columned") {
    val dir = s"${tmp()}/t"
    Seq((1L, "a", "2020-01-01"), (2L, "b", "2020-01-02"))
      .toDF("k", "v", "date")
      .write.partitionBy("date").parquet(dir)
    // the partition column lives in `date=.../` path segments, not the
    // leaf files — an in-place convert cannot represent it
    val e = intercept[IllegalArgumentException](
      GraftTable.convertParquet(spark, dir))
    assert(e.getMessage.contains("Hive-style partition") &&
      e.getMessage.contains("date="), e.getMessage)
  }

  private def hiveDir(dir: String): Unit =
    (1L to 300L)
      .map(i => (i, s"v$i", 2020 + (i % 2).toInt, (i % 3).toInt + 1))
      .toDF("k", "v", "yyyy", "mm")
      .repartition(2)
      .write.partitionBy("yyyy", "mm").parquet(dir)

  test("PARTITIONED BY converts a Hive layout in place, values intact") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val before = listParquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    assert(listParquet(dir) == before, "convert must not touch any data file")
    // partition columns come LAST (Spark discovery parity) and carry the
    // declared types; every row's values match native discovery
    val got = t.scan
    assert(got.columns.toSeq == Seq("k", "v", "yyyy", "mm"))
    val expected = spark.read.parquet(dir)
      .select("k", "v", "yyyy", "mm").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val gotSet = got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(gotSet == expected)
    // snapshot (whole-file funnel) serves pv too
    assert(t.snapshot.columns.toSeq == Seq("k", "v", "yyyy", "mm"))
    assert(t.snapshot.count() == 300)
    // partition-predicate pruning: a one-slice filter SCANS a strict
    // subset of files (the files-read witness, via scan metrics)
    val all = t.filesOf(t.latestManifest.get).size
    val q = t.scan.filter(col("yyyy") === 2020 && col("mm") === 1)
    q.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    val pruned = scans(q.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).max
    assert(pruned < all && pruned > 0,
      s"expected partition pruning: $pruned of $all files")
    assert(t.scan.filter(col("yyyy") === 2020 && col("mm") === 1).count() ==
      (1L to 300L).count(i => i % 2 == 0 && i % 3 == 0))
  }

  test("SQL CONVERT ... PARTITIONED BY + NULL slice + escaped values") {
    val dir = s"${tmp()}/t"
    Seq((1L, "x", "d 1"), (2L, "y", null), (3L, "z", "d%2"), (4L, "w", "d 1"))
      .toDF("k", "v", "day")
      .write.partitionBy("day").parquet(dir)
    val out = spark.sql(
      s"CONVERT TO GRAFT parquet.`$dir` PARTITIONED BY (day STRING) " +
        "STATS (k)").collect()
    assert(out.head.getString(0) == dir)
    val t = GraftTable(spark, dir)
    val got = t.scan.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "x", "d 1"), (2L, "y", null), (3L, "z", "d%2"),
      (4L, "w", "d 1")), got)
    assert(t.scan.filter(col("day").isNull).count() == 1)
    assert(t.scan.filter(col("day") === "d 1").count() == 2)
  }

  test("PARTITIONED BY validation: undeclared, unparsable, shadowed") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    // declaring only yyyy leaves mm= undeclared → loud
    val e1 = intercept[IllegalArgumentException](GraftTable.convertParquet(
      spark, s"$dir", Nil, Seq("yyyy" -> "INT")))
    assert(e1.getMessage.contains("mm"), e1.getMessage)
    // a value that does not parse as the declared type → loud
    val e2 = intercept[IllegalArgumentException](GraftTable.convertParquet(
      spark, s"$dir", Nil, Seq("yyyy" -> "INT", "mm" -> "DATE")))
    assert(e2.getMessage.contains("does not parse"), e2.getMessage)
    // a declared partition column that also exists IN the files → loud
    val dir2 = s"${tmp()}/t2"
    (1L to 10L).map(i => (i, (i % 2).toInt, (i % 2).toInt))
      .toDF("k", "v", "p").write.partitionBy("p").parquet(dir2)
    val e3 = intercept[IllegalArgumentException](GraftTable.convertParquet(
      spark, dir2, Nil, Seq("p" -> "INT", "v" -> "INT")))
    assert(e3.getMessage.contains("shadow"), e3.getMessage)
  }

  test("registered catalog SQL serves a Hive-converted table, pruned") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    graft.sources.GraftCatalog.register(spark, "convdb", "hive_t", t)
    assert(spark.table("convdb.hive_t").columns.toSeq ==
      Seq("k", "v", "yyyy", "mm"))
    assert(spark.sql(
      "SELECT count(*) FROM convdb.hive_t WHERE yyyy = 2021 AND mm = 2")
      .head().getLong(0) ==
      (1L to 300L).count(i => i % 2 == 1 && i % 3 == 1))
    // SQL time travel over the convert version works too
    assert(spark.sql(
      "SELECT count(*) FROM convdb.hive_t VERSION AS OF 1").head().getLong(0)
      == 300L)
  }

  /** Manifest-live files with their on-disk identity — the byte-
    * identical witness for O(touched) claims: an untouched file keeps
    * its path, size AND mtime.
    */
  private def liveIdentity(t: GraftTable): Map[String, (Long, Long)] =
    t.filesOf(t.latestManifest.get).map { f =>
      val p = Paths.get(t.root, f.path)
      f.path -> (Files.size(p), Files.getLastModifiedTime(p).toMillis)
    }.toMap

  test("DML on a converted table is pv-permanent and O(touched files)") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    assert(t.latestManifest.get.hasPv)

    // ---- append is O(batch): every pre-existing file byte-identical
    val beforeAppend = liveIdentity(t)
    Seq((9999L, "new", 2021, 1)).toDF("k", "v", "yyyy", "mm")
      .createOrReplaceTempView("conv_append_src")
    t.appendStats(spark.table("conv_append_src"), Seq("k"))
    val afterAppend = liveIdentity(t)
    assert(beforeAppend.forall { case (p, id) => afterAppend.get(p).contains(id) },
      "append must leave every existing file byte-identical")
    assert(t.latestManifest.get.hasPv, "pv is permanent — no bridge write")
    assert(t.scan.filter(col("k") === 9999L).select("yyyy", "mm").head() ==
      org.apache.spark.sql.Row(2021, 1))

    // ---- a one-partition DELETE rewrites ONLY that tuple's files
    val before = liveIdentity(t)
    t.delete("yyyy = 2021 AND mm = 2 AND k % 7 = 0")
    val m = t.latestManifest.get
    assert(m.hasPv, "delete keeps the pv layout")
    val after = liveIdentity(t)
    val untouched = before.keySet.filter(p => after.contains(p))
    assert(untouched.forall(p => before(p) == after(p)),
      "surviving files must be byte-identical")
    // every file of every OTHER tuple survived the delete untouched
    val otherTuples = t.filesOf(t.latestManifest.get).filter(f =>
      f.pv.exists(pv => !(pv.get("yyyy").contains("2021") &&
        pv.get("mm").contains("2"))))
    assert(otherTuples.forall(f => before.contains(f.path) &&
      before(f.path) == after(f.path)),
      "a one-partition DELETE must not rewrite any other tuple's files")
    // rewritten files carry their tuple: scans still serve pv columns
    val expect = (1L to 300L).count(i =>
      !(2020 + (i % 2) == 2021 && (i % 3) + 1 == 2 && i % 7 == 0)) + 1
    assert(t.scan.count() == expect)
    assert(t.snapshot.count() == expect)
    assert(t.scan.filter(col("yyyy") === 2021 && col("mm") === 2)
      .select(min("k")).head().getLong(0) ==
      (1L to 300L).filter(i => i % 2 == 1 && i % 3 == 1 && i % 7 != 0).min)

    // ---- UPDATE and MERGE keep the layout and the values
    t.update(Map("v" -> "'upd'"), "yyyy = 2020 AND mm = 1 AND k <= 6")
    assert(t.latestManifest.get.hasPv)
    assert(t.scan.filter(col("v") === "upd").count() ==
      (1L to 6L).count(i => i % 2 == 0 && i % 3 == 0))
    t.merge(Seq((9999L, "V2", 2021, 1), (10001L, "ins", 2020, 3))
        .toDF("k", "v", "yyyy", "mm"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.latestManifest.get.hasPv)
    assert(t.scan.filter(col("k") === 9999L).head().getString(1) == "V2")
    assert(t.scan.filter(col("k") === 10001L).select("yyyy", "mm").head() ==
      org.apache.spark.sql.Row(2020, 3))
    // all files still carry a tuple (the scan would throw otherwise)
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))

    // ---- the convert version still time-travels with path-derived values
    val v1 = t.snapshotAt(1)
    assert(v1.count() == 300 && v1.columns.contains("yyyy"))
  }

  test("replaceWhere / OPTIMIZE / z-order stay within the pv layout") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))

    // replaceWhere one slice: other tuples byte-identical
    val before = liveIdentity(t)
    t.overwriteWhere(
      Seq((5000L, "r1", 2020, 1), (5001L, "r2", 2020, 1))
        .toDF("k", "v", "yyyy", "mm"),
      "yyyy = 2020 AND mm = 1")
    val after = liveIdentity(t)
    val others = t.filesOf(t.latestManifest.get).filter(f =>
      f.pv.exists(pv => !(pv.get("yyyy").contains("2020") &&
        pv.get("mm").contains("1"))))
    assert(others.nonEmpty && others.forall(f =>
      before.get(f.path).contains(after(f.path))),
      "replaceWhere must leave other tuples untouched")
    assert(t.latestManifest.get.hasPv)
    assert(t.scan.filter(col("yyyy") === 2020 && col("mm") === 1).count() == 2)
    val expectOthers = (1L to 300L).count(i =>
      !(i % 2 == 0 && (i % 3) == 0))
    assert(t.scan.count() == 2 + expectOthers)

    // scoped + whole-table compaction re-pack WITHIN tuples
    t.compactWhere("yyyy = 2020", targetFileRows = 1000000L)
    assert(t.latestManifest.get.hasPv)
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
    assert(t.scan.count() == 2 + expectOthers)
    t.compact()
    val mc = t.latestManifest.get
    assert(mc.hasPv && t.filesOf(mc).forall(_.pv.isDefined))
    assert(t.scan.count() == 2 + expectOthers)
    // after whole-table compact each tuple holds exactly one file
    val perTuple = t.filesOf(mc).groupBy(_.pv.get).map(_._2.size)
    assert(perTuple.forall(_ == 1), s"one file per tuple, got $perTuple")

    // z-order within tuples works on data columns, refuses pv columns
    t.compactZOrder("k", "v")
    assert(t.latestManifest.get.hasPv &&
      t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
    assert(t.scan.count() == 2 + expectOthers)
    val ez = intercept[IllegalArgumentException](t.compactZOrder("k", "yyyy"))
    assert(ez.getMessage.contains("partition column"), ez.getMessage)
  }

  test("merge-on-read DELETE on a converted table: DV mask, pv intact") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    val before = liveIdentity(t)
    // MOR: no data file rewritten at all — the delete lands as a DV
    t.delete("yyyy = 2020 AND mm = 3 AND k % 4 = 0",
      deletionVectors = Some(true))
    val m = t.latestManifest.get
    assert(m.hasPv && t.filesOf(m).forall(_.pv.isDefined))
    val after = liveIdentity(t)
    assert(before.forall { case (p, id) => after.get(p).contains(id) },
      "a MOR delete must leave every data file byte-identical")
    assert(t.filesOf(m).exists(_.dv.isDefined), "the mask must have landed")
    val expect = (1L to 300L).count(i =>
      !(2020 + (i % 2) == 2020 && (i % 3) + 1 == 3 && i % 4 == 0))
    // both read paths serve the masked view WITH partition values
    assert(t.scan.count() == expect && t.snapshot.count() == expect)
    assert(t.scan.filter(col("yyyy") === 2020 && col("mm") === 3).count() ==
      (1L to 300L).count(i => i % 2 == 0 && i % 3 == 2 && i % 4 != 0))
    // a later UPDATE post-image lands tuple-pure through the pv funnel
    t.update(Map("v" -> "'mor'"), "yyyy = 2020 AND mm = 3 AND k <= 20",
      deletionVectors = Some(true))
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
    assert(t.scan.filter(col("v") === "mor").count() ==
      (1L to 20L).count(i => i % 2 == 0 && i % 3 == 2 && i % 4 != 0))
    // REORG PURGE materializes the masks away — still tuple-pure
    t.reorgPurge()
    val mp = t.latestManifest.get
    assert(mp.hasPv && t.filesOf(mp).forall(f =>
      f.pv.isDefined && f.dv.isEmpty))
    assert(t.scan.count() == expect &&
      t.scan.filter(col("yyyy") === 2020 && col("mm") === 3).count() ==
        (1L to 300L).count(i => i % 2 == 0 && i % 3 == 2 && i % 4 != 0))
  }

  test("schema ops on a converted table: rename pv column refused") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    // non-partition columns rename/drop/add as metadata-only commits
    t.renameColumn("v", "val")
    assert(t.scan.columns.contains("val"))
    t.addColumn("note", "STRING")
    assert(t.scan.columns.contains("note") &&
      t.scan.filter(col("note").isNotNull).count() == 0)
    t.dropColumn("note")
    assert(!t.scan.columns.contains("note"))
    assert(t.latestManifest.get.hasPv)
    // renaming a pv partition column would orphan every file's tuple key
    val e = intercept[IllegalArgumentException](t.renameColumn("yyyy", "year"))
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // and dropping one is refused like any partition column
    val e2 = intercept[IllegalArgumentException](t.dropColumn("mm"))
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    // reads still serve the tuple after the unrelated schema ops
    assert(t.scan.filter(col("yyyy") === 2021).count() ==
      (1L to 300L).count(i => i % 2 == 1))
  }

  test("distributed footer walk matches the driver pool byte-for-byte") {
    val dir = s"${tmp()}/t"
    (1L to 2000L).map(i => (i, s"v$i", i * 1.5)).toDF("k", "v", "amt")
      .repartitionByRange(12, col("k")).write.parquet(dir)
    def entriesOf(t: GraftTable) =
      t.filesOf(t.latestManifest.get)
        .map(f => (f.path, f.rows, f.statsCol, f.min, f.max, f.ranges))
        .sortBy(_._1)
    // driver pool (threshold above the file count)
    val t1 = GraftTable.convertParquet(spark, dir, Seq("k", "amt"))
    val driver = entriesOf(t1)
    // wipe the table metadata, re-convert with the DISTRIBUTED walk
    import scala.jdk.CollectionConverters._
    val meta = Paths.get(dir, "_graft")
    val w = Files.walk(meta)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally w.close()
    spark.conf.set("spark.graft.convert.distributedFooterThreshold", "4")
    try {
      val t2 = GraftTable.convertParquet(spark, dir, Seq("k", "amt"))
      assert(entriesOf(t2) == driver,
        "distributed footer stats must equal the driver pool's")
    } finally spark.conf.unset("spark.graft.convert.distributedFooterThreshold")
  }

  test("many-tuple DML reads plan ONE scan + broadcast join, not a union") {
    val dir = s"${tmp()}/t"
    // 40 tuples — far past the literal-injection threshold
    (1L to 400L).map(i => (i, s"v$i", (i % 40).toInt)).toDF("k", "v", "p")
      .repartition(1).write.partitionBy("p").parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"), Seq("p" -> "INT"))
    val df = t.snapshot
    val plan = df.queryExecution.executedPlan
    def count(p: org.apache.spark.sql.execution.SparkPlan,
        pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int =
      (if (pred(p)) 1 else 0) + p.children.map(count(_, pred)).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            count(a.executedPlan, pred)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            count(q.plan, pred)
          case _ => 0
        })
    val scans = count(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans <= 3, s"expected O(1) scans for 40 tuples, got $scans:\n$plan")
    // and the values it serves are right
    assert(df.count() == 400)
    assert(df.filter(col("p") === 7).count() == 10)
    // the whole-file DML funnel over the same 40 tuples is also O(1)
    // scans: a DELETE touching every tuple completes in one pass shape
    // (its read is one scan + a broadcast (path -> tuple) join, not a
    // 40-way union — q94's 2.3x measured win; asserted here by effect:
    // the rewrite lands tuple-pure and every tuple survives)
    val v = t.delete("k % 10 = 0")
    assert(v > 1 && t.scan.count() == 360)
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
    // tuples 0/10/20/30 hold only multiples of 10 — fully deleted, gone
    assert(spark.sql(s"SHOW PARTITIONS graft.`$dir`").count() == 36)
  }

  test("concurrent appends to different tuples of a pv table both land") {
    val dir = s"${tmp()}/t"
    (1L to 50L).map(i => (i, s"v$i", (i % 5).toInt)).toDF("k", "v", "p")
      .repartition(1).write.partitionBy("p").parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"), Seq("p" -> "INT"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (0 until 2).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            val tw = GraftTable(spark, dir)
            tw.appendStats(
              Seq((1000L + w, s"w$w", 10 + w)).toDF("k", "v", "p"), Seq("k"))
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // lock-free append rebase holds for pv tables: both batches visible,
    // each in its own (new) tuple
    assert(t.scan.count() == 52)
    assert(t.scan.filter(col("p") >= 10).count() == 2)
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
    assert(spark.sql(s"SHOW PARTITIONS graft.`$dir`").count() == 7)
  }

  test("shallow and deep clones of a converted table keep pv values") {
    val dir = s"${tmp()}/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    val sh = t.cloneAt(1, s"${tmp()}/shallow")
    val dp = t.cloneDeepAt(1, s"${tmp()}/deep")
    for (c <- Seq(sh, dp)) {
      assert(c.latestManifest.get.hasPv)
      assert(c.scan.count() == 300)
      assert(c.scan.filter(col("yyyy") === 2021 && col("mm") === 2).count() ==
        (1L to 300L).count(i => i % 2 == 1 && i % 3 == 1))
      // the clone is independently DML-able and stays tuple-pure
      c.delete("yyyy = 2021 AND mm = 2")
      assert(c.filesOf(c.latestManifest.get).forall(_.pv.isDefined))
    }
    // clone DML never touches the source
    assert(t.scan.count() == 300)
  }

  test("streaming sink appends into a converted pv table, tuple-pure") {
    val base = tmp()
    val dir = s"$base/t"
    hiveDir(dir)
    val before = listParquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    // two micro-batches through the native sink: one lands in existing
    // tuples, one opens a brand-new tuple (yyyy=2022) — both must route
    // through the pv funnel, not the clustered append path
    val schema = t.scan.schema
    Seq((1001L, "s1", 2020, 1), (1002L, "s2", 2021, 2))
      .toDF("k", "v", "yyyy", "mm")
      .write.parquet(s"$base/feed/b1.parquet")
    val q = spark.readStream.schema(schema).parquet(s"$base/feed/*.parquet")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt")
      .option("txnAppId", "conv-sink").option("stats", "k")
      .start(dir)
    try {
      q.processAllAvailable()
      assert(t.scan.count() == 302)
      Seq((1003L, "s3", 2022, 1)).toDF("k", "v", "yyyy", "mm")
        .write.parquet(s"$base/feed/b2.parquet")
      q.processAllAvailable()
      assert(t.scan.count() == 303)
    } finally q.stop()
    // the imported files were never rewritten
    assert(listParquet(dir).filter(f => before.exists(_._1 == f._1)) == before,
      "streaming appends must not touch converted files")
    // every live file (imported + streamed) carries its partition tuple
    val m = t.latestManifest.get
    assert(m.hasPv && t.filesOf(m).forall(_.pv.isDefined))
    // streamed rows answer partition predicates, including the new tuple
    assert(t.scan.filter(col("yyyy") === 2022).count() == 1)
    assert(t.scan.filter(col("yyyy") === 2020 && col("mm") === 1)
      .filter(col("k") === 1001L).count() == 1)
    // pruning still holds: the new-tuple slice scans a strict file subset
    val all = t.filesOf(m).size
    val sliced = t.scan.filter(col("yyyy") === 2022)
    sliced.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    val pruned = scans(sliced.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).max
    assert(pruned < all && pruned > 0,
      s"expected pv pruning over streamed files: $pruned of $all")
    // restart-safety carries over: a replayed batch is a no-op on pv too
    val sink = new graft.sources.GraftSink(spark, dir,
      Map("txnAppId" -> "conv-sink", "stats" -> "k"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0L, Seq((9999L, "dup", 2020, 1)).toDF("k", "v", "yyyy", "mm"))
    assert(t.scan.count() == 303, "replayed batch must be discarded on pv")
  }

  test("streaming upsert (pk merge) into a converted pv table") {
    val base = tmp()
    val dir = s"$base/t"
    hiveDir(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    val schema = t.scan.schema
    // k=6 exists in tuple (2020,1) [6%2==0, 6%3==0 → mm=1]: update its v;
    // k=2001 is new in a new tuple
    Seq((6L, "updated", 2020, 1), (2001L, "fresh", 2023, 2))
      .toDF("k", "v", "yyyy", "mm")
      .write.parquet(s"$base/feed/b1.parquet")
    val q = spark.readStream.schema(schema).parquet(s"$base/feed/*.parquet")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt")
      .option("txnAppId", "conv-upsert")
      .option("pk", "k")
      .start(dir)
    try { q.processAllAvailable() } finally q.stop()
    assert(t.scan.count() == 301)
    assert(t.scan.filter(col("k") === 6L).select("v").head().getString(0)
      == "updated")
    assert(t.scan.filter(col("k") === 2001L)
      .select("yyyy", "mm").head().toSeq == Seq(2023, 2))
    // merge write-back stayed tuple-pure
    assert(t.filesOf(t.latestManifest.get).forall(_.pv.isDefined))
  }
}
