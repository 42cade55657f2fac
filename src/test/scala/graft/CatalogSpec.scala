package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftTable}

class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("register exposes the current snapshot to spark.sql; re-register follows versions") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-cat").toString)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    GraftCatalog.register(spark, "demo", "t1", t)
    assert(GraftCatalog.tableExists(spark, "demo", "t1"))
    assert(spark.sql("SELECT count(*) FROM demo.t1").head().getLong(0) == 2)

    t.merge(Seq((3L, "c")).toDF("id", "v"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    GraftCatalog.register(spark, "demo", "t1", t) // pin readers to v2
    assert(spark.sql("SELECT count(*) FROM demo.t1").head().getLong(0) == 3)
  }

  test("registered table auto-advances to new loads without re-register") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-auto").toString)
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    GraftCatalog.register(spark, "demo", "auto_t", t)
    assert(spark.sql("SELECT count(*) FROM demo.auto_t").head().getLong(0) == 1)
    // append AND merge after registration — reads see both with no re-DDL
    t.append(Seq((2L, "b")).toDF("id", "v"), Some("id"))
    assert(spark.sql("SELECT count(*) FROM demo.auto_t").head().getLong(0) == 2)
    t.merge(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(spark.sql("SELECT v FROM demo.auto_t ORDER BY id").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b2", "c"))
  }

  test("catalog reads prune files via manifest min/max stats") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-prune").toString)
    val df = spark.range(0, 400).select(col("id"), (col("id") * 2).as("v"))
    t.overwriteStats(df.repartitionByRange(4, col("id")), Seq("id"))
    assert(t.latestManifest.get.files.length == 4)
    GraftCatalog.register(spark, "demo", "prune_t", t)
    val q = spark.sql("SELECT v FROM demo.prune_t WHERE id BETWEEN 120 AND 130")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (120L to 130L).map(_ * 2))
    val scanned = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(scanned.contains(1L),
      s"expected 1 of 4 files after manifest pruning, scanned $scanned")
  }

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/bronze"
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
    GraftCatalog.writeDatePartitioned(orders, "o_orderdate", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // directory layout is yyyy=/MM=/dd=
    assert(Files.list(java.nio.file.Paths.get(dir)).iterator().next()
      .getFileName.toString.startsWith("yyyy="))
    // a year-filtered read must scan only that year's partitions
    val pruned = back.filter(col("yyyy") === "1997")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(plan.contains("PartitionFilters") || !plan.contains("yyyy=1998"),
      "expected partition pruning on yyyy")
  }

  test("SHOW TBLPROPERTIES serves the graft property file") {
    import org.apache.spark.sql.functions.col
    val t = graft.sources.GraftTable(spark,
      java.nio.file.Files.createTempDirectory("graft-showp").toString)
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    t.setProperty("graft.bloomFilterColumns", "v")
    t.setProperty("graft.autoCompact", "true")
    val all = spark.sql(s"SHOW TBLPROPERTIES graft.`${t.root}`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(all == Map(
      "graft.bloomFilterColumns" -> "v", "graft.autoCompact" -> "true"))
    val one = spark.sql(
      s"SHOW TBLPROPERTIES graft.`${t.root}` ('graft.autoCompact')").head()
    assert(one.getString(1) == "true")
    val missing = spark.sql(
      s"SHOW TBLPROPERTIES graft.`${t.root}` ('nope')").head()
    assert(missing.getString(1).contains("does not have property"))
    // registered identifier works; non-graft reaches the delegate
    graft.sources.GraftCatalog.register(spark, "showp", "t1", t)
    assert(spark.sql("SHOW TBLPROPERTIES showp.t1")
      .filter(col("key") === "graft.autoCompact").count() == 1)
    spark.sql("DROP TABLE IF EXISTS showp_pq")
    spark.sql(
      "CREATE TABLE showp_pq (a INT) USING parquet TBLPROPERTIES ('x' = 'y')")
    assert(spark.sql("SHOW TBLPROPERTIES showp_pq")
      .filter("key = 'x'").head().getString(1) == "y",
      "non-graft SHOW TBLPROPERTIES must reach Spark's native command")
    spark.sql("DROP TABLE showp_pq")
  }

  test("schema evolution after registration needs no re-DDL") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-cat-evo").toString)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Some("id"))
    GraftCatalog.register(spark, "demo", "evo_t", t)
    // resolve + execute through the catalog, pinning this session's
    // relation cache to the pre-evolution schema
    assert(spark.sql("SELECT * FROM demo.evo_t").columns.toSeq == Seq("id", "v"))
    // an OUT-OF-BAND merge (not via the loader) adds a column
    t.merge(Seq((1L, "a2", 7.5), (3L, "c", 9.9)).toDF("id", "v", "score"), Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    // cache drop — NOT DDL; a fresh session would see it with no call
    spark.catalog.refreshTable("demo.evo_t")
    val evolved = spark.sql("SELECT id, v, score FROM demo.evo_t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(evolved.toSeq == Seq(
      (1L, "a2", Some(7.5)), (2L, "b", None), (3L, "c", Some(9.9))),
      "evolved column must be served through the ORIGINAL registration")
  }

  test("silver loader registers tables once; spark.sql follows incremental loads") {
    val tmp = Files.createTempDirectory("graft-reg").toString
    val config = new graft.pipeline.ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(graft.pipeline.Entity(
      1L, "regsrc", "demo2.reg_t", "src", "silver", "TMSTP", Some("ts"), "id")))
    val loader = new graft.pipeline.SilverLoader(
      spark, config, s"$tmp/src", s"$tmp/silver", registerInCatalog = true)
    def rows(n: Int, day: Int) = (1L to n.toLong).map(i =>
      (i, s"v$i", java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")))
    rows(50, 1).toDF("id", "v", "ts").write.mode("overwrite").parquet(s"$tmp/src/regsrc.parquet")
    loader.run()
    assert(spark.sql("SELECT count(*) FROM demo2.reg_t").head().getLong(0) == 50)
    // incremental load lands 25 more rows — the SAME catalog name serves
    // them without any re-registration
    (rows(50, 1) ++ (51L to 75L).map(i =>
      (i, s"v$i", java.sql.Timestamp.valueOf("2024-01-02 10:00:00"))))
      .toDF("id", "v", "ts").write.mode("overwrite").parquet(s"$tmp/src/regsrc.parquet")
    loader.run()
    assert(spark.sql("SELECT count(*) FROM demo2.reg_t").head().getLong(0) == 75)
    // schema evolution: a later load's source carries a new column; the
    // loader refreshes the registration so SQL readers see it
    (76L to 80L).map(i =>
      (i, s"v$i", java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), s"extra$i"))
      .toDF("id", "v", "ts", "note")
      .write.mode("overwrite").parquet(s"$tmp/src/regsrc.parquet")
    loader.run()
    val out = spark.sql("SELECT count(*) AS n, count(note) AS with_note FROM demo2.reg_t").head()
    assert(out.getLong(0) == 80 && out.getLong(1) == 5)
  }

  test("registered partitioned table prunes partition predicates via the catalog") {
    val t = GraftTable(spark, Files.createTempDirectory("graft-ppr").toString)
    val df = (0L until 400L).map(i => (s"day-${i % 4}", i, i.toDouble))
      .toDF("day", "id", "amount")
    t.overwritePartitioned(df, Seq("day"), Seq("id"))
    assert(t.latestManifest.get.files.length > 1)
    GraftCatalog.register(spark, "demo", "ppr_t", t)
    val q = spark.sql("SELECT sum(amount) FROM demo.ppr_t WHERE day = 'day-2'")
    assert(q.head().getDouble(0) == (0L until 400L).filter(_ % 4 == 2).map(_.toDouble).sum)
    // the agg plan is AQE-wrapped; leaves live under the adaptive root
    val root = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanned = root.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(scanned.exists(_ < t.latestManifest.get.files.length),
      s"expected partition-pruned catalog read, scanned $scanned of ${t.latestManifest.get.files.length}")
  }

  test("SQL statement surface: DESCRIBE DETAIL/HISTORY, OPTIMIZE, RESTORE") {
    val root = Files.createTempDirectory("graft-sqlops").toString
    val t = GraftTable(spark, root)
    t.overwriteStats((1L to 40L).map(i => (i, i * 2.0)).toDF("id", "price"),
      Seq("id")) // v1
    t.overwriteStats((1L to 10L).map(i => (i, -1.0)).toDF("id", "price"),
      Seq("id")) // v2
    GraftCatalog.register(spark, "demo", "sqlops", t)

    val d1 = spark.sql("DESCRIBE DETAIL demo.sqlops").head()
    assert(d1.getAs[String]("format") == "graft")
    assert(d1.getAs[Long]("version") == 2L)
    assert(d1.getAs[Long]("num_rows") == 10L)

    // RESTORE back to v1 via SQL → v3 with v1's 40 rows, with Delta's
    // restore metrics riding along (files brought back / dropped / after)
    val r = spark.sql("RESTORE TABLE demo.sqlops TO VERSION AS OF 1").head()
    assert(r.getLong(0) == 3L)
    assert(r.getAs[Long]("num_restored_files") > 0L, r.toString)
    assert(r.getAs[Long]("num_removed_files") > 0L, r.toString)
    assert(r.getAs[Long]("num_of_files_after_restore") > 0L &&
      r.getAs[Long]("table_size_after_restore") > 0L, r.toString)
    assert(spark.sql("SELECT count(*) FROM demo.sqlops").head().getLong(0) == 40L)

    // the 3-part session-catalog form resolves too (every catalog tool
    // emits it) — a no-op restore of the current version
    assert(spark.sql(
      "RESTORE TABLE spark_catalog.demo.sqlops TO VERSION AS OF 3")
      .head().getLong(0) >= 3L)

    // RESTORE TIMESTAMP AS OF: a future cut resolves to the latest
    // commit at-or-before it (v3 here — a no-op restore re-commits)
    val futureCut = java.time.Instant.now().plusSeconds(60).toString
    assert(spark.sql(
      s"RESTORE TABLE demo.sqlops TO TIMESTAMP AS OF '$futureCut'")
      .head().getLong(0) >= 3L)
    // a cut before every commit errors loudly
    val e = intercept[Exception](spark.sql(
      "RESTORE TABLE demo.sqlops TO TIMESTAMP AS OF '2000-01-01'"))
    assert(e.getMessage.contains("precedes every commit"))

    // OPTIMIZE via SQL → compact, contents unchanged
    assert(spark.sql("OPTIMIZE demo.sqlops").head().getLong(0) >= 4L)
    assert(spark.sql("SELECT sum(id) FROM demo.sqlops").head().getLong(0) ==
      (1L to 40L).sum)

    val hist = spark.sql("DESCRIBE HISTORY demo.sqlops")
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(hist == Seq(6L -> "compact", 5L -> "restore", 4L -> "restore",
      3L -> "restore", 2L -> "overwrite", 1L -> "overwrite"))

    // the path form reaches unregistered tables too
    assert(spark.sql(s"DESCRIBE DETAIL '$root'")
      .head().getAs[Long]("version") == 6L)

    // VACUUM via SQL reclaims superseded files; current reads unaffected
    val deleted = spark.sql(
      "VACUUM demo.sqlops RETAIN 0 HOURS KEEP 1 VERSIONS")
      .head().getInt(0)
    assert(deleted > 0, "superseded versions should reclaim files")
    assert(spark.sql("SELECT count(*) FROM demo.sqlops").head().getLong(0) == 40L)
    intercept[Exception] { t.snapshotAt(1).count() }

    // and plain statements still parse through the delegate untouched
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) == 2)
  }

  test("constraint DDL round-trips and gates writes; SHALLOW CLONE via SQL") {
    val tmp = Files.createTempDirectory("graft-sqlddl").toString
    val t = GraftTable(spark, s"$tmp/src")
    t.overwriteStats((1L to 20L).map(i => (i, i * 1.0)).toDF("id", "price"),
      Seq("id"))
    GraftCatalog.register(spark, "demo", "ddl_t", t)

    spark.sql(
      "ALTER TABLE demo.ddl_t ADD CONSTRAINT price_pos CHECK (price > 0)")
    assert(t.checks == Map("price_pos" -> "price > 0"))
    // the constraint gates the write funnel
    intercept[Exception] {
      t.append(Seq((99L, -5.0)).toDF("id", "price"), Some("id"))
    }
    // clone via SQL: pinned version, constraint travels, catalog-visible
    t.append(Seq((21L, 21.0)).toDF("id", "price"), Some("id")) // v2
    spark.sql(
      s"""CREATE TABLE demo.ddl_clone SHALLOW CLONE demo.ddl_t
         |VERSION AS OF 1 LOCATION '$tmp/clone'""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM demo.ddl_clone")
      .head().getLong(0) == 20L)
    val clone = GraftTable(spark, s"$tmp/clone")
    assert(clone.checks == Map("price_pos" -> "price > 0"))

    spark.sql("ALTER TABLE demo.ddl_t DROP CONSTRAINT price_pos")
    assert(t.checks.isEmpty)
    t.append(Seq((99L, -5.0)).toDF("id", "price"), Some("id")) // now allowed
    // the clone kept ITS constraint (independent lineage)
    assert(clone.checks == Map("price_pos" -> "price > 0"))
  }

  test("reader-option time travel: versionAsOf and timestampAsOf pin the scan") {
    val root = Files.createTempDirectory("graft-tt").toString
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, "v1a"), (2L, "v1b")).toDF("id", "v"), Some("id"))
    val tsAfterV1 = java.time.Instant.now().toString
    Thread.sleep(5)
    t.overwrite(Seq((1L, "v2a")).toDF("id", "v"), Some("id"))

    assert(spark.read.format("graft").load(root).count() == 1)
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(root)
    assert(v1.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("v1a", "v1b"))
    // pinned scans keep pruning: stats still drive file skipping
    assert(v1.filter(col("id") === 2L).count() == 1)
    val byTs = spark.read.format("graft")
      .option("timestampAsOf", tsAfterV1).load(root)
    assert(byTs.count() == 2, "timestamp between v1 and v2 must pin v1")
    intercept[Exception] {
      spark.read.format("graft")
        .option("timestampAsOf", "1999-01-01 00:00:00").load(root).count()
    }
    // instants are PARSED, never prefix-compared: a cut at v1's whole
    // second — strictly before a commit later within that second — must
    // exclude it (truncation would include it as a false equality)
    val v1At = java.time.Instant.parse(t.history.last.committedAt)
    if (v1At != v1At.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)) {
      val floor = v1At.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
        .toString.replace("T", " ").stripSuffix("Z")
      val e = intercept[IllegalArgumentException](spark.read.format("graft")
        .option("timestampAsOf", floor).load(root).count())
      assert(e.getMessage.contains("precedes every commit"))
    }

    // SQL time travel on the registered identifier resolves through the
    // injected rule (Spark parses VERSION AS OF natively, v1 sources
    // don't resolve it without help)
    GraftCatalog.register(spark, "demo", "tt_t", t)
    assert(spark.sql("SELECT count(*) FROM demo.tt_t").head().getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM demo.tt_t VERSION AS OF 1")
      .head().getLong(0) == 2)
    assert(spark.sql(
      s"SELECT v FROM demo.tt_t TIMESTAMP AS OF '$tsAfterV1' ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("v1a", "v1b"))
  }

  test("DataFrameWriter and SQL CTAS create real versioned graft tables") {
    val tmp = Files.createTempDirectory("graft-writer").toString
    // df.write.format("graft"): overwrite then append become versions
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")
      .write.format("graft").option("stats", "id").save(s"$tmp/w")
    Seq((3L, 30.0)).toDF("id", "x")
      .write.format("graft").option("stats", "id")
      .mode("append").save(s"$tmp/w")
    val w = GraftTable(spark, s"$tmp/w")
    assert(w.latestVersion.contains(2L))
    assert(w.history.map(_.operation) == Seq("append", "overwrite"))
    assert(w.snapshot.count() == 3)
    // stats landed → merge/scan pruning works like the Scala write path
    assert(w.latestManifest.get.files.forall(_.ranges.exists(_.contains("id"))))

    // SQL CTAS through the registered catalog
    GraftCatalog.register(spark, "demo", "ctas_src", w)
    spark.sql("DROP TABLE IF EXISTS demo.ctas_t")
    spark.sql(
      s"""CREATE TABLE demo.ctas_t USING graft LOCATION '$tmp/ctas'
         |AS SELECT id, x * 2 AS x2 FROM demo.ctas_src""".stripMargin)
    assert(spark.sql("SELECT sum(x2) FROM demo.ctas_t").head().getDouble(0)
      == 120.0)
    assert(GraftTable(spark, s"$tmp/ctas").exists)
  }

  test("two ConfigStore instances on one control root allocate disjoint ids") {
    val root = Files.createTempDirectory("graft-xproc").toString + "/control"
    val c1 = new graft.pipeline.ConfigStore(spark, root)
    val c2 = new graft.pipeline.ConfigStore(spark, root)
    val ids = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(c1, c2, c1, c2).zipWithIndex.map { case (c, i) =>
      new Thread(() =>
        try (1 to 3).foreach { j =>
          ids.add(c.openWatermark(i * 10L + j, "TMSTP", "2024-01-01"))
        } catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"cross-instance open failed: ${errs.peek()}")
    val all = scala.jdk.CollectionConverters.CollectionHasAsScala(ids).asScala.toSeq
    assert(all.size == 12 && all.distinct.size == 12,
      s"expected 12 unique ids, got $all")
    // every allocated id is queryable as an open row
    assert(c1.watermarksDf.filter(col("LoadEndDatetime").isNull).count() == 12)
  }

  test("parallel entity loop loads all entities correctly") {
    val tmp = Files.createTempDirectory("graft-par").toString
    val config = new graft.pipeline.ConfigStore(spark, s"$tmp/control")
    val entities = (1 to 4).map(i => graft.pipeline.Entity(
      i.toLong, s"src$i", s"demo.par_t$i", "src", "silver",
      "TMSTP", Some("ts"), "id"))
    config.registerEntities(entities)
    for (i <- 1 to 4)
      (1L to 50L).map(id => (id, s"e$i-$id", java.sql.Timestamp.valueOf(s"2024-01-0$i 10:00:00")))
        .toDF("id", "v", "ts")
        .write.parquet(s"$tmp/src/src$i.parquet")
    val loader = new graft.pipeline.SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver")
    val results = loader.run(parallelism = 4)
    assert(results.forall(_.action == "full"))
    for (e <- config.entities)
      assert(loader.silverTable(e).snapshot.count() == 50)
    // watermark table consistent under concurrency: 4 closed rows, unique ids
    val wm = config.watermarksTable.snapshot.select("WatermarkId").collect().map(_.getLong(0))
    assert(wm.length == 4 && wm.distinct.length == 4)
  }

  test("SHOW PARTITIONS: pv table answers from file metadata, sorted") {
    val dir = Files.createTempDirectory("graft-showp").toString + "/t"
    Seq((1L, "a", 2020, 1), (2L, "b", 2020, 2), (3L, "c", 2021, 1),
      (4L, "d", 2020, 1)).toDF("k", "v", "yyyy", "mm")
      .write.partitionBy("yyyy", "mm").parquet(dir)
    GraftTable.convertParquet(spark, dir, Seq("k"),
      Seq("yyyy" -> "INT", "mm" -> "INT"))
    val got = spark.sql(s"SHOW PARTITIONS graft.`$dir`").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("yyyy=2020/mm=1", "yyyy=2020/mm=2", "yyyy=2021/mm=1"),
      got)
    // output schema matches Spark's native command
    assert(spark.sql(s"SHOW PARTITIONS graft.`$dir`").columns.toSeq ==
      Seq("partition"))
  }

  test("SHOW PARTITIONS: clustered tables from stats; unpartitioned refuses") {
    // dynamic-overwrite layout: tuple-pure files → metadata-only answer
    val t = GraftTable(spark, Files.createTempDirectory("graft-showp2").toString)
    t.overwritePartitioned(
      Seq((1L, "x", "d1"), (2L, "y", "d2"), (3L, "z", null))
        .toDF("k", "v", "day"),
      Seq("day"), Seq("k"))
    GraftCatalog.register(spark, "demo", "showp_t", t)
    val got = spark.sql("SHOW PARTITIONS demo.showp_t").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("day=__HIVE_DEFAULT_PARTITION__", "day=d1", "day=d2"),
      got)
    // range-clustered files SPANNING values (50 values into ≤32 files)
    // still answer exactly — the pruned-scan fallback
    val t2 = GraftTable(spark, Files.createTempDirectory("graft-showp3").toString)
    t2.overwritePartitioned(
      (1L to 200L).map(i => (i, f"g${i % 50}%02d")).toDF("k", "p"),
      Seq("p"), Seq("k"))
    GraftCatalog.register(spark, "demo", "showp_t2", t2)
    val got2 = spark.sql("SHOW PARTITIONS demo.showp_t2").collect()
      .map(_.getString(0)).toSeq
    assert(got2 == (0 until 50).map(i => f"p=g$i%02d"), got2)
    // unpartitioned: loud refusal, Spark-native parity
    val t3 = GraftTable(spark, Files.createTempDirectory("graft-showp4").toString)
    t3.overwrite(Seq((1L, "a")).toDF("k", "v"), Some("k"))
    GraftCatalog.register(spark, "demo", "showp_t3", t3)
    val e = intercept[Exception](spark.sql("SHOW PARTITIONS demo.showp_t3"))
    assert(e.getMessage.contains("not partitioned"), e.getMessage)
  }

  test("SHOW PARTITIONS tracks DML: a fully-deleted pv tuple disappears") {
    val dir = Files.createTempDirectory("graft-showp5").toString + "/t"
    Seq((1L, 10), (2L, 20), (3L, 30), (4L, 10)).toDF("k", "p")
      .write.partitionBy("p").parquet(dir)
    val t = GraftTable.convertParquet(spark, dir, Seq("k"), Seq("p" -> "INT"))
    t.delete("p = 20")
    val got = spark.sql(s"SHOW PARTITIONS graft.`$dir`").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("p=10", "p=30"), got)
    // an appended NEW tuple appears (metadata-only answer both times)
    t.appendStats(Seq((5L, 40)).toDF("k", "p"), Seq("k"))
    val got2 = spark.sql(s"SHOW PARTITIONS graft.`$dir`").collect()
      .map(_.getString(0)).toSeq
    assert(got2 == Seq("p=10", "p=30", "p=40"), got2)
  }

  test("SHOW CREATE TABLE round-trips schema, partitioning and constraints") {
    val tmp = Files.createTempDirectory("graft-showcr").toString
    spark.sql(
      s"""CREATE TABLE graft.`$tmp/src` (
         |  `id` BIGINT NOT NULL COMMENT 'row id',
         |  `price` DOUBLE,
         |  `day` STRING)
         |USING graft
         |PARTITIONED BY (`day`)
         |TBLPROPERTIES (
         |  'graft.autoCompact' = 'true',
         |  'graft.constraints.price_pos' = 'price > 0')""".stripMargin)
    val t = GraftTable(spark, s"$tmp/src")
    // the constraint-namespace property became a REAL check at create
    assert(t.checks == Map("price_pos" -> "price > 0"))
    assert(t.properties.get("graft.autoCompact").contains("true"))
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$tmp/src`")
      .head().getString(0)
    assert(ddl.contains("`id` BIGINT NOT NULL COMMENT 'row id'"), ddl)
    assert(ddl.contains("PARTITIONED BY (`day`)"), ddl)
    assert(ddl.contains("'graft.constraints.price_pos' = 'price > 0'"), ddl)
    // the rendered statement is RUNNABLE: re-execute at a fresh location
    // and get a semantically identical table (schema, layout, checks)
    spark.sql(ddl.replace(s"$tmp/src", s"$tmp/copy"))
    val c = GraftTable(spark, s"$tmp/copy")
    assert(c.latestManifest.get.schema == t.latestManifest.get.schema)
    assert(c.latestManifest.get.partitionCols == Some(Seq("day")))
    assert(c.checks == Map("price_pos" -> "price > 0"))
    assert(c.properties.get("graft.autoCompact").contains("true"))
    // ...and the copy's own rendering matches modulo the root path
    val ddl2 = spark.sql(s"SHOW CREATE TABLE graft.`$tmp/copy`")
      .head().getString(0)
    assert(ddl2 == ddl.replace(s"$tmp/src", s"$tmp/copy"), ddl2)
    // the round-tripped check GATES writes
    intercept[Exception] {
      c.append(Seq((1L, -1.0, "d1")).toDF("id", "price", "day"), Some("id"))
    }
    // UNSET of the constraint key drops the check, not a property
    spark.sql(s"ALTER TABLE graft.`$tmp/copy` UNSET TBLPROPERTIES " +
      "('graft.constraints.price_pos')")
    assert(c.checks.isEmpty)
  }

  test("SHOW CREATE TABLE: converted pv table and registered idents") {
    val tmp = Files.createTempDirectory("graft-showcr2").toString
    val dir = s"$tmp/t"
    Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(dir)
    GraftTable.convertParquet(spark, dir, Seq("k"), Seq("p" -> "INT"))
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$dir`").head().getString(0)
    // pv layout renders like any partitioned table; partition col typed
    assert(ddl.contains("PARTITIONED BY (`p`)"), ddl)
    assert(ddl.contains("`p` INT"), ddl)
    // a registered ident resolves to the same statement
    val t = GraftTable(spark, dir)
    GraftCatalog.register(spark, "demo", "show_create_t", t)
    assert(spark.sql("SHOW CREATE TABLE demo.show_create_t")
      .head().getString(0) == ddl)
    // SHOW TBLPROPERTIES lists a constraint under its property spelling
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT kp CHECK (k < 100)")
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$dir`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.constraints.kp").contains("k < 100"), props)
  }

  test("DESCRIBE TABLE and SHOW COLUMNS: columns, partition section, detail") {
    val tmp = Files.createTempDirectory("graft-desc").toString
    spark.sql(
      s"""CREATE TABLE graft.`$tmp/t` (
         |  `id` BIGINT NOT NULL COMMENT 'row id',
         |  `v` STRING, `day` STRING)
         |USING graft PARTITIONED BY (day)
         |TBLPROPERTIES ('graft.autoCompact' = 'true')""".stripMargin)
    val rows = spark.sql(s"DESCRIBE TABLE graft.`$tmp/t`").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.take(3) == Seq(
      ("id", "bigint", "row id"), ("v", "string", null),
      ("day", "string", null)), rows)
    assert(rows.contains(("# Partition Information", "", "")))
    assert(rows.last == ("day", "string", null))
    // EXTENDED appends the detail section from manifest metadata
    val ext = spark.sql(s"DESC EXTENDED graft.`$tmp/t`").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext.get("Provider").contains("graft"))
    assert(ext.get("Location").contains(s"$tmp/t"))
    assert(ext.get("Partition Layout").contains("clustered"))
    assert(ext("Table Properties").contains("graft.autoCompact=true"))
    // SHOW COLUMNS: names only, declaration order; works on idents too
    assert(spark.sql(s"SHOW COLUMNS FROM graft.`$tmp/t`").collect()
      .map(_.getString(0)).toSeq == Seq("id", "v", "day"))
    val t = GraftTable(spark, s"$tmp/t")
    GraftCatalog.register(spark, "demo", "desc_t", t)
    assert(spark.sql("SHOW COLUMNS IN demo.desc_t").collect()
      .map(_.getString(0)).toSeq == Seq("id", "v", "day"))
    // a converted pv table reports hive-import layout
    val dir = s"$tmp/pv"
    Seq((1L, 10), (2L, 20)).toDF("k", "p").write.partitionBy("p").parquet(dir)
    GraftTable.convertParquet(spark, dir, Seq("k"), Seq("p" -> "INT"))
    val pvExt = spark.sql(s"DESCRIBE EXTENDED graft.`$dir`").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(pvExt.get("Partition Layout").contains("hive-import (pv)"))
    // native DESCRIBE statements that are NOT graft targets still work
    spark.sql("SELECT 1 AS one").createOrReplaceTempView("desc_nat")
    assert(spark.sql("DESCRIBE desc_nat").collect().nonEmpty)
  }

  test("ANALYZE TABLE fills catalog stats (CBO) — count rides the metadata path") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ana").toString + "/t"
    val t = GraftTable(spark, root)
    t.overwriteStats((1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))
    GraftCatalog.register(spark, "anadb", "tt", t)
    // Spark's native ANALYZE works end-to-end on a registered graft
    // table: sizeInBytes from the manifest-backed relation, rowCount
    // through the metadata-aggregate rule (count(*) = LocalRelation,
    // no file opened), column stats through the normal scan
    spark.sql("ANALYZE TABLE anadb.tt COMPUTE STATISTICS")
    def stats = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("anadb.tt")).stats.get
    assert(stats.rowCount.contains(BigInt(1000)))
    assert(stats.sizeInBytes > 0)
    spark.sql("ANALYZE TABLE anadb.tt COMPUTE STATISTICS FOR COLUMNS k")
    val cs = stats.colStats("k")
    assert(cs.distinctCount.contains(BigInt(1000)) &&
      cs.min.contains("1") && cs.max.contains("1000") &&
      cs.nullCount.contains(BigInt(0)))
    // stats track new data on re-analyze
    t.appendStats((1001 to 1200).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"))
    spark.sql("ANALYZE TABLE anadb.tt COMPUTE STATISTICS")
    assert(stats.rowCount.contains(BigInt(1200)))
  }

  test("CBO: manifest-derived histogram fixes skew misestimation with zero scan") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cbo-hist").toString
    val fact = GraftTable(spark, s"$tmp/fact")
    fact.overwriteStats((1 to 50000).map(i =>
      (i.toLong, "x" * 60)).toDF("k", "pad"), Seq("k"))
    // dim: HEAVILY skewed on k — 49,900 rows packed into [1, 100], only
    // 100 rows spread across (100, 50000]. The query keeps the tiny tail
    // (k > 100): with min/max alone the uniform assumption estimates
    // ~99.8% of the rows survive, so the join must not broadcast; the
    // per-file ranges (clustered write) see the skew exactly.
    val skewed = (1 to 49900).map(i => ((i % 100) + 1L, s"d$i")) ++
      (1 to 100).map(i => (100L + i.toLong * 499L, s"t$i"))
    val dim = GraftTable(spark, s"$tmp/dim")
    // the mixture model is as sharp as the file clustering: write the
    // dim range-clustered so the tail lands in its own file(s) (at lake
    // scale the clustered write funnels give this for free)
    dim.overwriteStats(
      skewed.toDF("k", "name").repartitionByRange(32, col("k")), Seq("k"))
    GraftCatalog.register(spark, "cbohdb", "fact", fact)
    GraftCatalog.register(spark, "cbohdb", "dim", dim)
    val q = "SELECT f.k, d.name FROM cbohdb.fact f " +
      "JOIN cbohdb.dim d ON f.k = d.k WHERE d.k > 100"
    def joinNode(): String = {
      val p = spark.sql(q).queryExecution.sparkPlan.toString
      if (p.contains("BroadcastHashJoin")) "broadcast"
      else if (p.contains("SortMergeJoin")) "sortmerge"
      else p
    }
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.sql("ANALYZE TABLE cbohdb.fact COMPUTE STATISTICS")
      // Spark's own FOR COLUMNS (a full scan!) gives min/max + ndv — and
      // the uniform estimate over [1, 50000] keeps the dim shuffled
      spark.sql("ANALYZE TABLE cbohdb.dim COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbohdb.dim COMPUTE STATISTICS FOR COLUMNS k, name")
      assert(joinNode() == "sortmerge",
        "min/max alone must misestimate the skewed tail as huge")
      // manifest-derived stats: ZERO data files opened, and the
      // equi-height histogram built from per-file ranges sees the skew —
      // k > 100 estimates ~100 rows, under the threshold
      val got = graft.sources.ManifestStats.analyze(
        spark, "cbohdb", "dim", dim, Seq("k", "name"))
      assert(got.contains("k"), s"k must receive manifest stats, got $got")
      assert(joinNode() == "broadcast",
        "the manifest histogram must flip the skewed-tail filter to broadcast")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CBO: manifest stats auto-refresh on commit churn — no manual re-ANALYZE needed") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cbo-auto").toString
    val fact = GraftTable(spark, s"$tmp/fact")
    fact.overwriteStats((1 to 50000).map(i =>
      (i.toLong, "x" * 60)).toDF("k", "pad"), Seq("k"))
    // dim starts SKEWED exactly like the plan-flip witness: k > 100 is a
    // tiny tail, so the histogram says broadcast
    val skewed = (1 to 49900).map(i => ((i % 100) + 1L, s"d$i")) ++
      (1 to 100).map(i => (100L + i.toLong * 499L, s"t$i"))
    val dim = GraftTable(spark, s"$tmp/dim")
    dim.overwriteStats(
      skewed.toDF("k", "name").repartitionByRange(32, col("k")), Seq("k"))
    GraftCatalog.register(spark, "cboadb", "fact", fact)
    GraftCatalog.register(spark, "cboadb", "dim", dim)
    val q = "SELECT f.k, d.name FROM cboadb.fact f " +
      "JOIN cboadb.dim d ON f.k = d.k WHERE d.k > 100"
    def joinNode(): String = {
      val p = spark.sql(q).queryExecution.sparkPlan.toString
      if (p.contains("BroadcastHashJoin")) "broadcast"
      else if (p.contains("SortMergeJoin")) "sortmerge"
      else p
    }
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.sql("ANALYZE TABLE cboadb.fact COMPUTE STATISTICS")
      graft.sources.ManifestStats.analyze(
        spark, "cboadb", "dim", dim, Seq("k", "name"))
      assert(joinNode() == "broadcast", "the skewed tail starts broadcastable")
      // skew-shifting DML: the tail becomes the BULK of the table. A
      // stale histogram would keep claiming ~100 rows and wrongly
      // broadcast a huge build side; the commit's churn (>10% rows)
      // must auto-refresh the stats with no manual re-ANALYZE.
      dim.appendStats((1 to 60000).map(i =>
        (101L + i.toLong, s"big$i")).toDF("k", "name")
        .repartitionByRange(32, col("k")), Seq("k"))
      assert(joinNode() == "sortmerge",
        "auto-refreshed stats must see the grown tail and stop broadcasting")
      // ...and the flip survives shrinking back: deleting the bulk is
      // churn again, the refreshed histogram re-wins the broadcast
      dim.delete("k > 100 AND name LIKE 'big%'")
      assert(joinNode() == "broadcast",
        "auto-refreshed stats must re-win the broadcast after the shrink")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CBO: manifest stats never fake ndv — strings/fractionals report distinctCount None") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cbo-ndv").toString
    val t = GraftTable(spark, s"$tmp/t")
    // a 3-value status column over 10k rows: the manifest carries NO
    // distinctness signal for strings, so reporting rowCount as ndv
    // would claim full distinctness and underestimate join output by
    // orders of magnitude — the CBO must see None instead
    t.overwriteStats((1 to 10000).map(i =>
      (i.toLong, Seq("new", "open", "done")(i % 3), i / 100.0))
      .toDF("k", "status", "score"), Seq("k", "status", "score"))
    GraftCatalog.register(spark, "ndvdb", "t", t)
    val got = graft.sources.ManifestStats.analyze(
      spark, "ndvdb", "t", t, Seq("k", "status", "score"))
    assert(got.toSet == Set("k", "status", "score"))
    val cs = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("ndvdb.t"))
      .stats.get.colStats
    assert(cs("k").distinctCount.exists(_ <= BigInt(10000)) &&
      cs("k").distinctCount.exists(_ > BigInt(0)),
      "integral ndv stays width-bounded")
    assert(cs("status").distinctCount.isEmpty,
      s"string ndv must be unknown, got ${cs("status").distinctCount}")
    assert(cs("score").distinctCount.isEmpty,
      s"fractional ndv must be unknown, got ${cs("score").distinctCount}")
    // min/max and the numeric histogram still serve range estimation
    assert(cs("status").min.isDefined && cs("status").max.isDefined)
    assert(cs("score").histogram.isDefined)
  }

  test("CBO: ANALYZE FOR COLUMNS stats flip a join to broadcast") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cbo").toString
    // fact: wide enough that it is never the broadcast side
    val fact = GraftTable(spark, s"$tmp/fact")
    fact.overwriteStats((1 to 50000).map(i =>
      (i.toLong, "x" * 60)).toDF("k", "pad"), Seq("k"))
    // dim: ~50k rows whose UNFILTERED size exceeds the broadcast
    // threshold below; the query filters it to k <= 100 (0.2%)
    val dim = GraftTable(spark, s"$tmp/dim")
    dim.overwriteStats((1 to 50000).map(i =>
      (i.toLong, s"d$i")).toDF("k", "name"), Seq("k"))
    GraftCatalog.register(spark, "cbodb", "fact", fact)
    GraftCatalog.register(spark, "cbodb", "dim", dim)
    val q = "SELECT f.k, d.name FROM cbodb.fact f " +
      "JOIN cbodb.dim d ON f.k = d.k WHERE d.k <= 100"
    def joinNode(): String = {
      val p = spark.sql(q).queryExecution.sparkPlan.toString
      if (p.contains("BroadcastHashJoin")) "broadcast"
      else if (p.contains("SortMergeJoin")) "sortmerge"
      else p
    }
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // row counts alone: the filtered dim still ESTIMATES at full size
      // (no column stats → no selectivity), so the join stays shuffled
      spark.sql("ANALYZE TABLE cbodb.fact COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbodb.dim COMPUTE STATISTICS")
      assert(joinNode() == "sortmerge",
        s"without column stats the 50k-row dim must not broadcast")
      // column min/max + ndv: k <= 100 over [1, 50000] estimates ~0.2%
      // of the rows — under the threshold, so CBO flips the build side
      spark.sql("ANALYZE TABLE cbodb.dim COMPUTE STATISTICS FOR COLUMNS k, name")
      assert(joinNode() == "broadcast",
        "column stats must flip the filtered dim to the broadcast side")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
