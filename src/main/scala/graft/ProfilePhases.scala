package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** r19 measurement harness (guide §1): re-runs the EXPENSIVE pipeline
  * queries' bodies step by step with wall-clock stamps, so optimization
  * targets the step that actually costs, not the one that looks costly.
  * Results are printed as `[phase] <name> <sec>`. Not part of the bench
  * contract; local measurement only.
  *
  * Usage: runMain graft.ProfilePhases [sfDir] [which]
  */
object ProfilePhases {
  private var t0 = System.nanoTime()
  private def mark(name: String): Unit = {
    val t1 = System.nanoTime()
    println(f"[phase] $name%-42s ${(t1 - t0) / 1e9}%8.3f s")
    t0 = t1
  }

  def q111(spark: SparkSession, dir: String): Unit = {
    import graft.pipeline.{ConfigStore, Entity, SilverLoader, SyncRunner}
    import graft.sources.GraftTable
    val orders = Tables.table(spark, dir, "orders")
    val tmp = Files.createTempDirectory("graft-prof111").toString
    val subset = orders.filter(col("o_orderkey") % 4 =!= 0)
    val grown = subset.unionByName(
      orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_orderdate",
          (col("o_orderdate") + expr("INTERVAL 3000 DAYS")).cast("timestamp_ntz")))
    t0 = System.nanoTime()
    val config = new ConfigStore(spark, s"$tmp/control")
    config.registerEntities(Seq(Entity(
      1L, "orders_inc", "demo.orders_inc", "src", "silver",
      "TMSTP", Some("o_orderdate"), "o_orderkey")))
    val martConfig = new ConfigStore(spark, s"$tmp/control-gold")
    martConfig.registerEntities(Seq(Entity(
      99L, "gold", "mart.gold", "gold", "mart", "CT", None, "_row_id")))
    subset.write.mode("overwrite").parquet(s"$tmp/src/orders_inc.parquet")
    mark("setup: config + src write")
    val loader = new SilverLoader(spark, config, s"$tmp/src", s"$tmp/silver",
      publishChangeFeed = true, rowTracking = true)
    loader.run()
    mark("loader.run round 1 (full load)")
    val silverRoot = s"$tmp/silver/demo.orders_inc"
    def mirror() = new graft.streaming.StreamingGoldMirror(
      spark, silverRoot, s"$tmp/gold", s"$tmp/ckpt",
      storedIdCol = Some("silver_sk"))
    val sup1 = mirror().startSupervised()
    sup1.processAllAvailable(); sup1.stop()
    mark("gold bootstrap drain 1")
    val gold = GraftTable(spark, s"$tmp/gold")
    val mart = GraftTable(spark, s"$tmp/mart")
    gold.enableRowTracking()
    mark("gold.enableRowTracking")
    new SyncRunner(spark, martConfig, gold, mart, 99L).runOnce()
    mark("mart bootstrap (SyncRunner)")
    grown.write.mode("overwrite").parquet(s"$tmp/src/orders_inc.parquet")
    config.openWatermark(1L, "TMSTP", "2098-01-01 00:00:00")
    mark("setup: grown src + orphan open")
    loader.run()
    mark("loader.run round 2 (incremental)")
    val sup2 = mirror().startSupervised()
    sup2.processAllAvailable(); sup2.stop()
    mark("gold drain 2")
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    commits.last.delete()
    new java.io.File(s"$tmp/ckpt/commits/.${commits.last.getName}.crc").delete()
    mark("setup: drop checkpoint commit")
    val sup3 = mirror().startSupervised()
    sup3.processAllAvailable(); sup3.stop()
    mark("gold drain 3 (replay)")
    val runner = new SyncRunner(spark, martConfig, gold, mart, 99L)
    try runner.runOnceImpl(crashBeforeClose = true)
    catch { case _: graft.pipeline.SimulatedCrash => }
    mark("mart sync (crash before close)")
    new SyncRunner(spark, martConfig, gold, mart, 99L).runOnce()
    mark("mart sync resume")
    val n = mart.snapshot.count()
    mark(s"mart count ($n rows)")
  }

  def q57(spark: SparkSession, dir: String): Unit = {
    import graft.sources.GraftTable
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .filter(col("o_orderdate") < "1996-01-01")
    t0 = System.nanoTime()
    val t = GraftTable(spark, Files.createTempDirectory("graft-prof57").toString)
    t.overwrite(orders.filter(col("o_orderkey") % 4 === 0), Some("o_orderkey"))
    t.overwrite(orders.filter(col("o_orderkey") % 9 === 0), Some("o_orderkey"))
    mark("setup: two overwrites")
    val bronze = Files.createTempDirectory("graft-prof57-b").toString + "/orders"
    t.exportSnapshot(1, bronze, "o_orderdate")
    mark("exportSnapshot (writeDatePartitioned)")
    val n = spark.read.parquet(bronze).count()
    mark(s"re-read bronze ($n rows)")
    // variant: explicit partition count on the pre-write shuffle — does
    // AQE collapse the keyed repartition to 1 task on tiny local data?
    val bronze2 = Files.createTempDirectory("graft-prof57-c").toString + "/orders"
    val df = t.snapshotAt(1)
      .withColumn("yyyy", date_format(col("o_orderdate"), "yyyy"))
      .withColumn("MM", date_format(col("o_orderdate"), "MM"))
      .withColumn("dd", date_format(col("o_orderdate"), "dd"))
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("yyyy"), col("MM"), col("dd"))
    df.write.mode("overwrite").partitionBy("yyyy", "MM", "dd").parquet(bronze2)
    mark("variant: explicit-n repartition write")
  }

  /** Micro-costs of the primitives every pipeline query composes. */
  def micro(spark: SparkSession, dir: String): Unit = {
    import graft.pipeline.ConfigStore
    import graft.sources.GraftTable
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    t0 = System.nanoTime()
    val base = Files.createTempDirectory("graft-prof-micro").toString
    val t = GraftTable(spark, s"$base/t")
    t.overwrite(orders, Some("o_orderkey"))
    mark("overwrite 150k rows (stats)")
    t.enableRowTracking()
    mark("enableRowTracking")
    val batch = orders.filter(col("o_orderkey") % 4 === 1)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.merge(batch, Seq("o_orderkey")).whenMatchedUpdateAll()
      .whenNotMatchedInsertAll().execute()
    mark("merge 37k batch (updateAll/insertAll)")
    t.merge(batch, Seq("o_orderkey")).whenMatchedUpdateAll()
      .whenNotMatchedInsertAll().withChangeFeed().execute()
    mark("merge 37k batch + change feed")
    val changed = t.changedSince(2L)
    val nc = changed.count()
    mark(s"changedSince(2) count=$nc")
    val deleted = t.deletedSince(2L)
    val nd = deleted.count()
    mark(s"deletedSince(2) count=$nd")
    val mirror = GraftTable(spark, s"$base/mirror")
    mirror.overwriteStats(
      t.snapshotWithRowIds.drop(GraftTable.RowCommitOut),
      Seq(GraftTable.RowIdOut))
    mark("mirror bootstrap overwrite (withRowIds)")
    t.update(Map("o_totalprice" -> "o_totalprice + 1"), "o_orderkey % 9 = 1")
    mark("update (COW) 1/9 of rows")
    t.syncMirror(mirror, 4L)
    mark("syncMirror (1 update window)")
    val cs = new ConfigStore(spark, s"$base/control")
    val id = cs.openWatermark(7L, "CT", "5")
    mark("openWatermark")
    cs.closeWatermark(id)
    mark("closeWatermark")
    val id2 = cs.openWatermark(7L, "CT", "6")
    mark("openWatermark 2")
    cs.closeWatermark(id2)
    mark("closeWatermark 2")
    cs.vacuumControlPlane()
    mark("vacuumControlPlane")
    val n = t.snapshot.count()
    mark(s"snapshot count ($n)")
  }

  /** Job-level breakdown of ONE merge and ONE syncMirror: a listener
    * logs every Spark job's duration + first stage name, exposing how
    * many jobs each primitive launches and which dominate.
    */
  def jobs(spark: SparkSession, dir: String): Unit = {
    import graft.sources.GraftTable
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val base = Files.createTempDirectory("graft-prof-jobs").toString
    val t = GraftTable(spark, s"$base/t")
    t.overwrite(orders, Some("o_orderkey"))
    t.enableRowTracking()
    val mirror = GraftTable(spark, s"$base/mirror")
    mirror.overwriteStats(
      t.snapshotWithRowIds.drop(GraftTable.RowCommitOut),
      Seq(GraftTable.RowIdOut))
    val batch = orders.filter(col("o_orderkey") % 4 === 1)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    // warm: one merge first so JIT/codegen is paid
    t.merge(batch, Seq("o_orderkey")).whenMatchedUpdateAll()
      .whenNotMatchedInsertAll().execute()

    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = js.stageInfos.headOption.map(_.name).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), s"$desc | $site"))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (s, what) =>
          jobLog.add(f"[job] ${(System.nanoTime() - s) / 1e9}%7.3f s  #${je.jobId}%-4d $what")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t0 = System.nanoTime()
    t.merge(batch, Seq("o_orderkey")).whenMatchedUpdateAll()
      .whenNotMatchedInsertAll().execute()
    mark("MERGE total")
    Thread.sleep(500)
    println("---- merge jobs ----")
    jobLog.forEach(l => println(l)); jobLog.clear()
    t0 = System.nanoTime()
    t.syncMirror(mirror, 3L)
    mark("SYNCMIRROR total")
    Thread.sleep(500)
    println("---- syncMirror jobs ----")
    jobLog.forEach(l => println(l))
    spark.sparkContext.removeSparkListener(listener)
  }

  /** Action-level breakdown (QueryExecutionListener): every Spark SQL
    * action run inside one merge / one syncMirror / one loader round,
    * with its duration and a one-line plan head — attributes wall time
    * to the specific probe/join/write instead of anonymous job ids.
    */
  def sql(spark: SparkSession, dir: String): Unit = {
    import graft.sources.GraftTable
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val base = Files.createTempDirectory("graft-prof-sql").toString
    val t = GraftTable(spark, s"$base/t")
    t.overwrite(orders, Some("o_orderkey"))
    t.enableRowTracking()
    val mirror = GraftTable(spark, s"$base/mirror")
    mirror.overwriteStats(
      t.snapshotWithRowIds.drop(GraftTable.RowCommitOut),
      Seq(GraftTable.RowIdOut))
    val batch = orders.filter(col("o_orderkey") % 4 === 1)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.merge(batch, Seq("o_orderkey")).whenMatchedUpdateAll()
      .whenNotMatchedInsertAll().execute() // warm
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val head = qe.executedPlan.toString.linesIterator
          .take(3).map(_.take(110)).mkString(" | ")
        log.add(f"[sql] ${durationNs / 1e9}%7.3f s  $funcName%-18s $head")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    t0 = System.nanoTime()
    t.merge(batch, Seq("o_orderkey")).whenMatchedUpdateAll()
      .whenNotMatchedInsertAll().withChangeFeed().execute()
    mark("MERGE+CDF total")
    Thread.sleep(1000)
    println("---- merge+cdf actions ----")
    log.forEach(l => println(l)); log.clear()
    t0 = System.nanoTime()
    t.syncMirror(mirror, 3L)
    mark("SYNCMIRROR total")
    Thread.sleep(1000)
    println("---- syncMirror actions ----")
    log.forEach(l => println(l)); log.clear()
    spark.listenerManager.unregister(listener)
  }

  /** Cost of the row-id read funnel vs a plain scan of the same files. */
  def idread(spark: SparkSession, dir: String): Unit = {
    import graft.sources.GraftTable
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val base = Files.createTempDirectory("graft-prof-idread").toString
    val t = GraftTable(spark, s"$base/t")
    t.overwrite(orders, Some("o_orderkey"))
    t.enableRowTracking()
    for (round <- 1 to 2) {
      t0 = System.nanoTime()
      var n = t.snapshot.count()
      mark(s"round $round: snapshot (plain) count=$n")
      n = t.snapshotWithRowIds.count()
      mark(s"round $round: snapshotWithRowIds count=$n")
      val raw = spark.read.parquet(s"$base/t/data/*")
      n = raw.count()
      mark(s"round $round: raw parquet count=$n")
      n = raw.withColumn("__fp", col("_metadata.file_path"))
        .withColumn("__pos", col("_metadata.row_index"))
        .groupBy("__fp").count().count()
      mark(s"round $round: raw + metadata cols")
      n = raw.withColumn("__rel",
        regexp_replace(
          regexp_replace(url_decode(regexp_replace(
            col("_metadata.file_path"), "\\+", "%2B")), "^file:/+", "/"),
          "^" + java.util.regex.Pattern.quote(base) + "/", ""))
        .groupBy("__rel").count().count()
      mark(s"round $round: raw + relPathExpr regexes")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "q111"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup identical to Bench's so first-phase numbers are not JIT noise
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
      spark.range(1000).groupBy((col("id") % 7).as("k")).count().count()
    } catch { case _: Throwable => () }
    which match {
      case "q111" =>
        q111(spark, sfDir) // cold
        println("---- second run (warm) ----")
        q111(spark, sfDir)
      case "q57" =>
        q57(spark, sfDir)
        println("---- second run (warm) ----")
        q57(spark, sfDir)
      case "idread" =>
        idread(spark, sfDir)
      case "jobs" =>
        jobs(spark, sfDir)
      case "sql" =>
        sql(spark, sfDir)
      case "q111sql" =>
        q111(spark, sfDir) // warm first
        val born = System.nanoTime()
        val listener = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val at = (System.nanoTime() - born) / 1e9
            val head = qe.executedPlan.toString.linesIterator
              .take(1).map(_.take(90)).mkString
            println(f"[sql] t=$at%8.3f ${durationNs / 1e9}%7.3f s  $funcName%-10s $head")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        }
        spark.listenerManager.register(listener)
        println(f"[phase-clock] start t=0.000 (warm run)")
        t0 = born
        q111(spark, sfDir)
        Thread.sleep(1500)
        spark.listenerManager.unregister(listener)
      case "micro" =>
        micro(spark, sfDir)
        println("---- second run (warm) ----")
        micro(spark, sfDir)
      case other => println(s"unknown profile target: $other")
    }
    spark.stop()
  }
}
