package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** `spark.readStream.format("graft")` streaming SOURCE: initial
  * snapshot + per-commit tail, checkpoint restart-resume, append-only
  * enforcement with the ignoreChanges escape, startingVersion, and
  * maintenance commits never re-serving rows.
  */
class StreamingSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-ssrc").toString

  test("initial snapshot + tail equals the batch answer across commits") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 10L).map(i => (i, i * 2.0)).toDF("k", "v"), Some("k"))
    t.append((11L to 15L).map(i => (i, i * 2.0)).toDF("k", "v"), Some("k"))

    val q = spark.readStream.format("graft").load(s"$dir/t")
      .groupBy().agg(count(lit(1)).as("n"), sum("v").as("s"))
      .writeStream.format("memory").queryName("ssrc_agg")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("ssrc_agg").head()
      // snapshot at stream start covers BOTH commits
      assert(r1.getLong(0) == 15 && r1.getDouble(1) == (1 to 15).map(_ * 2.0).sum)
    } finally q.stop()

    // two more append commits, restart from checkpoint: only the tail
    // is served (offset = version, so re-serving the snapshot would
    // double-count into the complete-mode aggregate... it cannot: the
    // aggregate state is checkpointed, re-served rows WOULD inflate it)
    t.append(Seq((16L, 32.0)).toDF("k", "v"), Some("k"))
    t.append(Seq((17L, 34.0)).toDF("k", "v"), Some("k"))
    val q2 = spark.readStream.format("graft").load(s"$dir/t")
      .groupBy().agg(count(lit(1)).as("n"), sum("v").as("s"))
      .writeStream.format("memory").queryName("ssrc_agg2")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q2.processAllAvailable()
      val r2 = spark.table("ssrc_agg2").head()
      assert(r2.getLong(0) == 17, s"restart must resume, not re-snapshot: $r2")
      assert(r2.getDouble(1) == (1 to 17).map(_ * 2.0).sum)
    } finally q2.stop()
  }

  test("update commit fails the stream; ignoreChanges serves rewritten files") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 8L).map(i => (i, "x")).toDF("k", "v"), Some("k"))

    // parquet sink: the fault-tolerant sink append streams can resume
    // from a checkpoint with (memory sink recovery is complete-mode only)
    def runOnce(name: String, ignore: Boolean): Either[Throwable, Long] = {
      val reader = spark.readStream.format("graft")
      val q = (if (ignore) reader.option("ignoreChanges", "true") else reader)
        .load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out_$name")
        .option("checkpointLocation", s"$dir/ckpt_$name")
        .start()
      try {
        q.processAllAvailable()
        Right(spark.read.parquet(s"$dir/out_$name").count())
      } catch { case e: Throwable => Left(e) } finally q.stop()
    }
    def causes(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq

    assert(runOnce("a", ignore = false) == Right(8L)) // initial snapshot
    t.update(Map("v" -> "'y'"), "k = 3") // rewrites a file
    // resume the SAME checkpoint: the tail sees the rewrite and fails
    val failed = runOnce("a", ignore = false)
    assert(failed.isLeft &&
      causes(failed.swap.toOption.get).exists(_.contains("ignoreChanges")),
      s"data-changing commit must fail the append-only stream: $failed")

    // fresh stream WITH ignoreChanges: snapshot, then a mid-stream
    // update re-delivers only the rewritten file on resume
    assert(runOnce("b", ignore = true) == Right(8L))
    t.update(Map("v" -> "'z'"), "k = 4")
    val total = runOnce("b", ignore = true)
    assert(total.isRight && total.toOption.get > 8 && total.toOption.get < 16,
      s"expected only the rewritten file re-served, got $total")
    val tail = spark.read.parquet(s"$dir/out_b").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(tail.contains((4L, "z")), s"rewritten row must arrive: ${tail.toSeq}")
  }

  test("startingVersion skips the snapshot; compaction never re-serves") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 5L).map(i => (i, "a")).toDF("k", "v"), Some("k")) // v1
    t.append(Seq((6L, "b")).toDF("k", "v"), Some("k")) // v2
    t.append(Seq((7L, "c")).toDF("k", "v"), Some("k")) // v3

    def runOnce(startingVersion: Option[String]): Set[Long] = {
      val reader = spark.readStream.format("graft")
      val q = startingVersion.fold(reader)(reader.option("startingVersion", _))
        .load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out_sv")
        .option("checkpointLocation", s"$dir/ckpt_sv")
        .start()
      try {
        q.processAllAvailable()
        spark.read.parquet(s"$dir/out_sv").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }

    assert(runOnce(Some("3")) == Set(7L), "startingVersion=3 serves v3 only")

    // compaction (maintenance) then an append: resumed stream serves
    // ONLY the appended rows — compacted files must not re-deliver
    t.compact()
    t.append(Seq((8L, "d")).toDF("k", "v"), Some("k"))
    assert(runOnce(None) == Set(7L, 8L),
      "compaction must be dataChange=false for the stream")
  }

  test("ignoreDeletes skips delete-only commits (TRUNCATE) but not rewrites") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 6L).map(i => (i, "a")).toDF("k", "v"), Some("k"))

    def run(opts: Map[String, String]): Either[Throwable, Set[Long]] = {
      val reader = opts.foldLeft(spark.readStream.format("graft")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        q.processAllAvailable()
        Right(spark.read.parquet(s"$dir/out").collect().map(_.getLong(0)).toSet)
      } catch { case e: Throwable => Left(e) } finally q.stop()
    }
    val opts = Map("ignoreDeletes" -> "true")
    assert(run(opts) == Right((1L to 6L).toSet))
    // TRUNCATE (all files removed, none added) skips under ignoreDeletes
    t.truncate()
    t.append(Seq((7L, "b")).toDF("k", "v"), Some("k"))
    assert(run(opts) == Right((1L to 7L).toSet),
      "delete-only commit must be skipped, the append after it served")
    // a REWRITE (update: removes + adds) still fails under ignoreDeletes
    t.update(Map("v" -> "'z'"), "k = 7")
    val failed = run(opts)
    assert(failed.isLeft, s"rewrite must still fail under ignoreDeletes: $failed")
  }

  test("startingVersion=1 / timestamp before first commit serve everything") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"), Some("k")) // v1
    t.append(Seq((2L, "b")).toDF("k", "v"), Some("k")) // v2

    def run(conf: (String, String), name: String): Set[Long] = {
      val q = spark.readStream.format("graft")
        .option(conf._1, conf._2).load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out_$name")
        .option("checkpointLocation", s"$dir/ckpt_$name").start()
      try {
        q.processAllAvailable()
        spark.read.parquet(s"$dir/out_$name").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    // tailing from the very first version must not probe a v0 manifest
    assert(run("startingVersion" -> "1", "v1") == Set(1L, 2L),
      "startingVersion=1 tails every commit")
    // a timestamp cut at/before the first commit resolves to v1 — same path
    assert(run("startingTimestamp" -> "2000-01-01T00:00:00Z", "t0") ==
      Set(1L, 2L), "pre-history timestamp tails every commit")
  }

  test("restore: same-file-set is a stream no-op; changed set fails loudly") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 4L).map(i => (i, "a")).toDF("k", "v"), Some("k")) // v1
    t.append(Seq((5L, "b")).toDF("k", "v"), Some("k")) // v2

    def run(name: String): Either[Throwable, Set[Long]] = {
      val q = spark.readStream.format("graft").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out_$name")
        .option("checkpointLocation", s"$dir/ckpt_$name").start()
      try {
        q.processAllAvailable()
        Right(spark.read.parquet(s"$dir/out_$name").collect()
          .map(_.getLong(0)).toSet)
      } catch { case e: Throwable => Left(e) } finally q.stop()
    }
    def causes(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq

    assert(run("r") == Right(Set(1L, 2L, 3L, 4L, 5L)))
    // restore to the CURRENT version: file set unchanged → empty unit,
    // the resumed stream sees no new data and does not fail
    t.restore(t.latestVersion.get) // v3, same files as v2
    t.append(Seq((6L, "c")).toDF("k", "v"), Some("k")) // v4
    assert(run("r") == Right((1L to 6L).toSet),
      "no-op restore must not break or re-serve")

    // restore back BEFORE the last append: the file set shrinks — the
    // stream cannot prove rows unchanged and must fail naming restore
    t.restore(2L)
    val failed = run("r")
    assert(failed.isLeft &&
      causes(failed.swap.toOption.get).exists(_.contains("RESTORE")),
      s"file-set-changing restore must fail loudly: $failed")
  }

  test("startingTimestamp tails from the first commit at-or-after the cut") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"), Some("k")) // v1
    Thread.sleep(1100)
    val cut = java.time.Instant.now().toString // between v1 and v2
    Thread.sleep(1100)
    t.append(Seq((2L, "b")).toDF("k", "v"), Some("k")) // v2

    def run(ts: String, name: String): Set[Long] = {
      val q = spark.readStream.format("graft")
        .option("startingTimestamp", ts).load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out_$name")
        .option("checkpointLocation", s"$dir/ckpt_$name").start()
      try {
        q.processAllAvailable()
        val files = new java.io.File(s"$dir/out_$name").listFiles()
        if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Set.empty
        else spark.read.parquet(s"$dir/out_$name").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    assert(run(cut, "mid") == Set(2L), "cut between commits serves only v2")
    // a cut past every commit behaves like startingVersion=latest
    assert(run(java.time.Instant.now().plusSeconds(3600).toString, "fut").isEmpty)
  }

  test("CDF mode: snapshot-as-inserts, stored feed, derived appends") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k")) // v1

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val snap = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(snap.toSet == Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)),
      s"snapshot must render as inserts at v1: ${snap.toSeq}")

    // stored feed (merge withChangeFeed) + a plain append (derived inserts)
    t.merge(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withChangeFeed().execute() // v2
    t.append(Seq((4L, "d")).toDF("k", "v"), Some("k")) // v3, no stored feed
    runOnce()
    val tail = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .filter(_._4 > 1L)
    assert(tail.toSet == Set(
      (2L, "b", "update_preimage", 2L), (2L, "B", "update_postimage", 2L),
      (3L, "c", "insert", 2L), (4L, "d", "insert", 3L)),
      s"stored + derived tail: ${tail.toSeq}")
  }

  test("withRowIds CDF: a key-changing update pairs by _row_id across the streamed hop") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k")) // v1
    t.enableRowTracking() // v2
    val ids = t.snapshotWithRowIds().select("k", GraftTable.RowIdOut)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("withRowIds", "true")
        .load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    def rows() = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows().toSet == Set(
      (1L, "a", "insert", 2L, ids(1L)), (2L, "b", "insert", 2L, ids(2L))),
      s"snapshot inserts must carry COMPLETE ids: ${rows().toSeq}")

    // the exactness case identity exists for: an UPDATE that changes
    // the KEY still pairs its two images by one _row_id downstream —
    // key-paired consumers would misread it as delete+insert
    t.update(Map("k" -> "20"), "k = 2", changeFeed = true) // v3, stored feed
    t.append(Seq((4L, "d")).toDF("k", "v"), Some("k")) // v4, derived inserts
    runOnce()
    val id4 = t.snapshotWithRowIds().filter(col("k") === 4L)
      .select(GraftTable.RowIdOut).head().getLong(0)
    val tail = rows().filter(_._4 > 2L)
    assert(tail.toSet == Set(
      (2L, "b", "update_preimage", 3L, ids(2L)),
      (20L, "b", "update_postimage", 3L, ids(2L)),
      (4L, "d", "insert", 4L, id4)),
      s"identity-paired tail (one id across the key change): ${tail.toSeq}")

    // the streamed rows rebuild the table EXACTLY when applied by
    // identity — the silver→gold mirror a streaming hop runs
    val applied = spark.read.parquet(s"$dir/out")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(GraftTable.RowIdOut)
          .orderBy(col("_commit_version").desc,
            // postimage outranks its same-version preimage
            when(col("_change_type") === "update_postimage", 1)
              .when(col("_change_type") === "insert", 1).otherwise(0).desc)))
      .filter(col("__rn") === 1 && col("_change_type") =!= "delete" &&
        col("_change_type") =!= "update_preimage")
      .select("k", "v")
    val want = t.snapshot.select("k", "v")
    assert(applied.exceptAll(want).isEmpty && want.exceptAll(applied).isEmpty,
      "identity-applied change stream must reproduce the table")
  }

  test("withRowIds plain mode serves snapshot+tail ids; untracked tables refuse loudly") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"))
    // untracked: the option must fail loudly at stream build
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").option("withRowIds", "true")
        .load(s"$dir/t")
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => Option(c.getMessage).exists(_.contains("row tracking"))), e)
    t.enableRowTracking()
    t.append(Seq((3L, "c")).toDF("k", "v"), Some("k"))
    val q = spark.readStream.format("graft").option("withRowIds", "true")
      .load(s"$dir/t")
      .writeStream.format("memory").queryName("ssrc_rid")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssrc_rid")
        .select("k", GraftTable.RowIdOut, GraftTable.RowCommitOut).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = t.snapshotWithRowIds()
        .select("k", GraftTable.RowIdOut, GraftTable.RowCommitOut).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"streamed ids must equal the batch id read: $got vs $want")
    } finally q.stop()
  }

  test("CDF mode: a rewrite without a stored feed fails loudly") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"))
    def runOnce(): Option[Throwable] = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .start()
      try { q.processAllAvailable(); None }
      catch { case e: Throwable => Some(e) } finally q.stop()
    }
    assert(runOnce().isEmpty)
    t.update(Map("v" -> "'y'"), "k = 1") // rewrite, no change feed
    val err = runOnce()
    val msgs = err.toSeq.flatMap(e =>
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")))
    assert(msgs.exists(_.contains("no stored change feed")),
      s"expected the CDF gap error, got $err")
  }

  test("schema evolution vs the stream: historical back-read null-fills, mid-stream change fails loud") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"), Some("k")) // v1
    t.append(Seq((2L, "b")).toDF("k", "v")) // v2
    t.addColumn("w", "BIGINT") // v3 (maintenance — never served)
    t.append(Seq((3L, "c", 30L)).toDF("k", "v", "w")) // v4
    // a back-read across the ADD COLUMN serves HISTORICAL versions under
    // the latest schema, null-filled — never a schema error
    def run(): Option[Throwable] = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "1").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .start()
      try { q.processAllAvailable(); None }
      catch { case e: Throwable => Some(e) } finally q.stop()
    }
    // keep the FIRST query running: the mid-stream change must land
    // while its source (schema captured at start) is still live
    val q0 = spark.readStream.format("graft")
      .option("startingVersion", "1").load(s"$dir/t")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    q0.processAllAvailable()
    def outRows(): Set[(Long, Option[Long])] =
      spark.read.option("mergeSchema", "true").parquet(s"$dir/out")
        .select("k", "w").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
    assert(outRows() == Set((1L, None), (2L, None), (3L, Some(30L))),
      s"historical ADD COLUMN must null-fill, got ${outRows()}")
    // a change committed WHILE the stream runs fails the pending batch
    t.addColumn("z", "STRING")
    t.append(Seq((4L, "d", 40L, "zz")).toDF("k", "v", "w", "z"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q0.processAllAvailable()
    }
    q0.stop()
    val msgs = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(m => m.contains("added column") &&
      m.contains("restart the stream")),
      s"must name the drift and recovery, got: ${msgs.mkString(" | ")}")
    // the NEXT restart's source captures the evolved schema and replays
    // only the failed batch under it
    assert(run().isEmpty, "restart must replay the failed batch evolved")
    val z = spark.read.option("mergeSchema", "true").parquet(s"$dir/out")
      .filter(col("k") === 4L).select("z").collect().map(_.getString(0)).toSeq
    assert(z == Seq("zz"), s"got $z")
  }

  test("column reorder mid-stream is named 'reordered columns', not 'changed column types'") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"), Some("k"))
    // ignoreChanges so the overwrite is SERVED (and so reaches the
    // schema-stability check) instead of tripping the appends-only guard
    val q = spark.readStream.format("graft")
      .option("ignoreChanges", "true").load(s"$dir/t")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // same column set, same types — position only
      t.overwrite(Seq(("b", 2L)).toDF("v", "k"))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msgs = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null).map(c => Option(c.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("reordered columns")),
        s"a pure reorder must not read as a type change: ${msgs.mkString(" | ")}")
    } finally q.stop()
  }

  test("VACUUM past a pending offset fails with a named retention error; restart past the horizon succeeds") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k")) // v1
    def run(ckpt: String, opts: Map[String, String] = Map.empty): Option[Throwable] = {
      val q = opts.foldLeft(spark.readStream.format("graft")
          .option("readChangeFeed", "true")) { case (r, (k, v)) => r.option(k, v) }
        .load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$ckpt-out").option("checkpointLocation", ckpt)
        .start()
      try { q.processAllAvailable(); None }
      catch { case e: Throwable => Some(e) } finally q.stop()
    }
    assert(run(s"$dir/ckpt").isEmpty) // consumes the v1 snapshot
    // commits the stopped stream has NOT consumed yet...
    t.merge(Seq((3L, "c")).toDF("k", "v"), Seq("k"))
      .whenNotMatchedInsertAll().withChangeFeed().execute() // v2
    t.merge(Seq((4L, "d")).toDF("k", "v"), Seq("k"))
      .whenNotMatchedInsertAll().withChangeFeed().execute() // v3
    t.append(Seq((5L, "e")).toDF("k", "v")) // v4
    // ...are vacuumed out from under its checkpoint
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    val err = run(s"$dir/ckpt")
    val msgs = err.toSeq.flatMap(e =>
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")))
    assert(msgs.exists(m => m.contains("retention") && m.contains("Restart past the horizon")),
      s"expected the named retention error, got: ${msgs.mkString(" | ")}")
    // the named recovery works: drop the checkpoint and re-bootstrap —
    // the fresh stream serves the retained snapshot and tails from there
    assert(run(s"$dir/ckpt2").isEmpty)
    val rows = spark.read.parquet(s"$dir/ckpt2-out")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L, 3L, 4L, 5L),
      s"re-bootstrap must serve the full retained snapshot, got $rows")
  }

  test("maxFilesPerTrigger splits the snapshot into bounded batches") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 80L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartition(8), Some("k")) // 8 data files
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "3").load(s"$dir/t")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batches.synchronized {
            batches += ((id, df.collect().map(_.getLong(0)).toSet))
          }
          ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val nonEmpty = batches.filter(_._2.nonEmpty)
    assert(nonEmpty.size >= 3, s"8 files / cap 3 needs >= 3 batches: $batches")
    val all = nonEmpty.flatMap(_._2)
    assert(all.size == all.toSet.size, "no row may be served twice")
    assert(all.toSet == (1L to 80L).toSet, "every snapshot row exactly once")

    // tail under the same cap: an appended commit flows on resume
    batches.clear()
    t.append(Seq((81L, 81.0)).toDF("k", "v"), Some("k"))
    run()
    assert(batches.flatMap(_._2).toSet == Set(81L),
      s"resume must serve only the appended rows: $batches")
  }

  test("maxRowsPerTrigger budgets batches by manifest row counts") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartition(10), Some("k")) // ~10 rows/file
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("graft")
      .option("maxRowsPerTrigger", "25").load(s"$dir/t")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.synchronized { batches += df.count().toInt }
        ()
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nonEmpty = batches.filter(_ > 0)
    assert(nonEmpty.sum == 100, s"every row exactly once: $batches")
    assert(nonEmpty.size >= 4, s"100 rows / 25-row budget needs >= 4 batches: $batches")
    assert(nonEmpty.forall(_ <= 30),
      s"each batch within budget (+1-file slack): $batches")
  }

  test("maxBytesPerTrigger budgets batches by manifest file sizes") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartition(10), Some("k")) // 10 roughly equal files
    val files = t.filesOf(t.latestManifest.get)
    assert(files.forall(_.bytes.isDefined), "manifest records sizes")
    val perFile = files.map(_.bytes.get).max
    def drain(opts: Map[String, String]): Seq[Int] = {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
      val reader = opts.foldLeft(spark.readStream.format("graft")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val ckpt = Files.createTempDirectory("graft-ssrc-ck").toString
      val q = reader.load(s"$dir/t")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batches.synchronized { batches += df.count().toInt }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      batches.filter(_ > 0).toSeq
    }
    // budget = ~3 files' bytes → >= 4 batches, each <= 3 files + 1 slack
    val b3 = drain(Map("maxBytesPerTrigger" -> (perFile * 3).toString))
    assert(b3.sum == 100, s"every row exactly once: $b3")
    assert(b3.size >= 4, s"10 files / 3-file byte budget needs >= 4 batches: $b3")
    assert(b3.forall(_ <= 40), s"batches within budget (+1-file slack): $b3")
    // budget smaller than any single file: the progress guarantee still
    // admits exactly one file per batch — the stream drains, never stalls
    val b1 = drain(Map("maxBytesPerTrigger" -> "1"))
    assert(b1.sum == 100 && b1.size == 10,
      s"1-byte budget must drain one file per batch: $b1")
    // composition: the tightest budget governs — a loose byte budget
    // with maxFilesPerTrigger=2 behaves like the files cap...
    val bf = drain(Map(
      "maxBytesPerTrigger" -> (perFile * 8).toString,
      "maxFilesPerTrigger" -> "2"))
    assert(bf.size >= 5, s"files cap must govern: $bf")
    // ...and a tight byte budget under a loose files cap stays bytes-bound
    val bb = drain(Map(
      "maxBytesPerTrigger" -> (perFile * 2).toString,
      "maxFilesPerTrigger" -> "100",
      "maxRowsPerTrigger" -> "1000"))
    assert(bb.sum == 100 && bb.size >= 5 && bb.forall(_ <= 30),
      s"byte budget must govern under loose files/rows caps: $bb")
  }

  test("crash mid-snapshot with maxFilesPerTrigger: exact resume, no dupes") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    t.overwrite((1L to 60L).map(i => (i, "x")).toDF("k", "v")
      .repartition(6), Some("k")) // 6 files, cap 2 → 3 batches
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Either[Throwable, Unit] = {
      val q = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "2").load(s"$dir/t")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          // crash AFTER batch 0 committed, BEFORE batch 1 lands
          if (id == 1 && crashOnce.getAndSet(false))
            throw new RuntimeException("injected crash")
          seen.synchronized { seen ++= df.collect().map(_.getLong(0)) }
          ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try { q.awaitTermination(); Right(()) }
      catch { case e: Throwable => Left(e) }
    }
    assert(run().isLeft, "first run must crash")
    assert(run().isRight, "resume must complete")
    assert(seen.size == seen.toSet.size,
      s"crash-resume must not double-serve: ${seen.groupBy(identity).filter(_._2.size > 1).keys}")
    assert(seen.toSet == (1L to 60L).toSet, "every row exactly once across the crash")
  }

  test("property: random append/compact sequences drain exactly once under random caps") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val dir = tmp()
      val t = GraftTable(spark, s"$dir/t")
      var nextKey = 1L
      def freshRows(n: Int): Seq[(Long, Long)] = {
        val rows = (nextKey until nextKey + n).map(k => (k, k * 2))
        nextKey += n
        rows
      }
      t.overwrite(freshRows(20).toDF("k", "v").repartition(3), Some("k"))
      def drain(cap: Int): Unit = {
        val q = spark.readStream.format("graft")
          .option("maxFilesPerTrigger", cap.toString).load(s"$dir/t")
          .writeStream.format("parquet")
          .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain(rng.nextInt(4) + 1)
      for (_ <- 1 to 4) {
        rng.nextInt(3) match {
          case 0 => t.append(freshRows(rng.nextInt(15) + 1).toDF("k", "v"),
            Some("k"))
          case 1 => t.compact(targetFileRows = 10L)
          case 2 =>
            // insert-only merge (all-new keys): a data commit that is
            // append-shaped for the stream
            t.merge(freshRows(5).toDF("k", "v"), Seq("k"))
              .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        }
        drain(rng.nextInt(4) + 1)
      }
      val streamed = spark.read.parquet(s"$dir/out").collect()
        .map(_.getLong(0)).sorted.toSeq
      val table = t.scan.collect().map(_.getLong(0)).sorted.toSeq
      assert(streamed == table,
        s"seed $seed: drained stream must equal the table exactly once " +
          s"(streamed ${streamed.length}, table ${table.length}, " +
          s"dupes=${streamed.diff(streamed.distinct).take(5)})")
    }
  }

  test("downstream windowed aggregation over the graft source matches batch") {
    val dir = tmp()
    val t = GraftTable(spark, s"$dir/t")
    val mk = (lo: Int, hi: Int) => (lo to hi).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 10:${i % 60}%02d:00"),
        i * 1.0)).toDF("id", "ts", "v")
    t.overwrite(mk(1, 30), Some("id"))
    val q = spark.readStream.format("graft").load(s"$dir/t")
      .groupBy(window(col("ts"), "10 minutes")).agg(sum("v").as("s"))
      .writeStream.format("memory").queryName("ssrc_win")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt_w")
      .start()
    try {
      q.processAllAvailable()
      t.append(mk(31, 60), Some("id"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssrc_win")
      .select(col("window.start").cast("string"), col("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val batch = t.snapshot
      .groupBy(window(col("ts"), "10 minutes")).agg(sum("v").as("s"))
      .select(col("window.start").cast("string"), col("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming a Hive-converted (pv) table: snapshot + tail equal batch") {
    val dir = tmp()
    (1L to 40L).map(i => (i, i * 1.0, (i % 4).toInt))
      .toDF("k", "v", "p").repartition(2)
      .write.partitionBy("p").parquet(s"$dir/t")
    val t = graft.sources.GraftTable.convertParquet(spark, s"$dir/t",
      Seq("k"), Seq("p" -> "INT"))
    assert(t.latestManifest.get.hasPv)
    // per-partition aggregate: only correct if every served row carries
    // its metadata-held partition value
    val q = spark.readStream.format("graft").load(s"$dir/t")
      .groupBy("p").agg(count(lit(1)).as("n"), sum("k").as("s"))
      .writeStream.format("memory").queryName("ssrc_pv")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt_pv")
      .start()
    try {
      q.processAllAvailable()
      // a pv append lands in the tail and is served with its tuple
      t.appendStats((41L to 48L).map(i => (i, i * 1.0, (i % 4).toInt))
        .toDF("k", "v", "p"), Seq("k"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssrc_pv").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val batch = t.snapshot.groupBy("p")
      .agg(count(lit(1)).as("n"), sum("k").as("s")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.size == 4,
      s"stream $streamed vs batch $batch")
  }
}
