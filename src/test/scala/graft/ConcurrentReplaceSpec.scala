package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Racing-writer semantics for replaceWhere / dynamic PARTITION INSERT
  * OVERWRITE — the file-level optimistic concurrency contract
  * ([[GraftTable.swap]]) under real thread interleavings:
  *
  *  - DISJOINT slices: both writers commit (the loser of the manifest
  *    race rebases — its touched files and its pruning predicate are
  *    disjoint from the winner's), and the final state is the union of
  *    both replaces applied to the base. Anything else serializes loads
  *    that have no business waiting on each other.
  *  - OVERLAPPING slices: the outcome must be SERIALIZABLE — either one
  *    writer fails loudly with a conflict and the other's batch is the
  *    slice's final content, or the commits landed serially and the
  *    later one's batch is. A final slice mixing both batches (or a
  *    silently dropped batch with two success reports) is corruption.
  *
  * Threads share one SparkSession/JVM, which is exactly the shape two
  * entity loaders inside one driver have; cross-process atomicity rides
  * the same hard-link commit and is covered by TwoProcessSpec.
  */
class ConcurrentReplaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(trial: Int, prefix: String): (GraftTable, Seq[(Long, String, Double)]) = {
    val data = (0 until 120).map(i => (i.toLong, s"p${i % 4}", i * 1.0))
    val t = GraftTable(spark,
      Files.createTempDirectory(s"graft-$prefix$trial").toString)
    t.overwritePartitioned(data.toDF("id", "part", "amt"),
      Seq("part"), Seq("id"))
    (t, data)
  }

  /** Run jobs concurrently from a common start latch; results in JOB
    * order (so callers can tell which writer succeeded).
    */
  private def race(jobs: Seq[() => Long]): Seq[Either[Throwable, Long]] = {
    val go = new CountDownLatch(1)
    val out = new Array[Either[Throwable, Long]](jobs.length)
    val threads = jobs.zipWithIndex.map { case (j, i) =>
      new Thread(() => {
        go.await()
        out(i) = try Right(j()) catch { case e: Throwable => Left(e) }
      })
    }
    threads.foreach(_.start()); go.countDown(); threads.foreach(_.join())
    out.toSeq
  }

  test("racing replaceWhere on FILE-DISJOINT slices: both commit, union lands") {
    for (trial <- 1 to 4) {
      // one file per slice (explicit per-part writes), so the two
      // replaces are disjoint at FILE granularity — the contract says
      // both must then commit without either seeing a conflict
      val data = (0 until 120).map(i => (i.toLong, s"p${i % 4}", i * 1.0))
      val t = GraftTable(spark,
        Files.createTempDirectory(s"graft-rcd$trial").toString)
      t.overwriteStats(data.filter(_._2 == "p0").toDF("id", "part", "amt"),
        Seq("id", "part"))
      for (p <- Seq("p1", "p2", "p3"))
        t.appendStats(data.filter(_._2 == p).toDF("id", "part", "amt"),
          Seq("id", "part"))
      val batch1 = (0 until 10).map(i => (1000L + i, "p1", 1.5))
      val batch3 = (0 until 10).map(i => (3000L + i, "p3", 3.5))
      val rs = race(Seq(
        () => t.overwriteWhere(batch1.toDF("id", "part", "amt"), "part = 'p1'"),
        () => t.overwriteWhere(batch3.toDF("id", "part", "amt"), "part = 'p3'")))
      assert(rs.forall(_.isRight),
        s"file-disjoint slices must both commit: ${rs.collect { case Left(e) => e.toString }}")
      assert(rs.collect { case Right(v) => v }.toSet == Set(5L, 6L),
        s"two distinct versions expected: $rs")
      val expected =
        (data.filterNot(r => r._2 == "p1" || r._2 == "p3") ++ batch1 ++ batch3)
          .toSet
      val got = t.scan.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"trial $trial: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("racing replaceWhere on the SAME slice: serializable or loud") {
    for (trial <- 1 to 4) {
      val (t, data) = freshTable(trial, "rco")
      val batchA = (0 until 8).map(i => (5000L + i, "p2", 5.0))
      val batchB = (0 until 8).map(i => (6000L + i, "p2", 6.0))
      val rs = race(Seq(
        () => t.overwriteWhere(batchA.toDF("id", "part", "amt"), "part = 'p2'"),
        () => t.overwriteWhere(batchB.toDF("id", "part", "amt"), "part = 'p2'")))
      rs.collect { case Left(e) => e }.foreach(e =>
        assert(e.isInstanceOf[java.util.ConcurrentModificationException],
          s"an overlap loser must fail with a CONFLICT, got $e"))
      assert(rs.exists(_.isRight), "at least one same-slice replace lands")
      val slice = t.scan.filter(col("part") === "p2").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      // serializable: the final slice is exactly ONE writer's batch —
      // never a mix, never the original rows
      assert(slice == batchA.toSet || slice == batchB.toSet,
        s"trial $trial: slice is a mix or stale: $slice")
      val rest = t.scan.filter(col("part") =!= "p2").count()
      assert(rest == data.count(_._2 != "p2"), "untouched slices intact")
    }
  }

  test("racing dynamic PARTITION INSERT OVERWRITE (SQL) on disjoint tuples") {
    for (trial <- 1 to 3) {
      val (t, data) = freshTable(trial, "rcs")
      graft.sources.GraftCatalog.register(spark, "rcdb", s"t$trial", t)
      Seq((7000L, "p0", 7.0)).toDF("id", "part", "amt")
        .createOrReplaceTempView(s"rc_src0_$trial")
      Seq((8000L, "p2", 8.0)).toDF("id", "part", "amt")
        .createOrReplaceTempView(s"rc_src2_$trial")
      val stmts = Seq(
        s"INSERT OVERWRITE rcdb.t$trial PARTITION (part) " +
          s"SELECT id, amt, part FROM rc_src0_$trial",
        s"INSERT OVERWRITE rcdb.t$trial PARTITION (part) " +
          s"SELECT id, amt, part FROM rc_src2_$trial")
      val rs = race(stmts.map(s => () => spark.sql(s).head().getLong(0)))
      // slice-disjoint but possibly FILE-overlapping (range-clustered
      // files can straddle two part values): a loser must fail with a
      // CONFLICT, never corrupt — and its retry must land cleanly, after
      // which the final state is the union of both overwrites
      rs.collect { case Left(e) => e }.foreach(e =>
        assert(e.isInstanceOf[java.util.ConcurrentModificationException],
          s"only loud conflicts allowed, got $e"))
      assert(rs.exists(_.isRight), "at least one dynamic overwrite lands")
      rs.zip(stmts).collect { case (Left(_), s) => s }
        .foreach(s => spark.sql(s)) // losers retry — standard OCC loop
      val expected = (data.filterNot(r => r._2 == "p0" || r._2 == "p2") ++
        Seq((7000L, "p0", 7.0), (8000L, "p2", 8.0))).toSet
      val got = t.scan.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"trial $trial: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("replaceWhere racing an overlapping APPEND never loses rows silently") {
    for (trial <- 1 to 4) {
      val (t, data) = freshTable(trial, "rca")
      val appendRows = (0 until 5).map(i => (9000L + i, "p1", 9.0))
      val batch = (0 until 5).map(i => (4000L + i, "p1", 4.0))
      val rs = race(Seq(
        () => t.appendStats(appendRows.toDF("id", "part", "amt"), Seq("id")),
        () => t.overwriteWhere(batch.toDF("id", "part", "amt"), "part = 'p1'")))
      rs.collect { case Left(e) => e }.foreach(e =>
        assert(e.isInstanceOf[java.util.ConcurrentModificationException],
          s"only loud conflicts allowed, got $e"))
      val got = t.scan.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val keep = data.filterNot(_._2 == "p1").toSet
      // the serializable outcomes, by which ops committed and in which
      // order (append-then-replace folds the appended p1 rows into the
      // replaced slice; replace-then-append keeps them):
      val serialOutcomes: Set[Set[(Long, String, Double)]] = Set(
        keep ++ batch, // append lost, or append-then-replace
        keep ++ batch ++ appendRows, // replace-then-append
        data.toSet ++ appendRows) // replace lost, append landed
      assert(serialOutcomes.contains(got),
        s"trial $trial: non-serializable state: $got")
      // every SUCCESS report is honored: a committed replace owns its
      // slice rows in all serial orders that include it
      if (rs.lift(1).exists(_.isRight))
        assert(batch.toSet.subsetOf(got), "committed replace lost its batch")
      assert(rs.exists(_.isRight), "at least one writer lands")
    }
  }

  test("TRACKED table: merge racing OPTIMIZE — ids, rcv and identity-paired CDC stay exact") {
    for (trial <- 1 to 6) {
      val data = (0 until 120).map(i => (i.toLong, s"p${i % 4}", i * 1.0))
      val t = GraftTable(spark,
        Files.createTempDirectory(s"graft-trkrace$trial").toString)
      t.overwrite(data.toDF("id", "part", "amt").repartition(8), Some("id"))
      t.enableRowTracking()
      val v0 = t.latestVersion.get
      val pre = t.snapshotWithRowIds()
        .select("id", GraftTable.RowIdOut, GraftTable.RowCommitOut).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val src = (100L until 140L).map(i => (i, "px", -1.0))
        .toDF("id", "part", "amt")
      val rs = race(Seq(
        () => t.merge(src, Seq("id")).whenMatchedUpdateAll()
          .whenNotMatchedInsertAll().withChangeFeed().execute(),
        () => t.compact(targetFileRows = 30L)))
      // serializable or loud: rebase when disjoint, named conflict when not
      rs.collect { case Left(e) => e }.foreach(e =>
        assert(e.isInstanceOf[java.util.ConcurrentModificationException],
          s"only loud conflicts allowed, got $e"))
      assert(rs.exists(_.isRight), "at least one writer lands")
      val mergeOk = rs.head.isRight
      val post = t.snapshotWithRowIds()
        .select("id", GraftTable.RowIdOut, GraftTable.RowCommitOut).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // identity invariants hold in EVERY outcome
      assert(post.map(_._2).distinct.length == post.length,
        s"trial $trial: duplicate _row_id after the race")
      post.filter(p => pre.contains(p._1) && (!mergeOk || p._1 < 100L))
        .foreach { case (k, rid, rcv) =>
          assert(pre(k)._1 == rid, s"id of untouched row $k changed")
          assert(pre(k)._2 == rcv,
            s"rcv of untouched row $k changed: ${pre(k)._2} -> $rcv (a " +
              "rewrite must materialize the OLD commit version row-side)")
        }
      if (mergeOk) {
        assert(post.map(_._1).toSet ==
          data.map(_._1).toSet ++ (120L until 140L))
        // matched keys keep their identity through the merge
        (100L until 120L).foreach { k =>
          val row = post.find(_._1 == k).get
          assert(row._2 == pre(k)._1, s"merge changed matched id of $k")
        }
        // identity-paired CDC across the whole race window: the
        // compaction (whether it landed or lost) contributes NOTHING
        val byType = t.changesBetweenByRow(v0, t.latestVersion.get)
          .groupBy("_change_type").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(byType.getOrElse("insert", 0L) == 20L &&
          byType.getOrElse("update_postimage", 0L) == 20L &&
          byType.getOrElse("delete", 0L) == 0L,
          s"trial $trial: race window CDC off: $byType")
      } else
        assert(post.map(_._1).toSet == data.map(_._1).toSet)
    }
  }
}
