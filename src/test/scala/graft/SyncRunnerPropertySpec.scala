package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ConfigStore, Entity, SimulatedCrash, SyncRunner}
import graft.sources.GraftTable

/** Randomized end-to-end witness for [[SyncRunner]]: arbitrary op
  * sequences (update / key-change / COW delete / MOR delete / append /
  * compact) interleaved with RANDOM crash injections (merge landed,
  * close dropped) must leave the mirror multiset-equal to the source
  * after every completed cycle — the effectively-once claim under
  * adversarial schedules, not just the two hand-picked crash windows.
  */
class SyncRunnerPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsOf(t: GraftTable): Map[Long, String] =
    t.snapshot.select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("random ops + random crashes: mirror equals source after every completed cycle") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 3) {
      val dir = Files.createTempDirectory(s"graft-syncprop$trial").toString
      val config = new ConfigStore(spark, s"$dir/control")
      config.registerEntities(Seq(
        Entity(1L, "src", "m.src", "a", "b", "CT", None, "_row_id")))
      val source = GraftTable(spark, s"$dir/src")
      source.overwrite(
        (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"), Some("k"))
      source.enableRowTracking()
      val mirror = GraftTable(spark, s"$dir/mirror")
      new SyncRunner(spark, config, source, mirror, 1L).runOnce()
      var nextKey = 1000L * trial

      for (cycle <- 1 to 6) {
        // 1-3 random ops per cycle
        for (_ <- 0 until (1 + rnd.nextInt(3))) rnd.nextInt(6) match {
          case 0 => // value update of a random stripe
            source.update(Map("v" -> s"'c$cycle'"), s"k % 7 = ${rnd.nextInt(7)}")
          case 1 => // key-changing update (the identity-only case)
            source.update(Map("k" -> "k + 500000"),
              s"k % 11 = ${rnd.nextInt(11)} AND k < 500000")
          case 2 => source.delete(s"k % 5 = ${rnd.nextInt(5)} AND k < 500000")
          case 3 => source.delete(s"k % 9 = ${rnd.nextInt(9)}",
            deletionVectors = Some(true))
          case 4 =>
            nextKey += 10
            source.append(
              (nextKey to nextKey + 4).map(i => (i, s"n$i")).toDF("k", "v"))
          case 5 => source.compact(targetFileRows = 200L)
        }
        // random crash before the close on ~1/3 of cycles: the merge
        // lands, the cursor does not — the NEXT cycle replays the window
        if (rnd.nextInt(3) == 0) {
          intercept[SimulatedCrash] {
            new SyncRunner(spark, config, source, mirror, 1L)
              .runOnceImpl(crashBeforeClose = true)
          }
        }
        new SyncRunner(spark, config, source, mirror, 1L).runOnce()
        val (s, m) = (rowsOf(source), rowsOf(mirror))
        assert(m == s,
          s"trial $trial cycle $cycle: mirror diverged\n missing=${
            s.toSet.diff(m.toSet)}\n extra=${m.toSet.diff(s.toSet)}")
      }
    }
  }
}
