package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CommitStore, GraftTable, LocalCommitStore}

/** The commit protocol's storage seam: every operation that decides
  * who wins a commit funnels through [[CommitStore]], so the
  * object-store mapping (conditional PUT) is TESTED against fault
  * injection, not asserted in a comment.
  *
  * Contracts under test:
  *  - put-if-absent: exactly one concurrent claimant wins, the loser
  *    NEVER silently replaces the winner's content;
  *  - a lost manifest race surfaces as a loud conflict the caller
  *    rebases onto (append) — the winner's commit is preserved verbatim;
  *  - lost listing visibility (an eventually-consistent store hiding
  *    the newest manifest) fails LOUDLY after bounded retries — it can
  *    never silently overwrite the invisible commit;
  *  - identity range claims ride the same CAS and re-reserve disjoint
  *    ranges when raced.
  */
class CommitStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cs").toString

  /** Pass-through store with overridable hooks. */
  private class Delegating(inner: CommitStore = LocalCommitStore)
      extends CommitStore {
    override def putIfAbsent(t: Path, c: String): Boolean = inner.putIfAbsent(t, c)
    override def write(t: Path, c: String): Unit = inner.write(t, c)
    override def replace(t: Path, c: String): Unit = inner.replace(t, c)
    override def read(p: Path): String = inner.read(p)
    override def list(d: Path): Seq[String] = inner.list(d)
    override def exists(p: Path): Boolean = inner.exists(p)
    override def mkdirs(d: Path): Unit = inner.mkdirs(d)
    override def delete(p: Path): Unit = inner.delete(p)
  }

  test("putIfAbsent: exactly one of N concurrent claimants wins") {
    val dir = Files.createTempDirectory("graft-cas")
    val target = dir.resolve("manifest-v1.json")
    val n = 8
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val wins = new AtomicInteger
    val pool = Executors.newFixedThreadPool(n)
    val futures = (1 to n).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          ready.countDown(); go.await()
          if (LocalCommitStore.putIfAbsent(target, s"claimant-$i"))
            wins.incrementAndGet()
        }
      })
    }
    ready.await(); go.countDown()
    futures.foreach(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.get() == 1, s"exactly one claimant must win, got ${wins.get()}")
    // the surviving content is a complete single claim — never torn,
    // never replaced by a loser
    val content = LocalCommitStore.read(target)
    assert(content.matches("claimant-\\d"), content)
  }

  test("a lost manifest race is loud and append rebases onto the winner") {
    val root = s"${tmp()}/t"
    // the injecting store fires a REAL concurrent append (through a
    // plain second handle) right before the outer append's first
    // manifest publish — the outer commit MUST lose and rebase
    val raced = new AtomicInteger
    val store = new Delegating() {
      override def putIfAbsent(t: Path, c: String): Boolean = {
        if (t.getFileName.toString.startsWith("manifest-v") &&
            t.getFileName.toString > f"manifest-v${1L}%020d.json" &&
            raced.compareAndSet(0, 1)) {
          GraftTable(spark, root).append(Seq((100L, "winner")).toDF("k", "v"))
        }
        super.putIfAbsent(t, c)
      }
    }
    val plain = GraftTable(spark, root)
    plain.overwrite(Seq((1L, "base")).toDF("k", "v"))
    val t = GraftTable(spark, root, store)
    val v = t.append(Seq((2L, "mine")).toDF("k", "v"))
    assert(raced.get() == 1, "the race must have fired")
    // both commits landed: the winner kept its version, the append
    // rebased to a later one
    assert(v == 3L, s"append must land AFTER the winner, got v$v")
    assert(plain.manifest(2L).operation.contains("append"))
    val rows = plain.scan.as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "base", 100L -> "winner", 2L -> "mine"))
  }

  test("listing lag self-heals: pointer + forward probe find the hidden commit") {
    val root = s"${tmp()}/t"
    val plain = GraftTable(spark, root)
    plain.overwrite(Seq((1L, "a")).toDF("k", "v"))
    plain.append(Seq((2L, "b")).toDF("k", "v"))
    val latestName = f"manifest-v${2L}%020d.json"
    // an eventually-consistent store whose LISTING hides the newest
    // manifest AND whose `_last` pointer is stale (the v2 committer
    // crashed before the pointer update) — GETs stay read-after-write,
    // the contract real stores provide. Resolution must still find v2
    // through the forward probe and land the append at v3.
    LocalCommitStore.replace(
      java.nio.file.Paths.get(root, "_graft", "_last"), "1")
    val lagging = new Delegating() {
      override def list(d: Path): Seq[String] =
        super.list(d).filterNot(_ == latestName)
    }
    val t = GraftTable(spark, root, lagging)
    val v = t.append(Seq((3L, "c")).toDF("k", "v"))
    assert(v == 3L, s"append must land AFTER the listing-hidden v2, got v$v")
    assert(plain.scan.as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("read-after-write violation fails loudly — never a silent overwrite") {
    val root = s"${tmp()}/t"
    val plain = GraftTable(spark, root)
    plain.overwrite(Seq((1L, "a")).toDF("k", "v"))
    plain.append(Seq((2L, "b")).toDF("k", "v"))
    val latestName = f"manifest-v${2L}%020d.json"
    val before = Files.readString(
      java.nio.file.Paths.get(root, "_graft", latestName))
    // a store that violates its OWN contract: the newest commit is
    // invisible to listing, exists AND the pointer (`_last` still says
    // v1 after a simulated pointer loss). The commit attempt re-derives
    // the taken version every retry and must fail loudly — the decisive
    // putIfAbsent never replaces the invisible winner.
    LocalCommitStore.replace(
      java.nio.file.Paths.get(root, "_graft", "_last"), "1")
    val blind = new Delegating() {
      override def list(d: Path): Seq[String] =
        super.list(d).filterNot(_ == latestName)
      override def exists(p: Path): Boolean =
        p.getFileName.toString != latestName && super.exists(p)
    }
    val t = GraftTable(spark, root, blind)
    val e = intercept[java.util.ConcurrentModificationException] {
      t.append(Seq((3L, "c")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("already committed"), e.getMessage)
    // the invisible commit was NEVER replaced
    val after = Files.readString(
      java.nio.file.Paths.get(root, "_graft", latestName))
    assert(after == before, "hidden manifest must survive byte-identical")
    val fresh = GraftTable(spark, root)
    assert(fresh.scan.as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b"))
  }

  test("identity claims ride the CAS: a raced claim re-reserves disjointly") {
    val root = s"${tmp()}/t"
    spark.sql(s"CREATE TABLE graft.`$root` " +
      "(id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) USING graft")
    val raced = new AtomicInteger
    val store = new Delegating() {
      override def putIfAbsent(t: Path, c: String): Boolean = {
        if (t.toString.contains("idalloc") && raced.compareAndSet(0, 1)) {
          // a concurrent writer claims the same sequence first,
          // reserving values 1..5
          assert(super.putIfAbsent(t, "5"), "injected claim must win")
        }
        super.putIfAbsent(t, c)
      }
    }
    val t = GraftTable(spark, root, store)
    t.append(Seq("x", "y", "z").toDF("v").coalesce(1))
    assert(raced.get() == 1, "the race must have fired")
    // the lost claim retried PAST the injected range — never into it
    val ids = t.scan.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(6L, 7L, 8L), s"expected 6..8 after a raced 1..5, got $ids")
  }

  // ---- versioned CAS registries (checks / COPY INTO loaded files) --------
  // These were read-modify-write REPLACE moves before round 16 — two
  // concurrent updaters could lose each other's entries. They now ride
  // putIfAbsent version chains; the tests below are the proof.

  test("registry CAS: N concurrent ADD CONSTRAINTs all survive") {
    val root = s"${tmp()}/t"
    GraftTable(spark, root).overwrite(Seq((1L, 1L)).toDF("k", "v"))
    val n = 6
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val futures = (1 to n).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          ready.countDown(); go.await()
          // separate handle per thread — separate registry snapshots,
          // exactly the cross-process shape that lost updates before
          GraftTable(spark, root).addCheck(s"c$i", s"k > ${-i}")
        }
      })
    }
    ready.await(); go.countDown()
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    val got = GraftTable(spark, root).checks
    assert(got.keySet == (1 to n).map(i => s"c$i").toSet,
      s"every concurrent ADD CONSTRAINT must survive, got ${got.keySet}")
  }

  test("registry CAS: duplicate-name race inside the CAS is loud") {
    val root = s"${tmp()}/t"
    GraftTable(spark, root).overwrite(Seq((1L, 1L)).toDF("k", "v"))
    // injection: right before the outer addCheck publishes its registry
    // version, a concurrent writer lands the SAME constraint name first
    val raced = new AtomicInteger
    val store = new Delegating() {
      override def putIfAbsent(t: Path, c: String): Boolean = {
        if (t.getFileName.toString.startsWith("checks-v") &&
            raced.compareAndSet(0, 1))
          GraftTable(spark, root).addCheck("dup", "k > 0")
        super.putIfAbsent(t, c)
      }
    }
    val e = intercept[IllegalArgumentException] {
      GraftTable(spark, root, store).addCheck("dup", "k > -10")
    }
    assert(raced.get() == 1 && e.getMessage.contains("already exists"))
    // the winner's expression survives — the loser never replaced it
    assert(GraftTable(spark, root).checks == Map("dup" -> "k > 0"))
  }

  test("registry CAS: a raced COPY INTO loses no loaded-file entries") {
    val dir = tmp()
    val root = s"$dir/t"
    val plain = GraftTable(spark, root)
    plain.overwrite(Seq((1L, 1.0)).toDF("k", "v"), Some("k"))
    Seq((10L, 10.0), (11L, 11.0)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$dir/srcA")
    Seq((20L, 20.0)).toDF("k", "v").coalesce(1).write.parquet(s"$dir/srcB")
    // injection: between the outer COPY INTO's registry read and its
    // registry publish, a concurrent COPY INTO (srcB) lands ITS entries
    val raced = new AtomicInteger
    val store = new Delegating() {
      override def putIfAbsent(t: Path, c: String): Boolean = {
        if (t.getFileName.toString.startsWith("copyinto-v") &&
            raced.compareAndSet(0, 1))
          GraftTable(spark, root).copyInto(s"$dir/srcB")
        super.putIfAbsent(t, c)
      }
    }
    GraftTable(spark, root, store).copyInto(s"$dir/srcA")
    assert(raced.get() == 1, "the race must have fired")
    assert(plain.scan.count() == 4)
    // BOTH loads are registered: re-running either is a version-stable
    // no-op (the pre-CAS registry lost srcB here and re-loaded it)
    val v = plain.latestVersion.get
    assert(plain.copyInto(s"$dir/srcB") == v, "srcB entry was lost — re-load")
    assert(plain.copyInto(s"$dir/srcA") == v, "srcA entry was lost — re-load")
    assert(plain.scan.count() == 4)
  }

  test("registry chain: vacuum prunes superseded versions, state intact") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, 1L)).toDF("k", "v"))
    (1 to 3).foreach(i => t.addCheck(s"c$i", s"k > ${-i}"))
    assert(t.registryVersions("checks").sorted == Seq(1L, 2L, 3L))
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.registryVersions("checks") == Seq(3L),
      "vacuum must keep only the latest registry version")
    assert(t.checks.keySet == Set("c1", "c2", "c3"))
  }

  test("registry chain: a pre-seam legacy flat file reads as version 0") {
    val root = s"${tmp()}/t"
    val t = GraftTable(spark, root)
    t.overwrite(Seq((1L, 1L)).toDF("k", "v"))
    // a registry written by a pre-round-16 build: the flat REPLACE file
    Files.writeString(java.nio.file.Paths.get(root, "_graft", "checks.json"),
      """{"old":"k > 0"}""")
    assert(t.checks == Map("old" -> "k > 0"))
    t.addCheck("next", "v > 0") // first CAS write shadows the flat file
    assert(t.registryVersions("checks") == Seq(1L))
    assert(GraftTable(spark, root).checks ==
      Map("old" -> "k > 0", "next" -> "v > 0"))
  }
}
