package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Property: for ANY sequence of appends, merges, updates and deletes
  * on an identity table, the identity column stays globally UNIQUE
  * (live values never collide, across every version: a value once
  * allocated is never reissued even after its row is deleted) and
  * monotone in allocation order (each batch's fresh values all exceed
  * every previously allocated value, step > 0). Fixed seeds replay.
  */
class IdentityPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // op stream: (kind, payload size / key slice)
  private val opGen: Gen[(String, Int)] = Gen.frequency(
    (4, Gen.choose(1, 40).map("append" -> _)),
    (3, Gen.choose(1, 15).map("merge" -> _)),
    (2, Gen.choose(0, 9).map("delete" -> _)),
    (2, Gen.choose(0, 9).map("update" -> _)))
  private val scenarioGen: Gen[List[(String, Int)]] =
    Gen.listOfN(10, opGen)

  test("identity uniqueness + monotonicity under random op sequences") {
    (1L to 5L).foreach { seedNo =>
      val scenario = scenarioGen(
        org.scalacheck.Gen.Parameters.default, Seed(seedNo)).get
      val root = Files.createTempDirectory("graft-idprop").toString + "/t"
      spark.sql(s"CREATE TABLE graft.`$root` " +
        "(id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, n BIGINT) " +
        "USING graft")
      val t = GraftTable(spark, root)
      var everAllocated = Set.empty[Long]
      var prevMax = 0L
      var nextK = 0L

      scenario.foreach { case (kind, arg) =>
        kind match {
          case "append" =>
            val df = (0 until arg).map(i => (nextK + i, arg.toLong))
              .toDF("k", "n").repartition(3)
            nextK += arg
            t.append(df)
          case "merge" =>
            // half-new half-existing keys; source lacks id so inserted
            // rows allocate, matched rows must keep their value
            val keys = (0 until arg).map(i =>
              if (i % 2 == 0) nextK + i else (nextK + i) % math.max(1L, nextK))
            nextK += arg
            t.merge(keys.distinct.map(k => (k, arg.toLong * 100))
                .toDF("k", "n"), Seq("k"))
              .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
          case "delete" =>
            t.delete(s"k % 10 = $arg")
          case "update" =>
            t.update(Map("n" -> "n + 1"), s"k % 10 = $arg")
        }
        val ids = t.scan.select("id").as[Long].collect()
        assert(ids.length == ids.distinct.length,
          s"seed $seedNo after $kind($arg): live identity values collide")
        // a value once allocated never reappears on a NEW row: every
        // current id is either previously seen (surviving row) or
        // GREATER than everything allocated before this op
        val fresh = ids.filterNot(everAllocated.contains)
        assert(fresh.forall(_ > prevMax),
          s"seed $seedNo after $kind($arg): reissued value(s) " +
            s"${fresh.filter(_ <= prevMax).take(3).toSeq} (prevMax $prevMax)")
        everAllocated ++= ids
        prevMax = math.max(prevMax, if (ids.isEmpty) prevMax else ids.max)
      }
    }
  }
}
