package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Reader-protocol guard ([[graft.sources.Manifest.readerFeatures]],
  * Delta table-features parity): manifests record the correctness-
  * critical features they use; a build that does not understand one
  * refuses the table loudly instead of silently misreading it.
  */
class ProtocolSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-proto").toString

  test("plain tables carry no features; DV use records one, sticky") {
    val t = GraftTable(spark, tmp())
    // dense files: the DV'd file must KEEP live rows (a fully-masked
    // file is dropped outright and carries no dv entry)
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(2), Some("id"))
    assert(t.latestManifest.get.readerFeatures.isEmpty,
      "a plain write must not demand any feature")
    // merge-on-read delete introduces deletionVectors
    t.delete("id = 2", deletionVectors = Some(true))
    assert(t.latestManifest.get.readerFeatures.exists(
      _.contains("deletionVectors")))
    // sticky: a later plain append keeps the declaration (its files may
    // coexist with masked ones)
    t.append(Seq((200L, "d")).toDF("id", "v"))
    assert(t.latestManifest.get.readerFeatures.exists(
      _.contains("deletionVectors")))
    // rename introduces columnMapping on top
    t.renameColumn("v", "w")
    val feats = t.latestManifest.get.readerFeatures.getOrElse(Nil)
    assert(feats.contains("deletionVectors") && feats.contains("columnMapping"),
      s"got $feats")
    assert(t.scan.count() == 100, "the table itself stays fully readable")
  }

  test("a manifest demanding an unknown feature is refused loudly") {
    val t = GraftTable(spark, tmp())
    t.overwrite(Seq((1L, "a")).toDF("id", "v"), Some("id"))
    // hand-forge a next version that requires a feature from the future
    val dir = Paths.get(t.root, "_graft")
    val v1 = Files.readString(dir.resolve(f"manifest-v${1L}%020d.json"))
    // the mapper serializes absent features as an explicit null —
    // replace that value (an insert would duplicate the key and Jackson
    // keeps the LAST occurrence)
    assert(v1.contains("\"readerFeatures\" : null"), v1.takeRight(200))
    val forged = v1
      .replace("\"version\" : 1", "\"version\" : 2")
      .replace("\"readerFeatures\" : null",
        "\"readerFeatures\" : [ \"rowTrackingV9\" ]")
    Files.writeString(dir.resolve(f"manifest-v${2L}%020d.json"), forged)
    val e = intercept[IllegalStateException](t.scan.count())
    assert(e.getMessage.contains("rowTrackingV9") &&
      e.getMessage.contains("upgrade"), e.getMessage)
    // time travel to the pre-feature version still works
    assert(t.snapshotAt(1).count() == 1)
  }

  test("legacy (featureless) base seeds features from its own DV/mapping use") {
    val t = GraftTable(spark, tmp())
    t.overwrite((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), Some("id"))
    t.delete("id <= 5", deletionVectors = Some(true)) // v2 carries a DV
    assert(t.latestManifest.get.readerFeatures.exists(
      _.contains("deletionVectors")))
    // simulate a manifest written by a pre-readerFeatures build: strip
    // the field from v2 on disk (Jackson reads the absent field as None)
    val dir = Paths.get(t.root, "_graft")
    val v2Path = dir.resolve(f"manifest-v${2L}%020d.json")
    val v2 = Files.readString(v2Path)
    assert(v2.contains("\"readerFeatures\""), v2.takeRight(200))
    Files.writeString(v2Path, v2.replaceAll(
      """"readerFeatures" : \[[^\]]*\]""", "\"readerFeatures\" : null"))
    assert(t.manifest(2L).readerFeatures.isEmpty, "legacy base simulated")
    // the first post-upgrade commit must re-derive the DV feature from
    // the base's own files — without the seed, a DV-unaware reader of
    // v3 would serve the 5 deleted rows as live
    t.append(Seq((100L, "new")).toDF("id", "v"), Some("id")) // v3
    val feats = t.latestManifest.get.readerFeatures.getOrElse(Nil)
    assert(feats.contains("deletionVectors"),
      s"legacy DV use must seed the sticky feature set, got $feats")
    assert(t.scan.count() == 46, "masked rows stay masked")
  }
}
