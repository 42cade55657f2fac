package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: binary columns, partition-parallel stub decode,
  * frame sampling (one-to-many), resize (binary→binary). The decode
  * bodies are stubs; what these tests pin is the Spark-side contract —
  * schemas, batch shapes, determinism, caps.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val media =
    Multimodal.withBinaryColumn(Tables.table(spark, sf, "documents"))

  test("feature extraction is deterministic and covers every doc") {
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(a.length == 500 && a.toSeq == b.toSeq)
    assert(a.forall(f => f.n_frames == f.byte_len / 256 + 1))
  }

  test("frame sampling caps frames per document") {
    val capped = Multimodal.sampleFrames(spark, media, frameBytes = 16, maxFrames = 3)
    val counts = capped.groupBy("doc_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 3))
    // an uncapped run yields more frames for any doc longer than 48 bytes
    val uncapped = Multimodal.sampleFrames(spark, media, frameBytes = 16)
    assert(uncapped.count() > capped.count())
  }

  test("resize bounds the payload and keeps it deterministic") {
    val out = Multimodal.resize(spark, media, targetBytes = 64)
      .select(col("doc_id"), length(col("media_resized")).as("len"),
        length(col("media")).as("orig"))
      .collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getAs[Int]("len") <= 64))
    // shorter-than-target payloads pass through whole
    assert(out.filter(_.getAs[Int]("orig") <= 64)
      .forall(r => r.getAs[Int]("len") == r.getAs[Int]("orig")))
  }
}
