package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Binary-column plumbing: payload round-trip, typed metadata, batched
  * decode stub shape, frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello media world"), (1L, "another doc"), (2L, "third one here"))
    .toDF("doc_id", "text")

  test("attachBinary: payload bytes round-trip, meta struct typed") {
    val m = Multimodal.attachBinary(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(new String(m(0).getAs[Array[Byte]]("payload"), "UTF-8") == "hello media world")
    val meta = m(0).getStruct(m(0).fieldIndex("meta"))
    assert(Set("image", "audio", "video").contains(meta.getString(0)))
    assert(meta.getInt(1) >= 16 && meta.getInt(2) >= 16 && meta.getLong(3) >= 1000)
  }

  test("decodeStub: deterministic, normalized 8-bucket features") {
    val media = Multimodal.attachBinary(docs, "doc_id", "text")
    val f1 = Multimodal.decodeStub(media, "doc_id").orderBy("doc_id").collect()
    val f2 = Multimodal.decodeStub(media, "doc_id").orderBy("doc_id").collect()
    val feats = f1(0).getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 8)
    assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-5) // L1-normalized
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq) // deterministic
  }

  test("frameSample: n evenly-spaced frames per video row only") {
    val media = Multimodal.attachBinary(
      Seq((2L, "v"), (3L, "a"), (5L, "w")).toDF("doc_id", "text"), "doc_id", "text")
    val videos = media.filter(col("meta.kind") === "video").count()
    val frames = Multimodal.frameSample(media, "doc_id", 4)
    assert(frames.count() == videos * 4)
    val one = frames.filter(col("frame_idx") === 0).count()
    assert(one == videos)
  }
}
