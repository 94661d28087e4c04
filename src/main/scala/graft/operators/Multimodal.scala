package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride along as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction runs as
  * batched per-partition transforms (the Scala analog of `mapInPandas` —
  * one iterator per partition, vectorizable batch shape).
  *
  * The actual media DECODE IS A STUB (this container has no image/audio
  * codecs): `decodeStub` produces a deterministic fake feature vector from
  * the bytes. Everything around it — schema, partitioning, batch iteration,
  * metadata plumbing — is real and tested; swapping the stub for a JNI/codec
  * call changes no plan shape.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)

  /** Attach a binary payload + metadata struct to each document. In
    * production the bytes come from the object store (binaryFile source);
    * here the document text doubles as a deterministic payload. */
  def attachBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col(idCol) % 3 + 1).cast("int"))
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        kind.as("kind"),
        (col(idCol) % 640 + 16).cast("int").as("width"),
        (col(idCol) % 480 + 16).cast("int").as("height"),
        (col(idCol) % 90000 + 1000).as("durationMs")).as("meta"))
  }

  /** STUB decode: deterministic 8-bucket byte histogram, L1-normalized —
    * stands in for image/audio feature extraction. Batched per partition;
    * the real implementation would decode `payload` with a codec here. */
  def decodeStub(media: DataFrame, idCol: String): DataFrame = {
    import media.sparkSession.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        val hist = new Array[Double](8)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1.0; i += 1 }
        val n = math.max(1.0, bytes.length.toDouble)
        (id, hist.map(v => (v / n).toFloat))
      }
    }.toDF(idCol, "features")
  }

  /** Frame sampling for video rows: emit `n` evenly-spaced frame timestamps
    * per video — pure `sequence`/`explode`, no UDF, scales as a map-side
    * expand. (The frame DECODE would be a decodeStub-style pass downstream.) */
  def frameSample(media: DataFrame, idCol: String, n: Int): DataFrame =
    media.filter(col("meta.kind") === "video")
      .select(col(idCol), col("meta.durationMs").as("dur"),
        posexplode(sequence(lit(0L), col("meta.durationMs") - 1,
          greatest((col("meta.durationMs") / n).cast("long"), lit(1L)))))
      .filter(col("pos") < n)
      .select(col(idCol), col("pos").as("frame_idx"), col("col").as("frame_ts_ms"))
}
