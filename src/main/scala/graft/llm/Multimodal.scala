package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried with every media payload. */
final case class MediaMeta(
    format: String,
    nBytes: Int,
    checksum: String)

/** A multimodal record: media (image/audio/video) as an opaque binary
  * payload + typed metadata. The payload column is `BinaryType`; all
  * engine-side handling (partitioning, batching, schema) is real —
  * only the codec itself is stubbed (no image/audio libraries in this
  * environment).
  */
final case class MediaRecord(
    docId: Long,
    modality: String,
    payload: Array[Byte],
    meta: MediaMeta)

/** Extracted per-record features (the embedding a real vision/audio
  * model would produce).
  */
final case class MediaFeatures(
    docId: Long,
    modality: String,
    features: Array[Float])

/** A sampled frame: byte-range slice of the payload. */
final case class MediaFrame(
    docId: Long,
    frameIdx: Int,
    frame: Array[Byte])

/** Codec boundary: a real deployment plugs in an image/audio decoder
  * here. The environment has no media libraries, so [[FakeCodec]] is a
  * deterministic stand-in — the Spark-side plumbing (schema, batch
  * shape, partitioning) is identical either way.
  */
trait MediaCodec extends Serializable {
  /** Decode a batch of payloads into fixed-width feature vectors.
    * Batched on purpose: real decoders amortize model/codec setup per
    * batch, exactly like a Pandas-UDF batch.
    */
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** STUB: deterministic fake decode — an 8-bin byte histogram,
  * L1-normalized. A real codec (JPEG decode → CNN features, PCM →
  * mel spectrogram, …) replaces this class only; nothing else changes.
  */
final class FakeCodec extends MediaCodec {
  override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
    payloads.map { bytes =>
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >>> 5) += 1f
        i += 1
      }
      val n = math.max(1, bytes.length).toFloat
      hist.map(_ / n)
    }
}

/** Multimodal column handling for LLM training-data pipelines.
  *
  * Design for scale: payloads stay opaque binary through the plan (no
  * base64 round-trips, no driver materialization); decode runs inside
  * `mapPartitions` with explicit batching so a real codec amortizes
  * setup; frame sampling is a pure Catalyst expression (zero JVM↔codec
  * boundary for the common slice case). Partitioning is whatever the
  * upstream source had — decode is a narrow transformation, no
  * shuffle.
  */
object Multimodal {

  val FrameSize = 64

  /** Frames sampled per record by the `llm_frame_sample` schedule. */
  val SampleK = 4

  /** Build a deterministic media table from the `documents` fixture:
    * payload = UTF-8 bytes of the text (a stand-in for real image
    * bytes), metadata derived from it. Real pipelines read
    * `binaryFile` or parquet-with-binary sources instead.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        $"doc_id".as("docId"),
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode($"text", "UTF-8").as("payload"),
        struct(
          lit("fake/raw").as("format"),
          length(encode($"text", "UTF-8")).as("nBytes"),
          md5($"text").as("checksum")).as("meta"))
      .as[MediaRecord]
  }

  /** Batched feature extraction through the codec boundary. One codec
    * instance per partition, `batchSize` payloads per decode call —
    * the Spark-side shape a Pandas UDF / Arrow batch would have.
    */
  def extractFeatures(
      records: Dataset[MediaRecord],
      codec: MediaCodec = new FakeCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = codec.decodeBatch(batch.map(_.payload))
        batch.lazyZip(feats).map { (r, f) =>
          MediaFeatures(r.docId, r.modality, f)
        }
      }
    }
  }

  /** Sample every `stride`-th fixed-size frame from each payload.
    * Pure Catalyst (slice on binary via substring), no codec boundary.
    */
  def sampleFrames(
      records: Dataset[MediaRecord],
      stride: Int = 2): Dataset[MediaFrame] = {
    import records.sparkSession.implicits._
    records.toDF()
      .select($"docId",
        posexplode(expr(
          s"""transform(
             |  sequence(0, (meta.nBytes - 1) div $FrameSize),
             |  i -> substr(payload, i * $FrameSize + 1, $FrameSize))""".stripMargin))
          .as(Seq("frameIdx", "frame")))
      .filter($"frameIdx" % stride === 0)
      .as[MediaFrame]
  }

  /** Resize stub: a real implementation re-encodes the payload; here it
    * truncates to `maxBytes` and rewrites the metadata — the plumbing
    * (binary in, binary out, metadata kept consistent) is the real
    * contract.
    */
  def resize(records: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.toDF()
      .select($"docId", $"modality",
        expr(s"substr(payload, 1, $maxBytes)").as("payload"),
        struct(
          $"meta.format".as("format"),
          least($"meta.nBytes", lit(maxBytes)).as("nBytes"),
          md5(expr(s"substr(payload, 1, $maxBytes)")).as("checksum"))
          .as("meta"))
      .as[MediaRecord]
  }
}
