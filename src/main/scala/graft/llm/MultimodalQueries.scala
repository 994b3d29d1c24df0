package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked slice of the multimodal surface: payloads are built
  * from the `documents` fixture (UTF-8 bytes of `text` — verified pure
  * ASCII, so char positions == byte positions in both engines), then
  * per-record metadata and deterministic frame hashes are computed.
  * The codec-side operators (feature extraction, resize) are covered
  * by `MultimodalSpec` instead — they are not SQL-expressible.
  */
object MultimodalQueries {

  type QFn = (SparkSession, String) => DataFrame

  import Multimodal.{FrameSize, SampleK}

  val defs: Map[String, QFn] = Map(

    "llm_multimodal_frames" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", $"text",
          length(encode($"text", "UTF-8")).as("n_bytes"),
          md5($"text").as("checksum"))
        .withColumn("n_frames",
          expr(s"(n_bytes + ${FrameSize - 1}) div $FrameSize"))
        .withColumn("first_frame_md5",
          md5(expr(s"substr(text, 1, $FrameSize)")))
        .withColumn("mid_frame_md5",
          md5(expr(
            s"substr(text, CAST(((n_frames - 1) div 2) * $FrameSize + 1 AS INT), $FrameSize)")))
        .select($"doc_id", $"n_bytes", $"n_frames", $"checksum",
          $"first_frame_md5", $"mid_frame_md5")
        .orderBy($"doc_id")
    },

    // --- deterministic k-frame sampling -----------------------------------
    // The frame-sample schedule of video/audio feature extraction:
    // SampleK indices spread evenly across [0, n_frames) — always
    // including the first and last frame — with each sampled frame
    // hashed. idx_j = j·(n_frames−1) div (SampleK−1) is pure integer
    // arithmetic — NON-NEGATIVE thanks to the n_frames > 0 guard, so
    // Spark's truncating div and DuckDB's flooring // agree (they
    // differ on negatives); duplicates collapse when a record has
    // fewer frames than SampleK, and a zero-frame (empty) record
    // emits no samples at all. Pure per-row explode (≤ SampleK
    // rows/record, no shuffle): the schedule an executor-side codec
    // would then seek to, computed relationally.
    "llm_frame_sample" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", $"text",
          length(encode($"text", "UTF-8")).as("n_bytes"))
        .withColumn("n_frames",
          expr(s"(n_bytes + ${FrameSize - 1}) div $FrameSize"))
        .filter($"n_frames" > 0)
        .withColumn("frame_idx", explode(array_distinct(expr(
          s"""transform(sequence(0, ${SampleK - 1}),
             |  j -> (j * (n_frames - 1)) div ${SampleK - 1})""".stripMargin))))
        .withColumn("frame_md5",
          md5(expr(s"substr(text, CAST(frame_idx * $FrameSize + 1 AS INT), $FrameSize)")))
        .select($"doc_id", $"n_frames", $"frame_idx".cast("long").as("frame_idx"),
          $"frame_md5")
        .orderBy($"doc_id", $"frame_idx")
    }
  )

  val oracles: Map[String, String] = Map(

    "llm_multimodal_frames" ->
      s"""SELECT doc_id, n_bytes, n_frames, checksum,
         |  md5(substr(text, 1, $FrameSize)) AS first_frame_md5,
         |  md5(substr(text, ((n_frames - 1) // 2) * $FrameSize + 1, $FrameSize))
         |    AS mid_frame_md5
         |FROM (
         |  SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         |    (CAST(octet_length(encode(text)) AS BIGINT) + ${FrameSize - 1})
         |      // $FrameSize AS n_frames,
         |    md5(text) AS checksum
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "llm_frame_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id, text,
         |    (CAST(octet_length(encode(text)) AS BIGINT) + ${FrameSize - 1})
         |      // $FrameSize AS n_frames
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n_frames,
         |    unnest(list_distinct(list_transform(range(0, $SampleK),
         |      j -> (j * (n_frames - 1)) // ${SampleK - 1}))) AS frame_idx,
         |    text
         |  -- zero-frame records emit no samples (the guard keeps the
         |  -- index arithmetic non-negative, where div and // agree)
         |  FROM b WHERE n_frames > 0)
         |SELECT doc_id, n_frames, frame_idx,
         |  md5(substr(text, CAST(frame_idx * $FrameSize + 1 AS INT), $FrameSize))
         |    AS frame_md5
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  )
}
