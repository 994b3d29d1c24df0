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
    },

    // --- media near-dup via frame-level SimHash ---------------------------
    // The perceptual-hash shape for opaque media payloads: hash every
    // frame (content-defined unit) to 32 bits, majority-vote each bit
    // across the record's frames into one 32-bit signature, then find
    // near-dups by banded Hamming — records sharing most frame content
    // agree on most signature bits even when a few frames differ. A
    // real deployment swaps the frame hash for a decoded perceptual
    // feature (DCT phash) at the codec boundary; the RELATIONAL shape
    // — linear frame explode, one 32-sum partial agg per record,
    // band-bucket equi-join, never all-pairs — is exactly this.
    "llm_media_simhash" -> { (s, dir) =>
      import s.implicits._
      import graft.llm.TextOps.hash32
      val frames = Tables(s, dir).documents
        .select($"doc_id", $"text",
          length(encode($"text", "UTF-8")).as("n_bytes"))
        .withColumn("n_frames",
          expr(s"(n_bytes + ${FrameSize - 1}) div $FrameSize"))
        .filter($"n_frames" > 0)
        .withColumn("fi", explode(sequence(lit(0L), $"n_frames" - 1)))
        .withColumn("fh", hash32(
          expr(s"substr(text, CAST(fi * $FrameSize + 1 AS INT), $FrameSize)")))
      val bitSums = (0 until 32).map { i =>
        sum(when(shiftright($"fh", i).bitwiseAND(lit(1L)) === 1, 1)
          .otherwise(-1)).as(s"s$i")
      }
      val sig = frames.groupBy($"doc_id")
        .agg(bitSums.head, bitSums.tail: _*)
        .select($"doc_id",
          (0 until 32).map(i =>
            when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
            .reduce(_ + _).as("mhash"))
      val bandCols = (0 until 4).map { k =>
        struct(lit(k).as("band"),
          shiftright($"mhash", 8 * k).bitwiseAND(lit(255L)).as("bb"))
      }
      val bands = IndexArtifacts.cachedIndex(s, dir, "media-simhash-bands",
        Seq(s"$dir/documents.parquet"))(sig
        .select($"doc_id", $"mhash", explode(array(bandCols: _*)).as("b"))
        .select($"doc_id", $"mhash",
          col("b.band").as("band"), col("b.bb").as("bb")))
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bb") === col("y.bb") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.mhash").bitwiseXOR(col("y.mhash")))
            .as("hamming"))
        .distinct()
        .filter($"hamming" <= 6)
        .orderBy($"doc_a", $"doc_b")
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
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "llm_media_simhash" -> {
      import graft.llm.TextOps.hash32Sql
      val sums = (0 until 32).map(i =>
        s"sum(CASE WHEN (fh >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
        .mkString(",\n    ")
      val bits = (0 until 32).map(i =>
        s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END")
        .mkString(" + ")
      s"""WITH b AS (
         |  SELECT doc_id, text,
         |    (CAST(octet_length(encode(text)) AS BIGINT) + ${FrameSize - 1})
         |      // $FrameSize AS n_frames
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, unnest(range(0, n_frames)) AS fi, text
         |  FROM b WHERE n_frames > 0),
         |fh AS (
         |  SELECT doc_id,
         |    ${hash32Sql(s"substr(text, CAST(fi * $FrameSize + 1 AS INT), $FrameSize)")} AS fh
         |  FROM f),
         |sums AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM fh GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id, CAST($bits AS BIGINT) AS mhash FROM sums),
         |bands AS (
         |  SELECT doc_id, mhash, k.band AS band,
         |    (mhash >> (8 * k.band)) & 255 AS bb
         |  FROM sig CROSS JOIN
         |    (SELECT CAST(unnest(range(4)) AS INT) AS band) k)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  CAST(bit_count(xor(x.mhash, y.mhash)) AS INT) AS hamming
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bb = y.bb AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.mhash, y.mhash)) <= 6
         |ORDER BY 1, 2""".stripMargin
    }
  )
}
