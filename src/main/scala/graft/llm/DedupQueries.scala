package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextOps._

/** Document-deduplication operator family over the `documents` fixture
  * (SURVEY.md §7.5; the reference has no analog — these are the
  * training-data-pipeline extensions the driver mandates).
  *
  * Four operators, each with a DuckDB oracle twin built from the same
  * deterministic primitives ([[TextOps]]):
  *
  *  - exact dedup: normalized-content md5 → hash groupBy.
  *  - MinHash-LSH near-dedup: k=16 signature → 4 banded buckets →
  *    bucket equi-join for candidates → exact-Jaccard verification.
  *    NEVER all-pairs: at 100 TB the only shuffles are the signature
  *    groupBy and the band-hash self-join, both keyed on uniformly
  *    distributed hashes (no skew), and verification touches candidate
  *    pairs only.
  *  - SimHash near-dedup: 32-bit sign-aggregated fingerprint, 4×8-bit
  *    banded buckets, Hamming-distance verification via bit_count(xor).
  *  - blocked n-gram Jaccard: exact bigram-shingle Jaccard within a
  *    blocking key (`source`) — the classic blocked-pairwise shape;
  *    pair count is bounded per block, not global.
  */
object DedupQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** documents ∪ a planted duplicate set: the first 20 docs re-appear
    * upper-cased under doc_id+10000, so exact dedup has real work to do
    * (the raw corpus is duplicate-free). Mirrored verbatim in the
    * oracle SQL.
    */
  private def withPlantedDupes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables(s, dir).documents.select($"doc_id", $"text")
    base.unionByName(
      base.filter($"doc_id" < 20)
        .select(($"doc_id" + 10000).as("doc_id"), upper($"text").as("text")))
  }

  private val plantedSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 10000 AS doc_id, upper(text) AS text
      |FROM documents WHERE doc_id < 20""".stripMargin

  /** doc_id + sorted distinct HASHED bigram-shingle set (longs),
    * shingle-less docs dropped — the shared base of minhash/simhash/
    * n-gram Jaccard, computed in one native pass per document.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents
      .select($"doc_id", hashedShingles($"text").as("sh"))
      .filter(size($"sh") > 0)
  }

  private val shingledSql =
    s"""SELECT doc_id, sh FROM (
       |    SELECT doc_id, ${hashedShinglesSql("t")} AS sh
       |    FROM (SELECT doc_id, $toksSql AS t FROM documents))
       |  WHERE len(sh) > 0""".stripMargin

  val defs: Map[String, QFn] = Map(

    // --- exact dedup: normalize → hash → groupBy ------------------------
    "llm_exact_dedup" -> { (s, dir) =>
      import s.implicits._
      withPlantedDupes(s, dir)
        .withColumn("content_hash", md5(trim(lower($"text"))))
        .groupBy($"content_hash")
        .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_id"))
        .filter($"n_copies" >= 2)
        .orderBy($"content_hash")
    },

    // --- MinHash-LSH banded near-dedup ----------------------------------
    "llm_minhash_lsh" -> { (s, dir) =>
      import s.implicits._
      val docs = shingled(s, dir)
      val tok = docs.select($"doc_id", explode($"sh").as("h0"))
        .withColumn("h", $"h0" % P)
      val sig = tok.groupBy($"doc_id").agg(
        min((lit(perms(0)._1) * $"h" + lit(perms(0)._2)) % P).as("m0"),
        perms.zipWithIndex.tail.map { case ((a, b), i) =>
          min((lit(a) * $"h" + lit(b)) % P).as(s"m$i")
        }: _*)
      // all 4 band hashes in ONE projection + explode — a 4-way union
      // would recompute the whole signature pipeline per band
      val bandCols = (0 until Bands).map { k =>
        val cols = (0 until RowsPerBand)
          .map(r => col(s"m${k * RowsPerBand + r}").cast("string"))
        struct(lit(k).as("band"), md5(concat_ws(",", cols: _*)).as("bh"))
      }
      // persist the band table: both sides of the candidate self-join
      // consume it, and without materialization each side re-runs the
      // whole explode+16-min signature pipeline (no exchange to reuse
      // under a broadcast join). The band table is 4 rows × (long +
      // 32-char hash) per doc — the LSH "index", tiny next to the
      // corpus at any scale.
      val bands = sig
        .select($"doc_id", explode(array(bandCols: _*)).as("s"))
        .select($"doc_id", col("s.band").as("band"), col("s.bh").as("bh"))
        .persist()
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sa")), "doc_a")
        .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sb")), "doc_b")
        .withColumn("jaccard", jaccard($"sa", $"sb"))
        .filter($"jaccard" >= 0.3)
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    },

    // --- SimHash near-dedup (banded Hamming) ----------------------------
    "llm_simhash" -> { (s, dir) =>
      import s.implicits._
      val tok = shingled(s, dir)
        .select($"doc_id", explode($"sh").as("h"))
      val bitSums = (0 until 32).map { i =>
        sum(when(shiftright($"h", i).bitwiseAND(lit(1L)) === 1, 1)
          .otherwise(-1)).as(s"s$i")
      }
      val sums = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      val simhash = sums.select($"doc_id",
        (0 until 32).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      val bandCols = (0 until 4).map { k =>
        struct(lit(k).as("band"),
          shiftright($"simhash", 8 * k).bitwiseAND(lit(255L)).as("bb"))
      }
      // persisted for the same reason as the MinHash band table: the
      // self-join would otherwise recompute the 32-sum signature per side
      val bands = simhash
        .select($"doc_id", $"simhash", explode(array(bandCols: _*)).as("s"))
        .select($"doc_id", $"simhash", col("s.band").as("band"), col("s.bb").as("bb"))
        .persist()
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bb") === col("y.bb") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
            .as("hamming"))
        .distinct()
        .filter($"hamming" <= 8)
        .orderBy($"doc_a", $"doc_b")
    },

    // --- embedding-cosine near-dup (feature-hashed doc vectors) ---------
    // Each document becomes a 32-dim COUNT vector by feature hashing
    // its shingles (h mod 32); near-dups are blocked pairs with cosine
    // >= 0.85. All counts/dots/norms² are exact 64-bit integers — the
    // only floating point is the final sqrt+divide, identical in both
    // engines. Scale shape: vectorization is one groupBy, pairs are
    // blocked per source.
    "llm_vector_neardup" -> { (s, dir) =>
      import s.implicits._
      val VDim = 32
      val tok = Tables(s, dir).documents
        .select($"source", $"doc_id", hashedShingles($"text").as("sh"))
        .filter(size($"sh") > 0)
        .select($"source", $"doc_id", explode($"sh").as("h0"))
        .withColumn("d", pmod($"h0", lit(VDim.toLong)))
      val counts = (0 until VDim).map(i =>
        sum(when($"d" === i, 1L).otherwise(0L)).as(s"c$i"))
      // NOT persisted: measured slower through the columnar cache than
      // recomputing the groupBy from the parquet scan (33 int columns)
      val v = tok.groupBy($"source", $"doc_id").agg(counts.head, counts.tail: _*)
        .withColumn("n2",
          (0 until VDim).map(i => col(s"c$i") * col(s"c$i")).reduce(_ + _))
      val dotE = (0 until VDim).map(i => col(s"x.c$i") * col(s"y.c$i")).reduce(_ + _)
      v.as("x").join(v.as("y"),
          col("x.source") === col("y.source") &&
            col("x.doc_id") < col("y.doc_id"))
        .withColumn("cosine", dotE.cast("double") /
          (sqrt(col("x.n2").cast("double")) * sqrt(col("y.n2").cast("double"))))
        .filter($"cosine" >= 0.85)
        .select(col("x.source").as("source"),
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), $"cosine")
        .orderBy($"source", $"doc_a", $"doc_b")
    },

    // --- blocked exact n-gram Jaccard -----------------------------------
    // Shingles are hashed to longs and SORTED once per document; the
    // per-pair work is then a codegen'd two-pointer merge count
    // (graft.functions.SortedIntersectCount) — zero allocation on the
    // blocked-pairwise hot path, the shape that survives 100×.
    "llm_ngram_jaccard" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // composite blocking key (source, lang) bounds each block — the
      // pair count is Σ_block |block|², never N²
      val d = Tables(s, dir).documents
        .select($"source", $"lang", $"doc_id", hashedShingles($"text").as("sh"))
        .filter(size($"sh") > 0)
        .persist() // both join sides; avoids re-shingling the corpus
      d.as("x").join(d.as("y"),
          col("x.source") === col("y.source") &&
            col("x.lang") === col("y.lang") &&
            col("x.doc_id") < col("y.doc_id"))
        .withColumn("n_common", expr("sorted_intersect_count(x.sh, y.sh)"))
        .select(col("x.source").as("source"), col("x.lang").as("lang"),
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          ($"n_common".cast("double") /
            (size(col("x.sh")) + size(col("y.sh")) - $"n_common")).as("jaccard"))
        .filter($"jaccard" >= 0.1)
        .orderBy($"source", $"lang", $"doc_a", $"doc_b")
    }
  )

  // ------------------------------------------------------------- oracles

  private val minhashSigSql: String = {
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * h + $b) % $P) AS m$i"
    }.mkString(",\n    ")
    s"""sig AS (
       |  SELECT doc_id, $mins
       |  FROM tok GROUP BY doc_id)""".stripMargin
  }

  private val minhashBandsSql: String = (0 until Bands).map { k =>
    val cols = (0 until RowsPerBand)
      .map(r => s"CAST(m${k * RowsPerBand + r} AS VARCHAR)").mkString(", ")
    s"SELECT doc_id, $k AS band, md5(concat_ws(',', $cols)) AS bh FROM sig"
  }.mkString("\n  UNION ALL\n  ")

  private val simhashSumsSql: String = (0 until 32).map { i =>
    s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i"
  }.mkString(",\n    ")

  private val simhashBitsSql: String = (0 until 32).map { i =>
    s"CASE WHEN s$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(

    "llm_exact_dedup" ->
      s"""WITH all_docs AS ($plantedSql)
         |SELECT md5(trim(lower(text))) AS content_hash,
         |  count(*) AS n_copies, min(doc_id) AS keep_id
         |FROM all_docs GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY 1""".stripMargin,

    "llm_minhash_lsh" ->
      s"""WITH docs AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM docs)),
         |$minhashSigSql,
         |bands AS (
         |  $minhashBandsSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |v AS (
         |  SELECT doc_a, doc_b, ${jaccardSql("da.sh", "db.sh")} AS jaccard
         |  FROM cand
         |  JOIN docs da ON da.doc_id = doc_a
         |  JOIN docs db ON db.doc_id = doc_b)
         |SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.3
         |ORDER BY 1, 2""".stripMargin,

    "llm_simhash" ->
      s"""WITH docs AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, unnest(sh) AS h FROM docs),
         |sums AS (
         |  SELECT doc_id, $simhashSumsSql
         |  FROM tok GROUP BY doc_id),
         |sh AS (
         |  SELECT doc_id, $simhashBitsSql AS simhash FROM sums),
         |bands AS (
         |  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS bb
         |  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band) b)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bb = y.bb AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
         |ORDER BY 1, 2""".stripMargin,

    "llm_vector_neardup" -> {
      val VDim = 32
      val countsSql = (0 until VDim)
        .map(i => s"count(*) FILTER (WHERE d = $i) AS c$i").mkString(",\n    ")
      val n2Sql = (0 until VDim).map(i => s"c$i*c$i").mkString(" + ")
      val dotSql = (0 until VDim).map(i => s"x.c$i*y.c$i").mkString(" + ")
      s"""WITH sh AS (
         |  SELECT source, doc_id, sh FROM (
         |    SELECT source, doc_id, ${hashedShinglesSql("t")} AS sh
         |    FROM (SELECT source, doc_id, $toksSql AS t FROM documents))
         |  WHERE len(sh) > 0),
         |tok AS (
         |  SELECT source, doc_id, tok % $VDim AS d
         |  FROM (SELECT source, doc_id, unnest(sh) AS tok FROM sh)),
         |v AS (
         |  SELECT source, doc_id,
         |    $countsSql
         |  FROM tok GROUP BY 1, 2),
         |n AS (SELECT *, ($n2Sql) AS n2 FROM v)
         |SELECT * FROM (
         |  SELECT x.source AS source, x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    CAST(($dotSql) AS DOUBLE)
         |      / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) AS cosine
         |  FROM n x JOIN n y ON x.source = y.source AND x.doc_id < y.doc_id)
         |WHERE cosine >= 0.85
         |ORDER BY 1, 2, 3""".stripMargin
    },

    "llm_ngram_jaccard" ->
      s"""WITH d AS (
         |  SELECT source, lang, doc_id, sh FROM (
         |    SELECT source, lang, doc_id, ${hashedShinglesSql("t")} AS sh
         |    FROM (SELECT source, lang, doc_id, $toksSql AS t FROM documents))
         |  WHERE len(sh) > 0)
         |SELECT * FROM (
         |  SELECT x.source AS source, x.lang AS lang,
         |    x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    ${jaccardSql("x.sh", "y.sh")} AS jaccard
         |  FROM d x JOIN d y ON x.source = y.source AND x.lang = y.lang
         |    AND x.doc_id < y.doc_id)
         |WHERE jaccard >= 0.1
         |ORDER BY 1, 2, 3, 4""".stripMargin
  )
}
