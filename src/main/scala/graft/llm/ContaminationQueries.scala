package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextOps._

/** Span-level contamination / duplication operators over `documents` —
  * the n-gram-overlap family of a training-data pipeline (distinct from
  * the whole-document near-dup family in [[DedupQueries]]):
  *
  *  - benchmark decontamination: flag corpus documents sharing any
  *    word 5-gram with a held-out eval set (the GPT-3/PaLM-style
  *    n-gram-collision decontamination pass, run before training so
  *    benchmark text never leaks into the corpus).
  *  - cross-document span duplication: per-document fraction of word
  *    8-grams that appear in at least one OTHER document — the
  *    span-level signal behind exact-substring dedup ("Deduplicating
  *    Training Data Makes Language Models Better"-style), where
  *    document-level near-dup misses partially-copied text.
  *  - maximal duplicated token run: per-document longest contiguous
  *    span whose every positioned 6-gram occurs in another document —
  *    the exact-substring-dedup cut variable (fraction tells you HOW
  *    MUCH is duplicated; this tells you WHERE and HOW CONTIGUOUS).
  *  - intra-document repetition: duplicate-bigram and top-bigram
  *    fractions (Gopher-style repetition quality gates).
  *
  * Scale shapes (100 TB):
  *  - decontamination: the eval set is small by nature (benchmarks are
  *    thousands of docs, not billions) → its distinct gram set is
  *    BROADCAST; the corpus side is one linear explode feeding a
  *    broadcast-hash semi-join + per-doc partial-agg count. The corpus
  *    is never shuffled by gram.
  *  - span duplication: gram→doc-count is a partial-agg groupBy on
  *    uniformly-hashed 64-bit keys (map-side combine absorbs the
  *    explode fan-out); the dup-gram join back to docs is a plain
  *    equi-join on the same uniform key. Never all-pairs.
  *  - repetition: pure per-row expression work, zero shuffle.
  *
  * Determinism: grams are the shared md5-prefix hashes of [[TextOps]];
  * ratios are one IEEE double division of exact ints — every value is
  * bit-identical in the DuckDB oracle twins.
  */
object ContaminationQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Decontamination gram size (5 consecutive words). */
  val DecontamN = 5

  /** 1-in-N eval-set membership rate (md5-derived, reproducible). */
  val EvalMod = 10

  /** Span-duplication gram size: 8 consecutive words — long enough
    * that a shared gram is near-certain copied text, the standard
    * exact-substring dedup scale.
    */
  val SpanN = 8

  /** Positioned-gram size for maximal-run detection (6 consecutive
    * words): short enough that a long copied span covers many
    * consecutive positions, long enough that noise collisions are
    * negligible.
    */
  val DupSpanN = 6

  /** A duplicated span is "trim-worthy" at >= this many TOKENS — the
    * substring-dedup cut threshold (a 6-gram run of r positions spans
    * r + 5 tokens).
    */
  val MinDupSpan = 12

  val defs: Map[String, QFn] = Map(

    // --- benchmark decontamination --------------------------------------
    // The held-out "benchmark" is a deterministic md5-hash 1-in-10
    // subset of the corpus (a stand-in for a real eval suite); every
    // NON-eval doc reports how many of its distinct word 5-grams occur
    // anywhere in the eval set. Any hit marks the doc contaminated —
    // the conservative rule decontamination passes use.
    "llm_decontaminate" -> { (s, dir) =>
      import s.implicits._
      val isEval =
        hash32(concat(lit("eval:"), $"doc_id".cast("string"))) % EvalMod === 0
      val g = Tables(s, dir).documents
        .select($"doc_id", isEval.as("is_eval"),
          hashedNgrams($"text", DecontamN).as("sh"))
        .filter(size($"sh") > 0)
      val evalGrams = g.filter($"is_eval")
        .select(explode($"sh").as("g")).distinct()
      val corpus = g.filter(!$"is_eval")
      // grams are distinct per doc, so count(*) = distinct hit grams
      val hits = corpus.select($"doc_id", explode($"sh").as("g"))
        .join(broadcast(evalGrams), "g")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
      corpus.select($"doc_id", size($"sh").as("n_grams"))
        .join(hits, Seq("doc_id"), "left")
        .select($"doc_id", $"n_grams",
          coalesce($"n_hits", lit(0L)).as("n_hits"))
        .withColumn("contaminated", $"n_hits" > 0)
        .orderBy($"doc_id")
    },

    // --- cross-document span duplication --------------------------------
    // Per-doc fraction of distinct word 8-grams shared with ≥1 other
    // document. Grams are distinct per doc, so the gram table's
    // count(*) IS its document frequency.
    "llm_span_dedup" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents
        .select($"doc_id", hashedNgrams($"text", SpanN).as("sh"))
        .filter(size($"sh") > 0)
      val grams = d.select($"doc_id", explode($"sh").as("g"))
      val dupGrams = grams.groupBy($"g")
        .agg(count(lit(1)).as("df")).filter($"df" >= 2)
      val dup = grams.join(dupGrams.select($"g"), "g")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_dup"))
      d.select($"doc_id", size($"sh").as("n_grams"))
        .join(dup, Seq("doc_id"), "left")
        .select($"doc_id", $"n_grams",
          coalesce($"n_dup", lit(0L)).as("n_dup"))
        .withColumn("dup_frac", $"n_dup".cast("double") / $"n_grams")
        .orderBy($"doc_id")
    },

    // --- maximal duplicated token run (substring-dedup spans) -----------
    // The decision variable of exact-substring dedup (Lee et al.-style):
    // per doc, the LONGEST contiguous token span whose every 6-gram
    // also occurs in another document. llm_span_dedup reports the
    // duplicated FRACTION; this reports the duplicated GEOMETRY — a doc
    // with one long verbatim-copied block and a doc with scattered
    // single-gram hits have the same fraction but opposite trim
    // decisions. Positioned (non-distinct) grams → cross-doc df >= 2
    // filter → per-doc gaps-and-islands over the surviving positions.
    // Scale: the gram-df agg is a partial-agg groupBy on uniform 64-bit
    // hashes; the islands window shuffles only DUPLICATED positions by
    // doc_id (a small fraction of the corpus). Never all-pairs.
    "llm_dup_spans" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val t = tokens($"text")
      // positioned grams: (pos, hash of the 6-word window at pos)
      val posGrams = transform(sequence(lit(1), size(t) - (DupSpanN - 1)),
        i => struct((i - 1).cast("int").as("pos"),
          hash32(concat_ws(" ",
            (0 until DupSpanN).map(k => element_at(t, i + k)): _*)).as("g")))
      val grams = Tables(s, dir).documents
        .filter(size(t) >= DupSpanN)
        .select($"doc_id", explode(posGrams).as("pg"))
        .select($"doc_id", $"pg.pos".as("pos"), $"pg.g".as("g"))
      // duplicated = the gram occurs in >= 2 DISTINCT docs (a gram
      // repeated inside one doc is llm_doc_repetition's signal, not
      // cross-doc duplication)
      val dupg = grams.groupBy($"g")
        .agg(countDistinct($"doc_id").as("nd")).filter($"nd" >= 2)
        .select($"g")
      // islands: consecutive duplicated positions share (pos - rank)
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      val runs = grams.join(dupg, "g")
        .withColumn("grp", $"pos" - row_number().over(w))
        .groupBy($"doc_id", $"grp")
        .agg(count(lit(1)).as("run_len"))
      val summ = runs.groupBy($"doc_id").agg(
        max($"run_len").as("max_run"),
        sum(when($"run_len" + (DupSpanN - 1) >= MinDupSpan, 1L)
          .otherwise(0L)).as("n_long_runs"),
        sum($"run_len").as("n_dup_pos"))
      Tables(s, dir).documents
        .filter(size(t) >= DupSpanN)
        .select($"doc_id", (size(t) - (DupSpanN - 1)).as("n_pos"))
        .join(summ, Seq("doc_id"), "left")
        .select($"doc_id", $"n_pos",
          coalesce(($"max_run" + (DupSpanN - 1)).cast("int"), lit(0))
            .as("max_dup_span"),
          coalesce($"n_long_runs", lit(0L)).as("n_long_runs"),
          (coalesce($"n_dup_pos", lit(0L)).cast("double") / $"n_pos")
            .as("dup_pos_frac"),
          (coalesce($"max_run" + (DupSpanN - 1), lit(0L)) >= MinDupSpan)
            .as("would_trim"))
        .orderBy($"doc_id")
    },

    // --- intra-document repetition (Gopher-style gates) -----------------
    // Duplicate-bigram fraction (what share of bigram slots repeat an
    // earlier bigram) and top-bigram fraction (share taken by the single
    // most frequent bigram). The per-row mode count is O(distinct ×
    // total) HOF work over ≤ ~100-token documents — bounded per row,
    // zero shuffle.
    "llm_doc_repetition" -> { (s, dir) =>
      import s.implicits._
      val t = tokens($"text")
      val bg = transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))
      Tables(s, dir).documents
        .filter(size(t) >= 2)
        .select($"doc_id", bg.as("bg"))
        .select($"doc_id",
          size($"bg").as("n_bigrams"),
          size(array_distinct($"bg")).as("n_distinct"),
          array_max(transform(array_distinct($"bg"),
            v => size(filter($"bg", x => x === v)))).as("top_count"))
        .withColumn("dup_frac",
          ($"n_bigrams" - $"n_distinct").cast("double") / $"n_bigrams")
        .withColumn("top_frac", $"top_count".cast("double") / $"n_bigrams")
        .withColumn("repetitive", $"top_frac" > 0.1)
        .orderBy($"doc_id")
    }
  )

  // ------------------------------------------------------------- oracles

  private def gramsSql(n: Int): String =
    s"""SELECT doc_id, sh FROM (
       |    SELECT doc_id, ${hashedNgramsSql("t", n)} AS sh
       |    FROM (SELECT doc_id, $toksSql AS t FROM documents))
       |  WHERE len(sh) > 0""".stripMargin

  /** Raw (non-distinct) word-bigram list over a tokens expression. */
  private def rawBigramsSql(t: String): String =
    s"[$t[i] || ' ' || $t[i+1] for i in range(1, len($t))]"

  val oracles: Map[String, String] = Map(

    "llm_decontaminate" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    ${hash32Sql(s"'eval:' || CAST(doc_id AS VARCHAR)")} % $EvalMod = 0
         |      AS is_eval, sh
         |  FROM (${gramsSql(DecontamN)})),
         |eg AS (SELECT DISTINCT unnest(sh) AS gr FROM g WHERE is_eval),
         |corp AS (SELECT doc_id, sh FROM g WHERE NOT is_eval),
         |hits AS (
         |  SELECT doc_id, count(*) AS n_hits
         |  FROM (SELECT doc_id, unnest(sh) AS gr FROM corp)
         |  JOIN eg USING (gr) GROUP BY 1)
         |SELECT c.doc_id, CAST(len(c.sh) AS INT) AS n_grams,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  coalesce(h.n_hits, 0) > 0 AS contaminated
         |FROM corp c LEFT JOIN hits h ON h.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "llm_span_dedup" ->
      s"""WITH d AS (${gramsSql(SpanN)}),
         |grams AS (SELECT doc_id, unnest(sh) AS g FROM d),
         |dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
         |dup AS (
         |  SELECT doc_id, count(*) AS n_dup
         |  FROM grams JOIN dupg USING (g) GROUP BY 1)
         |SELECT d.doc_id, CAST(len(d.sh) AS INT) AS n_grams,
         |  CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup,
         |  CAST(coalesce(dup.n_dup, 0) AS DOUBLE) / len(d.sh) AS dup_frac
         |FROM d LEFT JOIN dup ON dup.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "llm_dup_spans" -> {
      val gramElem = (0 until DupSpanN)
        .map(k => if (k == 0) "t[i]" else s"t[i+$k]").mkString(" || ' ' || ")
      val tail = DupSpanN - 1 // tokens a run adds beyond its positions
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS t FROM documents),
         |pg AS (
         |  SELECT doc_id,
         |    unnest([{'pos': i - 1, 'g': ${hash32Sql(gramElem)}}
         |            for i in range(1, len(t) - ${DupSpanN - 2})]) AS u
         |  FROM toks WHERE len(t) >= $DupSpanN),
         |p AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM pg),
         |dupg AS (SELECT g FROM p GROUP BY g
         |         HAVING count(DISTINCT doc_id) >= 2),
         |runs AS (
         |  SELECT doc_id, count(*) AS run_len
         |  FROM (SELECT doc_id, pos,
         |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |            AS grp
         |        FROM p JOIN dupg USING (g))
         |  GROUP BY doc_id, grp),
         |summ AS (
         |  SELECT doc_id, max(run_len) AS max_run,
         |    CAST(sum(CASE WHEN run_len + $tail >= $MinDupSpan
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_long_runs,
         |    CAST(sum(run_len) AS BIGINT) AS n_dup_pos
         |  FROM runs GROUP BY doc_id),
         |base AS (SELECT doc_id, CAST(len(t) - $tail AS INT) AS n_pos
         |         FROM toks WHERE len(t) >= $DupSpanN)
         |SELECT b.doc_id, b.n_pos,
         |  CAST(coalesce(s.max_run + $tail, 0) AS INT) AS max_dup_span,
         |  CAST(coalesce(s.n_long_runs, 0) AS BIGINT) AS n_long_runs,
         |  CAST(coalesce(s.n_dup_pos, 0) AS DOUBLE) / b.n_pos AS dup_pos_frac,
         |  coalesce(s.max_run + $tail, 0) >= $MinDupSpan AS would_trim
         |FROM base b LEFT JOIN summ s USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin
    },

    "llm_doc_repetition" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${rawBigramsSql("t")} AS bg
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents)
         |  WHERE len(t) >= 2),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(bg) AS INT) AS n_bigrams,
         |    CAST(len(list_distinct(bg)) AS INT) AS n_distinct,
         |    CAST(list_max(list_transform(list_distinct(bg),
         |      v -> len(list_filter(bg, x -> x = v)))) AS INT) AS top_count
         |  FROM b)
         |SELECT doc_id, n_bigrams, n_distinct, top_count,
         |  (n_bigrams - n_distinct)::DOUBLE / n_bigrams AS dup_frac,
         |  top_count::DOUBLE / n_bigrams AS top_frac,
         |  top_count::DOUBLE / n_bigrams > 0.1 AS repetitive
         |FROM m ORDER BY doc_id""".stripMargin
  )
}
