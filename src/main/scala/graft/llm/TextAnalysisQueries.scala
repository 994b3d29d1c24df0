package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextOps._

/** Text-analysis operator family over `documents`: per-document quality
  * statistics, marker-word language identification, token counting
  * (whitespace + a BPE-ish subword estimate), and a rolling-hash
  * document fingerprint.
  *
  * All four are pure per-row Catalyst expression pipelines — no
  * shuffle at all except the final gate-only `orderBy` — so they scale
  * linearly: at 100 TB they are a single embarrassingly-parallel scan.
  * Ratios are one IEEE double division of exact ints (bitwise
  * reproducible); folds are sequential left-folds with the identical
  * operation order in Spark (`aggregate`) and DuckDB
  * (`list_reduce(list_prepend(init, …))`).
  */
object TextAnalysisQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** (language, marker words) in fixed priority order — ties in the
    * arg-max resolve to the earliest entry in both engines.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "des", "et"),
    "zh" -> Seq("de", "shi", "le", "bu"))

  /** Shared with the corpus-curation composite in [[DedupQueries]]. */
  val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Training-chunk assembly: window/stride in whitespace tokens. A doc
    * shorter than the window yields exactly one chunk; otherwise chunks
    * start every `ChunkStride` tokens and the LAST start is the first
    * one whose window reaches the end of the doc — no chunk is ever
    * fully contained in its predecessor.
    */
  val ChunkWindow = 40
  val ChunkStride = 32

  /** Winnowing fingerprint parameters: k-token grams, window of W
    * consecutive gram hashes (guarantee threshold = W + K − 1 tokens).
    */
  val WinnowK = 4
  val WinnowW = 5

  /** Shard count for the training-shard writer (`llm_corpus_shard`) —
    * in production this is the writer-task fan-out.
    */
  val CorpusShards = 64

  /** Hashed-feature buckets for the DSIR importance model — bounded, so
    * the per-bucket ratio table always broadcasts.
    */
  val DsirBuckets = 1024L

  /** Output shards for the token-balanced shard assignment. */
  val NumShards = 8

  /** PII patterns — deliberately RE2-compatible (no backrefs, no
    * lookaround) so Spark's Java regex and DuckDB's RE2 match the same
    * spans.
    */
  val EmailPattern = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val PhonePattern = "555-[0-9]{4}"

  /** Quality-model constants: the stopword term peaks at 30% stopword
    * density (natural prose), and the keep threshold sits near the
    * fixture's 10th score percentile — a real gate, not a rubber stamp.
    */
  val QualityStopTargetPpm = 300000L
  val QualityKeepThreshold = 2200000L

  /** Hashed-vocabulary bucket count for `llm_corpus_drift` — the
    * drift "feature table" is exactly this many rows at ANY corpus
    * size, which is what keeps the monitor broadcast-bounded.
    */
  val DriftBuckets = 64L

  val defs: Map[String, QFn] = Map(

    // --- corpus snapshot drift monitor ----------------------------------
    // Distribution shift between two corpus snapshots (here the
    // deterministic doc_id-parity halves standing in for crawl N vs
    // crawl N+1): token mass per hashed-vocabulary bucket, compared as
    // exact ppm shares with an L1 drift term per bucket. The pipeline
    // answer to "did the new crawl change the corpus?" BEFORE any
    // training run pays for the answer. Shape: one token scan folding
    // into a DriftBuckets×2 counter table (map-side partial agg), then
    // window totals over the bucket-bounded result — the corpus is
    // touched once, the compare is O(buckets), and every share is an
    // exact integer so both engines agree bitwise.
    "llm_corpus_drift" -> { (s, dir) =>
      import s.implicits._
      val tok = Tables(s, dir).documents
        .select((($"doc_id" % 2) === 0).as("is_ref"),
          explode(tokens($"text")).as("t"))
      tok.groupBy((hash32($"t") % DriftBuckets).as("bucket"))
        .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("c_ref"),
          sum(when(!$"is_ref", 1L).otherwise(0L)).as("c_cur"))
        .withColumn("share_ref_ppm",
          expr("(1000000 * c_ref) div (sum(c_ref) over ())"))
        .withColumn("share_cur_ppm",
          expr("(1000000 * c_cur) div (sum(c_cur) over ())"))
        .withColumn("drift_ppm", abs($"share_ref_ppm" - $"share_cur_ppm"))
        .orderBy($"bucket")
    },

    // --- per-document quality statistics --------------------------------
    "llm_text_stats" -> { (s, dir) =>
      import s.implicits._
      val t = tokens($"text")
      Tables(s, dir).documents
        .select($"doc_id",
          length($"text").as("n_chars"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_distinct"),
          size(filter(t, c => c.isin(stopwords.map(lit): _*))).as("n_stop"))
        .withColumn("ttr", $"n_distinct".cast("double") / $"n_tokens")
        .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_tokens")
        .withColumn("avg_token_len",
          ($"n_chars" - $"n_tokens" + 1).cast("double") / $"n_tokens")
        .orderBy($"doc_id")
    },

    // --- model-based quality scoring (linear classifier shape) ----------
    // The fasttext-style quality-classifier SHAPE the big pipeline
    // papers gate on: per-doc features → fixed-weight linear score →
    // threshold keep. Features and weights stay exact int64 (ppm
    // ratios via integer division, a banded stopword term peaking at
    // 30%, a capped length term), so the score is bit-identical in
    // both engines with zero float ops — swapping in LEARNED weights
    // changes the constants, not the plan: one per-row scan.
    "llm_quality_model" -> { (s, dir) =>
      import s.implicits._
      val t = tokens($"text")
      Tables(s, dir).documents
        .select($"doc_id",
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_distinct"),
          size(filter(t, c => c.isin(stopwords.map(lit): _*)))
            .cast("long").as("n_stop"))
        .withColumn("ttr_ppm", expr("(1000000 * n_distinct) div n_tokens"))
        .withColumn("stop_ppm", expr("(1000000 * n_stop) div n_tokens"))
        .withColumn("quality_score",
          lit(2L) * $"ttr_ppm" +
            (lit(1000000L) - abs($"stop_ppm" - lit(QualityStopTargetPpm))) +
            least($"n_tokens", lit(100L)) * lit(10000L))
        .select($"doc_id", $"n_tokens", $"ttr_ppm", $"stop_ppm",
          $"quality_score",
          ($"quality_score" >= QualityKeepThreshold).as("keep"))
        .orderBy($"doc_id")
    },

    // --- marker-word language identification ----------------------------
    "llm_lang_id" -> { (s, dir) =>
      import s.implicits._
      val dt = array_distinct(tokens($"text"))
      val scored = Tables(s, dir).documents
        .select(Seq($"doc_id", $"lang") ++ langMarkers.map { case (l, ms) =>
          size(array_intersect(dt, array(ms.map(lit): _*))).as(s"score_$l")
        }: _*)
      val mx = greatest(langMarkers.map { case (l, _) => col(s"score_$l") }: _*)
      val predicted = langMarkers.tail.foldLeft(
        when(langMarkers.head match { case (l, _) => col(s"score_$l") === mx },
          langMarkers.head._1)) { case (acc, (l, _)) =>
        acc.when(col(s"score_$l") === mx, l)
      }
      scored
        .withColumn("predicted", predicted)
        .orderBy($"doc_id")
    },

    // --- whitespace + BPE-ish subword token counting --------------------
    "llm_token_count" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id",
          size(tokens($"text")).as("n_ws_tokens"),
          subwordCost($"text").as("n_subwords"))
        .orderBy($"doc_id")
    },

    // --- per-source corpus length statistics (exact deciles) ------------
    "llm_corpus_stats" -> { (s, dir) =>
      import s.implicits._
      corpusStats(Tables(s, dir).documents
        .select($"source", size(tokens($"text")).as("n_tokens")))
    },

    // --- greedy sequence packing (training-batch assembly) --------------
    // Pack documents into fixed token-budget bins: within each source
    // (packing domain), docs in deterministic doc_id order accumulate a
    // running subword total and a doc's bin is its PRECEDING total div
    // budget — the classic greedy concatenation packing a pretraining
    // pipeline runs before batching. All integer arithmetic; the
    // running sum is a per-source window (parallel across sources), so
    // no global sequential bottleneck. Output is the per-bin summary.
    "llm_seq_pack" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val budget = 2048L
      val t = Tables(s, dir).documents
        .select($"source", $"doc_id", subwordCost($"text").as("n_subwords"))
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("running", sum($"n_subwords").over(w))
        .withColumn("bin", expr(s"(running - n_subwords) div $budget"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_subwords").as("bin_tokens"))
        .orderBy($"source", $"bin")
    },

    // --- temperature-weighted domain mixing -----------------------------
    // Per-source sampling weights for corpus mixing: the uniform share
    // (proportional to token count) and a sqrt-temperature share
    // (∝ tokens^0.5 — the standard "flatten the source distribution"
    // reweighting that upsamples small high-quality sources). All
    // cross-row arithmetic is INTEGER (token sums, floor(sqrt) weights,
    // ppm floor-division), so results are order-independent and
    // bit-exact in both engines; the only double is the final
    // boost ratio of two exact ints. Note: ppm shares multiply token
    // counts by 10^6 — exact up to ~9·10^12 tokens per source in int64;
    // beyond that, pre-scale the counts (same floor-division shape).
    // Scale: one partial-agg groupBy over sources + a 1-row broadcast.
    "llm_domain_mix" -> { (s, dir) =>
      import s.implicits._
      val perSource = Tables(s, dir).documents
        .select($"source", subwordCost($"text").as("n_subwords"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_subwords").as("total_tokens"))
        .withColumn("w", floor(sqrt($"total_tokens".cast("double"))))
      val totals = perSource.agg(
        sum($"total_tokens").as("sum_tokens"), sum($"w").as("sum_w"))
      perSource.crossJoin(broadcast(totals))
        .select($"source", $"n_docs", $"total_tokens", $"w",
          expr("total_tokens * 1000000 div sum_tokens").as("share_ppm"),
          expr("w * 1000000 div sum_w").as("temp_share_ppm"))
        .withColumn("boost",
          $"temp_share_ppm".cast("double") / $"share_ppm")
        .orderBy($"source")
    },

    // --- temperature-resampled source mixing -----------------------------
    // EXECUTES the mixing plan llm_domain_mix only reports: per-source
    // sampling quotas follow the temperature-T=2 distribution
    // (w ∝ √n_docs), the corpus-wide target is half the corpus, and the
    // per-doc keep decision is the same deterministic md5 hash the
    // stratified sampler uses — reproducible across runs and engines.
    // ALL arithmetic is exact int64 (floor-div quotas, ppm rates,
    // integer hash compare): no float drift anywhere. Scale: one
    // partial-agg groupBy over sources, a source-count-bounded
    // broadcast of the rate table, one corpus scan for the decision.
    "llm_mix_sample" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents.select($"doc_id", $"source")
      val per = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt($"n_docs".cast("double"))))
      val tot = per.agg(sum($"n_docs").as("n_total"), sum($"w").as("sum_w"))
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("quota", expr("(n_total div 2) * w div sum_w"))
        .withColumn("rate_ppm",
          least(lit(1000000L), expr("quota * 1000000 div n_docs")))
        .select($"source", $"n_docs", $"quota", $"rate_ppm")
      docs.join(broadcast(rates), "source")
        .groupBy($"source", $"n_docs", $"quota", $"rate_ppm")
        .agg(sum(when(hash32(concat(lit("mix:"), $"doc_id".cast("string")))
            % 1000000 < $"rate_ppm", 1L).otherwise(0L)).as("n_sampled"))
        .orderBy($"source")
    },

    // --- token-balanced training-shard assignment ------------------------
    // The last step of data prep: route docs into N output shards with
    // BALANCED token counts (uniform hash balances doc counts, not
    // work — a shard that draws the long docs stalls the trainer).
    // Scale-honest two-level shape: docs bucket into log2 size classes
    // (integer bit width, q34's trick), and round-robin WITHIN each
    // class by a per-class window — same-sized docs spread evenly, so
    // per-shard token sums differ by at most one doc per class. No
    // global sort, no single-partition window: the class-keyed window
    // shuffles once and every class ranks in parallel.
    "llm_shard_balance" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val t = tokens($"text")
      val d = Tables(s, dir).documents
        .select($"doc_id", size(t).cast("long").as("n_tokens"))
        .withColumn("bits", length(bin($"n_tokens")))
      val w = Window.partitionBy($"bits").orderBy($"n_tokens".desc, $"doc_id")
      d.withColumn("shard",
          ((row_number().over(w) - 1) % NumShards).cast("long"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"))
        .orderBy($"shard")
    },

    // --- DSIR-style importance weights (target-vs-raw n-gram ratio) ------
    // Data Selection via Importance Resampling (Xie et al., NeurIPS
    // 2023): score each raw doc by how much its hashed-feature profile
    // resembles a TARGET distribution vs the RAW corpus. Features are
    // unigrams hashed into DsirBuckets buckets (the paper's hashed
    // n-gram model); the target here is the `lang = 'en'` slice. Per
    // bucket the add-one-smoothed target/raw ratio in exact ppm
    // replaces the paper's log-ratio (ln is not IEEE-exact across
    // engines; the per-doc MEAN ratio ranks the same tail), and a doc
    // is selected when its mean ratio beats the CORPUS mean ratio —
    // above-average target-likeness, the resampling cutoff, decided by
    // an exact integer cross-multiplication. Scale: the feature table
    // is bucket-bounded (1024 rows → broadcast, and the corpus totals
    // derive from it, not from a second corpus scan); everything else
    // is one token-stream scan + a per-doc partial agg. The cutoff
    // cross-product stays int64-exact up to ~10^18 / (10^6·tokens-per-
    // doc) corpus tokens; past that the compare would move to scaled
    // integers.
    "llm_dsir_weights" -> { (s, dir) =>
      import s.implicits._
      // ONE hashed-token pass: the md5-derived bucket hash is the
      // query's dominant per-row cost, so the token stream folds first
      // into per-(doc, bucket) counts, and BOTH the feature table and
      // the per-doc weights derive from that (weight_sum = Σ c·ratio —
      // the same integers as summing per token). Previously the
      // explode+hash pipeline ran twice: once under feat, once under
      // the join-back.
      val db = IndexArtifacts.cachedIndex(s, dir, "dsir-doc-buckets",
        Seq(s"$dir/documents.parquet"))(Tables(s, dir).documents
          .select($"doc_id", $"lang", explode(tokens($"text")).as("term"))
          .select($"doc_id", $"lang",
            pmod(hash32($"term"), lit(DsirBuckets)).as("f"))
          .groupBy($"doc_id", $"lang", $"f").agg(count(lit(1)).as("c")))
      val feat = db.groupBy($"f").agg(
          sum($"c").as("rc"),
          sum(when($"lang" === "en", $"c").otherwise(0L)).as("tc"))
        .withColumn("ratio_ppm", expr("(tc + 1) * 1000000 div (rc + 1)"))
      val tot = feat.agg(sum($"rc").as("n_tot"),
        sum($"rc" * $"ratio_ppm").as("w_tot"))
      db.join(broadcast(feat.select($"f", $"ratio_ppm")), "f")
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          sum($"c" * $"ratio_ppm").as("weight_sum"))
        .crossJoin(broadcast(tot))
        .withColumn("selected", $"weight_sum" * $"n_tot" > $"w_tot" * $"n_tokens")
        .select($"doc_id", $"n_tokens", $"weight_sum", $"selected")
        .orderBy($"doc_id")
    },

    // --- token-budget greedy fill (quality-ordered selection) ------------
    // The selection step after scoring: each source gets a token budget
    // (half its tokens), docs fill it in quality order (TTR ppm desc,
    // doc_id tiebreak) until the cumulative token count crosses the
    // budget — the curriculum-style "best docs until the budget is
    // spent" cut every pretraining mix executes. All arithmetic exact
    // int64; the keep decision is a window cumsum compare. Scale: the
    // budget table is source-bounded (broadcast); the cumsum is a
    // per-source window — a skewed giant source shards the same way as
    // llm_corpus_stats' documented two-level rank.
    "llm_token_budget_fill" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val t = tokens($"text")
      val d = Tables(s, dir).documents.select($"doc_id", $"source",
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_distinct"))
        .withColumn("score_ppm", expr("n_distinct * 1000000 div n_tokens"))
      val budget = d.groupBy($"source")
        .agg(expr("sum(n_tokens) div 2").as("budget"))
      val w = Window.partitionBy($"source")
        .orderBy($"score_ppm".desc, $"doc_id")
      d.join(broadcast(budget), "source")
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .withColumn("kept", $"cum_tokens" <= $"budget")
        .select($"doc_id", $"source", $"n_tokens", $"score_ppm",
          $"cum_tokens", $"kept")
        .orderBy($"doc_id")
    },

    // --- training-shard writer (deterministic corpus shuffle) ------------
    // The last step of every curation pipeline: assign each document a
    // SHARD and a reproducible position inside it, so a training run
    // reads the same permutation every time. Shard = hash(doc) mod N
    // (uniform, key-free — no global rank, no single-partition
    // bottleneck); within-shard order = (hash, doc_id). The output pins
    // the full permutation, not just membership: `order_checksum` is a
    // position-weighted exact-int64 sum, so ANY reordering inside any
    // shard changes it. 100 TB shape: one hash-keyed shuffle into N
    // writer partitions + a per-shard window — exactly how the shard
    // files would be written (partitionBy(shard), sortWithinPartitions).
    "llm_corpus_shard" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir).documents
        .select($"doc_id", $"n_chars",
          TextOps.hash32(concat(lit("shard:"), $"doc_id".cast("string")))
            .as("h"))
        .withColumn("shard", ($"h" % CorpusShards).cast("int"))
      val w = Window.partitionBy($"shard").orderBy($"h".asc, $"doc_id".asc)
      d.withColumn("pos", row_number().over(w))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          sum($"pos" * ($"doc_id" % 1000003L)).as("order_checksum"))
        .orderBy($"shard")
    },

    // --- rolling-hash document fingerprint ------------------------------
    // --- winnowing fingerprints (MOSS selection scheme) ------------------
    // The document-fingerprint standard for plagiarism/overlap
    // detection: hash every k-token gram POSITIONALLY, slide a window
    // of WinnowW consecutive gram hashes, keep each window's minimum,
    // dedupe. Guarantees every WinnowW-gram stretch contributes a
    // fingerprint, so any sufficiently long shared passage between two
    // docs shares a fingerprint — while storing ~1/W of the grams.
    // Per-row expression work only (O(len·W) per doc); the emitted
    // summary (count + order-free exact-int sum + min/max) is
    // array-order-independent, so engine-side distinct ordering
    // differences cannot break parity.
    "llm_winnow_fingerprint" -> { (s, dir) =>
      import s.implicits._
      val K = WinnowK
      val W = WinnowW
      Tables(s, dir).documents
        .select($"doc_id", tokens($"text").as("t"))
        .withColumn("ph", when(size($"t") >= K, expr(
          s"""transform(sequence(1, size(t) - ${K - 1}),
             |  i -> CAST(conv(substring(md5(
             |         array_join(slice(t, i, $K), ' ')), 1, 8), 16, 10)
             |       AS BIGINT))""".stripMargin))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
        .withColumn("wins",
          when(size($"ph") >= W, expr(
            s"""transform(sequence(1, size(ph) - ${W - 1}),
               |  j -> array_min(slice(ph, j, $W)))""".stripMargin))
            .when(size($"ph") > 0, array(array_min($"ph")))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
        .withColumn("fps", array_distinct($"wins"))
        .select($"doc_id", size($"fps").cast("long").as("n_fps"),
          expr("aggregate(fps, 0L, (acc, x) -> acc + x)").as("fp_sum"),
          array_min($"fps").as("min_fp"), array_max($"fps").as("max_fp"))
        .orderBy($"doc_id")
    },

    "llm_fingerprint" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id",
          // Left-fold polynomial hash over character codepoints,
          // acc' = (acc * 31 + code) mod 1e9+7 — same sequential order
          // as the DuckDB list_reduce twin.
          expr("""aggregate(
                 |  transform(sequence(1, length(text)),
                 |            i -> ascii(substr(text, i, 1))),
                 |  0L, (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin)
            .as("fingerprint"))
        .orderBy($"doc_id")
    },

    // --- stride-windowed token chunking (training-chunk assembly) -------
    // Split each doc into ChunkWindow-token chunks every ChunkStride
    // tokens (8-token overlap) — the chunking step a pretraining /
    // RAG-indexing pipeline runs between curation and packing. Pure
    // per-row explode: an embarrassingly parallel scan, rows only fan
    // out by ~n_tokens/stride. The last chunk start is
    // 1 + stride·ceil((n − window)/stride), so every token lands in
    // at least one chunk and no chunk is a subset of its predecessor.
    "llm_doc_chunks" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", tokens($"text").as("toks"))
        .withColumn("n", size($"toks"))
        .withColumn("start", explode(expr(
          s"""sequence(1,
             |  1 + $ChunkStride *
             |    ((greatest(n - $ChunkWindow, 0) + ${ChunkStride - 1})
             |     div $ChunkStride),
             |  $ChunkStride)""".stripMargin)))
        .select($"doc_id",
          expr(s"(start - 1) div $ChunkStride").cast("int").as("chunk_idx"),
          $"start".cast("int").as("chunk_start"),
          least(lit(ChunkWindow), $"n" - $"start" + 1).cast("int")
            .as("n_chunk_tokens"),
          hash32(array_join(slice($"toks", $"start", lit(ChunkWindow)), " "))
            .as("chunk_hash"))
        .orderBy($"doc_id", $"chunk_idx")
    },

    // --- PII detection + redaction ---------------------------------------
    // The scrub step of a curation pipeline: count and redact
    // email/phone spans with RE2-safe patterns. The fixture corpus
    // carries no PII, so a deterministic doc_id-derived contact suffix
    // is appended first (the plumbing under test is the detect/redact
    // scan itself, which is pure per-row regex work — no shuffle).
    "llm_pii_scrub" -> { (s, dir) =>
      import s.implicits._
      val suffix =
        when($"doc_id" % 5 === 1,
          concat(lit(" contact user"), $"doc_id", lit("@example.com now")))
        .when($"doc_id" % 5 === 2,
          concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
            lit(" today")))
        .when($"doc_id" % 5 === 3,
          concat(lit(" mail a"), $"doc_id", lit("@b.org or 555-"),
            lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit(""))
      val redacted = regexp_replace(
        regexp_replace($"t2", lit(EmailPattern), lit("[EMAIL]")),
        lit(PhonePattern), lit("[PHONE]"))
      Tables(s, dir).documents
        .select($"doc_id", concat($"text", suffix).as("t2"))
        .select($"doc_id",
          size(regexp_extract_all($"t2", lit(EmailPattern), lit(0))).as("n_emails"),
          size(regexp_extract_all($"t2", lit(PhonePattern), lit(0))).as("n_phones"),
          hash32(redacted).as("clean_hash"),
          length(redacted).as("clean_len"))
        .orderBy($"doc_id")
    },

    // --- BPE merge-candidate pair statistics ------------------------------
    // The first iteration of BPE/WordPiece vocabulary induction at
    // corpus scale: count adjacent symbol (character) pairs inside
    // words, weighted by word frequency — the statistic argmaxed to
    // pick each merge. The scale trick is aggregating the CORPUS into
    // its vocabulary first (distinct words + frequencies, a keyed
    // partial agg that absorbs the token stream map-side); the pair
    // explode then runs over the vastly smaller vocab table and each
    // pair count is one more keyed partial agg. Top-k is
    // TakeOrderedAndProject — no global sort. Iterating BPE re-runs
    // this with the chosen merge applied to the vocab table only —
    // the corpus is never re-scanned.
    "llm_bpe_pairs" -> { (s, dir) =>
      import s.implicits._
      val vocab = Tables(s, dir).documents
        .select(explode(tokens($"text")).as("w"))
        .filter(length($"w") > 0)
        .groupBy($"w").agg(count(lit(1)).as("freq"))
      vocab.filter(length($"w") >= 2)
        .select($"freq", explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
          .as("pair"))
        .groupBy($"pair").agg(sum($"freq").as("n_occurrences"))
        .orderBy($"n_occurrences".desc, $"pair")
        .limit(BpeTopK)
    },

    // --- iterative BPE tokenizer TRAINING (the real merge loop) ----------
    // llm_bpe_pairs prices one round's candidates; this runs the actual
    // trainer: BpeMerges greedy rounds, each picking the corpus-weighted
    // most frequent adjacent symbol pair (count desc, then lexicographic
    // — fully deterministic) and merging it into a new symbol before
    // recounting. The production shape (HuggingFace/SentencePiece train
    // over word COUNTS, not the corpus): one corpus-scan word-frequency
    // aggregate, then every round touches only the vocab table —
    // bounded passes over a bounded table regardless of corpus bytes.
    // Segmentations live as delimiter-anchored strings ("|h||a||s||h|":
    // each symbol in its own |…| wrapper, adjacency = "||"), so
    // applying merge (a,b) is ONE non-overlapping left-to-right string
    // replace of "|a||b|" with "|ab|" — the consumed trailing "|"
    // leaves the neighbor's own wrapper intact, so back-to-back
    // occurrences chain and a pair can never match inside a longer
    // symbol. The oracle runs the IDENTICAL algorithm as a generated
    // CTE chain ([[bpeTrainSql]]), so ranks, pairs, and weights gate
    // exactly.
    "llm_bpe_train" -> { (s, dir) =>
      import s.implicits._
      bpeTrainRun(s, dir)._1
        .toDF("merge_rank", "lhs", "rhs", "pair_weight")
        .orderBy($"merge_rank")
    },

    // --- apply the trained tokenizer: corpus compression audit ----------
    // The train → APPLY → audit loop closed: the final segmentations
    // the merge schedule produces, priced corpus-wide — vocabulary
    // size, token occurrences, character total, post-merge symbol
    // total, and the compression ratio in exact-integer ppm (the
    // bytes-per-token proxy a tokenizer choice is judged by). Same
    // bounded vocab-table passes as training; the oracle extends the
    // identical CTE chain to its final segmentation state.
    "llm_bpe_apply" -> { (s, dir) =>
      import s.implicits._
      val (_, st) = bpeTrainRun(s, dir, withStats = true)
      Seq(st).toDF("n_vocab", "n_occurrences", "chars_total",
        "symbols_total")
        .withColumn("compression_ppm",
          when($"chars_total" === 0L, 0L)
            .otherwise(expr("symbols_total * 1000000 div chars_total")))
    },

    // --- tokenizer fertility by language (multilingual cost audit) ------
    // The standard multilingual tokenizer audit: per language, how many
    // subword tokens the tokenizer spends per word and per 1000 chars —
    // the fertility ratio that decides whether a language is
    // over-segmented (and therefore over-billed in compute and
    // under-served in context window). One per-row scan + one
    // partial+final rollup; ratios in exact integer ppm/permil.
    "llm_token_fertility" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"lang",
          size(tokens($"text")).cast("long").as("w"),
          subwordCost($"text").cast("long").as("sw"),
          length($"text").cast("long").as("ch"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"w").as("n_words"),
          sum($"sw").as("n_subwords"), sum($"ch").as("n_chars"))
        .withColumn("fertility_ppm",
          expr("n_subwords * 1000000 div n_words"))
        .withColumn("subwords_per_kchar",
          expr("n_subwords * 1000 div n_chars"))
        .orderBy($"lang")
    },

    // --- out-of-vocabulary rate (tokenizer coverage audit) --------------
    // The pre-training sanity check for a fixed vocabulary: build the
    // corpus top-K term vocab (count-ranked, term-ordered ties — a
    // TakeOrdered top-k, no global sort) and report per source what
    // fraction of token OCCURRENCES and distinct TYPES falls outside
    // it. Runs off the shared doc-term matrix, so the corpus text is
    // not re-tokenized; vocab membership is a broadcast join (the
    // vocab is top-K by construction — it always fits); the per-source
    // rollup is one partial+final aggregate. A source whose oov rate
    // spikes is exactly the one whose text the tokenizer will shred.
    "llm_oov_rate" -> { (s, dir) =>
      import s.implicits._
      val tm = docTermCounts(s, dir)
      val vocab = tm.groupBy($"term").agg(sum($"c").as("cnt"))
        .orderBy($"cnt".desc, $"term".asc).limit(OovVocabK)
        .select($"term", lit(1L).as("inv"))
      tm.join(broadcast(vocab), Seq("term"), "left")
        .groupBy($"source")
        .agg(sum($"c").as("n_tokens"),
          sum(when($"inv".isNull, $"c").otherwise(0L)).as("n_oov"),
          countDistinct($"term").as("n_terms"),
          countDistinct(when($"inv".isNull, $"term")).as("n_oov_terms"))
        .withColumn("oov_token_ppm", expr("n_oov * 1000000 div n_tokens"))
        .withColumn("oov_type_ppm",
          expr("n_oov_terms * 1000000 div n_terms"))
        .orderBy($"source")
    },

    // --- preference-pair mining (RLHF/DPO data assembly) ----------------
    // Mine (chosen, rejected) training pairs per source from the same
    // integer quality score `llm_quality_model` gates on: the i-th
    // BEST document pairs with the i-th WORST (mirror ranking — the
    // widest-gap pairing that uses each document at most once), pairs
    // whose gap closes to zero drop (a tie teaches a preference model
    // nothing), and the pair_rank carries the curriculum order
    // (rank 1 = easiest pair). Both rankings are per-source window
    // top-Ks (WindowGroupLimit pushes the rank filter below the sort,
    // so each partition keeps K rows, never the group); ties break on
    // doc_id, so the mined set is deterministic in both engines.
    "llm_preference_pairs" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val t = tokens($"text")
      val scored = Tables(s, dir).documents
        .select($"source", $"doc_id",
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_distinct"),
          size(filter(t, c => c.isin(stopwords.map(lit): _*)))
            .cast("long").as("n_stop"))
        .withColumn("score",
          lit(2L) * expr("(1000000 * n_distinct) div n_tokens") +
            (lit(1000000L) -
              abs(expr("(1000000 * n_stop) div n_tokens") -
                lit(QualityStopTargetPpm))) +
            least($"n_tokens", lit(100L)) * lit(10000L))
        .select($"source", $"doc_id", $"score")
      val wb = Window.partitionBy($"source")
        .orderBy($"score".desc, $"doc_id".asc)
      val ww = Window.partitionBy($"source")
        .orderBy($"score".asc, $"doc_id".desc)
      val best = scored
        .withColumn("pair_rank", row_number().over(wb).cast("long"))
        .filter($"pair_rank" <= PrefPairsK)
        .select($"source", $"pair_rank", $"doc_id".as("chosen"),
          $"score".as("chosen_score"))
      val worst = scored
        .withColumn("pair_rank", row_number().over(ww).cast("long"))
        .filter($"pair_rank" <= PrefPairsK)
        .select($"source", $"pair_rank", $"doc_id".as("rejected"),
          $"score".as("rejected_score"))
      best.join(worst, Seq("source", "pair_rank"))
        .filter($"chosen_score" > $"rejected_score")
        .withColumn("score_gap", $"chosen_score" - $"rejected_score")
        .select($"source", $"pair_rank", $"chosen", $"rejected",
          $"score_gap")
        .orderBy($"source", $"pair_rank")
    }
  )

  /** Merge candidates reported by `llm_bpe_pairs`. */
  val BpeTopK = 50

  /** Merge rounds the iterative BPE trainer (`llm_bpe_train`) runs —
    * bounded, so training is a constant number of vocab-table passes.
    */
  val BpeMerges = 6

  /** The BPE training loop, shared by `llm_bpe_train` (returns the
    * merge table) and `llm_bpe_apply` (prices the final segmentation):
    * BpeMerges greedy rounds over the word-frequency table, stopping
    * early if no adjacent pairs remain. Returns the learned merges and
    * the corpus compression stats of the final segmentation
    * (n_vocab, n_occurrences, chars_total, symbols_total). The
    * pre-tokenizer rule (shared with the oracle) drops tokens
    * containing the seg delimiter '|' — inside a delimiter-anchored
    * segmentation they would alias symbol boundaries.
    */
  private def bpeTrainRun(s: SparkSession, dir: String,
      withStats: Boolean = false)
      : (Seq[(Int, String, String, Long)], (Long, Long, Long, Long)) = {
    import s.implicits._
    val vocab = Tables(s, dir).documents
      .select(explode(tokens($"text")).as("w"))
      .filter(length($"w") > 0 && !$"w".contains("|"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
    // materialize the word-frequency table ONCE: every round's action
    // re-executes its lineage, and without this the corpus-wide
    // explode + count would re-run per round (measured 5.0 s → the
    // one-corpus-scan contract at any sf); the persisted table is
    // vocab-bounded
    val base = vocab.withColumn("seg",
      concat(lit("|"), array_join(expr(
        "transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
        "||"), lit("|")))
      .persist()
    var seg = base
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= BpeMerges && !exhausted) {
      val best = seg
        .select($"n", expr(
          "split(substring(seg, 2, length(seg) - 2), '\\\\|\\\\|')").as("sy"))
        .filter(size($"sy") >= 2)
        .select($"n", explode(expr(
          """transform(sequence(1, size(sy) - 1),
            |  i -> struct(element_at(sy, i) AS a,
            |              element_at(sy, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"n").as("c"))
        .orderBy($"c".desc, $"a".asc, $"b".asc).limit(1)
        .collect().headOption
      best match {
        case None =>
          // every word is one symbol: no pairs remain — stop early,
          // same graceful degradation as the oracle's empty m_r CTEs
          exhausted = true
        case Some(row) =>
          val (a, b, c) =
            (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((r, a, b, c))
          // literal (quoted) pattern + quoted replacement: token
          // content can never be interpreted as regex syntax
          seg = seg.withColumn("seg", regexp_replace($"seg",
            lit(java.util.regex.Pattern.quote(s"|$a||$b|")),
            lit(java.util.regex.Matcher.quoteReplacement(s"|$a$b|"))))
          r += 1
      }
    }
    // the stats aggregation is its own Spark job — only the apply
    // query pays for it; the train query's benched path stops at the
    // merge table
    val st =
      if (withStats) {
        val row = seg.agg(
          count(lit(1)).as("nv"),
          coalesce(sum($"n"), lit(0L)).as("no"),
          coalesce(sum($"n" * length($"w")), lit(0L)).as("ch"),
          coalesce(sum($"n" * expr(
            "size(split(substring(seg, 2, length(seg) - 2), '\\\\|\\\\|'))")),
            lit(0L)).as("sy")).head()
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      } else (0L, 0L, 0L, 0L)
    base.unpersist(blocking = false)
    (merges.toSeq, st)
  }

  /** DuckDB twin of the BPE training loop — round r's CTEs recount
    * adjacent pairs over the previous round's segmentations, pick the
    * (count desc, pair asc) winner, and apply the same anchored string
    * replace. Generated from [[BpeMerges]] so both engines run the
    * identical schedule.
    */
  private def bpeChainSql: String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH v AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT unnest(${TextOps.toksSql}) AS w FROM documents)
         |  WHERE len(w) > 0 AND w NOT LIKE '%|%' GROUP BY 1),
         |s0 AS (
         |  SELECT w, n, '|' || array_to_string(
         |      list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),
         |      '||') || '|' AS seg
         |  FROM v)""".stripMargin
    for (r <- 1 to BpeMerges) {
      sb ++=
        s""",
           |p$r AS (
           |  SELECT sy[i] AS a, sy[i + 1] AS b, CAST(sum(n) AS BIGINT) AS c
           |  FROM (SELECT n, string_split(
           |          substr(seg, 2, length(seg) - 2), '||') AS sy
           |        FROM s${r - 1}) t,
           |    unnest(range(1, len(t.sy))) AS u(i)
           |  GROUP BY 1, 2),
           |m$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
           |s$r AS (
           |  -- LEFT JOIN: when merges exhaust early (m$r empty) the
           |  -- segmentation CARRIES instead of emptying the chain —
           |  -- bpeApplySql's final-state read must see the last real
           |  -- segmentation, exactly like the Spark loop's early stop
           |  SELECT s.w, s.n,
           |    CASE WHEN m.a IS NULL THEN s.seg
           |      ELSE replace(s.seg, '|' || m.a || '||' || m.b || '|',
           |                   '|' || m.a || m.b || '|') END AS seg
           |  FROM s${r - 1} s LEFT JOIN m$r m ON TRUE)""".stripMargin
    }
    sb.toString
  }

  private def bpeTrainSql: String =
    bpeChainSql + "\n" +
      s"""SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, pair_weight
         |FROM (
         |${(1 to BpeMerges).map(r =>
          s"  SELECT $r AS merge_rank, a AS lhs, b AS rhs, c AS pair_weight FROM m$r")
          .mkString(" UNION ALL\n")}
         |) ORDER BY merge_rank""".stripMargin

  /** Final-segmentation compression stats off the same CTE chain. */
  private def bpeApplySql: String =
    bpeChainSql + "\n" +
      s"""SELECT CAST(count(*) AS BIGINT) AS n_vocab,
         |  CAST(coalesce(sum(n), 0) AS BIGINT) AS n_occurrences,
         |  CAST(coalesce(sum(n * length(w)), 0) AS BIGINT) AS chars_total,
         |  CAST(coalesce(sum(n * len(string_split(
         |    substr(seg, 2, length(seg) - 2), '||'))), 0) AS BIGINT)
         |    AS symbols_total,
         |  CASE WHEN coalesce(sum(n * length(w)), 0) = 0 THEN 0
         |    ELSE CAST(sum(n * len(string_split(
         |      substr(seg, 2, length(seg) - 2), '||'))) * 1000000
         |      // sum(n * length(w)) AS BIGINT) END AS compression_ppm
         |FROM s$BpeMerges""".stripMargin

  /** Vocabulary size for the OOV coverage audit. */
  val OovVocabK = 500

  /** Preference pairs mined per source (mirror-rank pairing). */
  val PrefPairsK = 10

  /** Per-source exact token-length deciles over `(source, n_tokens)`
    * rows, by TWO-LEVEL rank selection — the skew-proof shape:
    *
    *  1. histogram: `groupBy(source, n_tokens)` value counts — partial
    *     aggregation absorbs any row skew map-side, so a giant source
    *     never lands in one task (the single-window formulation's
    *     failure mode at 100 TB);
    *  2. rank-select over the per-source DISTINCT-VALUE table (bounded
    *     by max document length, tiny): the value at rank
    *     `ceil(p·n/100)` of the (n_tokens, doc_id) total order is the
    *     value whose cumulative count range covers that rank — doc_id
    *     only tie-breaks WITHIN a value, so histogram selection is
    *     exactly the row-rank result (the DuckDB oracle keeps the
    *     single-window formulation, proving value equivalence).
    *
    * Exact percentiles, NOT approx_percentile: identical integer rank
    * arithmetic in both engines, bit-exact oracle.
    */
  private[llm] def corpusStats(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = rows.groupBy($"source", $"n_tokens").agg(count(lit(1)).as("c"))
    val r = hist
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"source").orderBy($"n_tokens")))
      .withColumn("n", sum($"c").over(Window.partitionBy($"source")))
    def dec(p: Int) = {
      val target = expr(s"(n * $p + 99) div 100")
      max(when(target > $"cum" - $"c" && target <= $"cum", $"n_tokens"))
    }
    r.groupBy($"source").agg(
      max($"n").as("n_docs"),
      sum($"c" * $"n_tokens").as("total_tokens"),
      dec(10).as("p10_tokens"),
      dec(50).as("p50_tokens"),
      dec(90).as("p90_tokens"))
      .orderBy($"source")
  }

  // ------------------------------------------------------------- oracles

  private val langScoresSql = langMarkers.map { case (l, ms) =>
    val lst = ms.map(m => s"'$m'").mkString(", ")
    s"CAST(len(list_intersect(dt, [$lst])) AS INT) AS score_$l"
  }.mkString(",\n  ")

  private val langMaxSql =
    "greatest(" + langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ") + ")"

  private val langCaseSql = "CASE " + langMarkers.map { case (l, _) =>
    s"WHEN score_$l = mx THEN '$l'"
  }.mkString(" ") + " END"

  private val stopListSql = stopwords.map(w => s"'$w'").mkString(", ")

  val oracles: Map[String, String] = Map(

    // identical bucket hash (md5-prefix), identical integer ppm shares
    "llm_corpus_drift" ->
      s"""WITH tok AS (
         |  SELECT doc_id % 2 = 0 AS is_ref, unnest($toksSql) AS t
         |  FROM documents),
         |b AS (
         |  SELECT ${hash32Sql("t")} % $DriftBuckets AS bucket,
         |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
         |  FROM tok GROUP BY 1)
         |SELECT bucket, c_ref, c_cur,
         |  CAST((1000000 * c_ref) // (sum(c_ref) OVER ()) AS BIGINT)
         |    AS share_ref_ppm,
         |  CAST((1000000 * c_cur) // (sum(c_cur) OVER ()) AS BIGINT)
         |    AS share_cur_ppm,
         |  CAST(abs((1000000 * c_ref) // (sum(c_ref) OVER ())
         |         - (1000000 * c_cur) // (sum(c_cur) OVER ())) AS BIGINT)
         |    AS drift_ppm
         |FROM b ORDER BY bucket""".stripMargin,

    "llm_text_stats" ->
      s"""SELECT doc_id, n_chars, n_tokens, n_distinct, n_stop,
         |  n_distinct::DOUBLE / n_tokens AS ttr,
         |  n_stop::DOUBLE / n_tokens AS stop_ratio,
         |  (n_chars - n_tokens + 1)::DOUBLE / n_tokens AS avg_token_len
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS INT) AS n_chars,
         |    CAST(len(t) AS INT) AS n_tokens,
         |    CAST(len(list_distinct(t)) AS INT) AS n_distinct,
         |    CAST(len(list_filter(t, c -> c IN ($stopListSql))) AS INT) AS n_stop
         |  FROM (SELECT doc_id, text, $toksSql AS t FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "llm_quality_model" ->
      s"""SELECT doc_id, n_tokens, ttr_ppm, stop_ppm, quality_score,
         |  quality_score >= $QualityKeepThreshold AS keep
         |FROM (
         |  SELECT doc_id, n_tokens, ttr_ppm, stop_ppm,
         |    2 * ttr_ppm
         |      + (1000000 - abs(stop_ppm - $QualityStopTargetPpm))
         |      + least(n_tokens, 100) * 10000 AS quality_score
         |  FROM (
         |    SELECT doc_id, n_tokens,
         |      (1000000 * n_distinct) // n_tokens AS ttr_ppm,
         |      (1000000 * n_stop) // n_tokens AS stop_ppm
         |    FROM (
         |      SELECT doc_id,
         |        CAST(len(t) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |        CAST(len(list_filter(t, c -> c IN ($stopListSql))) AS BIGINT)
         |          AS n_stop
         |      FROM (SELECT doc_id, $toksSql AS t FROM documents))))
         |ORDER BY doc_id""".stripMargin,

    "llm_lang_id" ->
      s"""SELECT doc_id, lang, ${langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")},
         |  $langCaseSql AS predicted
         |FROM (
         |  SELECT doc_id, lang, ${langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")},
         |    $langMaxSql AS mx
         |  FROM (
         |    SELECT doc_id, lang, $langScoresSql
         |    FROM (SELECT doc_id, lang, list_distinct($toksSql) AS dt
         |          FROM documents)))
         |ORDER BY doc_id""".stripMargin,

    "llm_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS INT) AS n_ws_tokens,
         |  $subwordCostSql AS n_subwords
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "llm_corpus_stats" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, CAST(len($toksSql) AS INT) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT source, n_tokens,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY n_tokens, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM t)
         |SELECT source,
         |  CAST(max(n) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  max(CASE WHEN rk = (n * 10 + 99) // 100 THEN n_tokens END) AS p10_tokens,
         |  max(CASE WHEN rk = (n * 50 + 99) // 100 THEN n_tokens END) AS p50_tokens,
         |  max(CASE WHEN rk = (n * 90 + 99) // 100 THEN n_tokens END) AS p90_tokens
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "llm_seq_pack" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, $subwordCostSql AS n_subwords
         |  FROM documents),
         |r AS (
         |  SELECT source, n_subwords,
         |    sum(n_subwords) OVER (PARTITION BY source ORDER BY doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS running
         |  FROM t)
         |SELECT source, CAST((running - n_subwords) // 2048 AS BIGINT) AS bin,
         |  count(*) AS n_docs,
         |  CAST(sum(n_subwords) AS BIGINT) AS bin_tokens
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "llm_domain_mix" ->
      s"""WITH t AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(sc) AS BIGINT) AS total_tokens
         |  FROM (SELECT source, $subwordCostSql AS sc FROM documents)
         |  GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS w
         |  FROM t),
         |s AS (
         |  SELECT CAST(sum(total_tokens) AS BIGINT) AS sum_tokens,
         |    CAST(sum(w) AS BIGINT) AS sum_w
         |  FROM w)
         |SELECT source, n_docs, total_tokens, w,
         |  CAST(total_tokens * 1000000 // sum_tokens AS BIGINT) AS share_ppm,
         |  CAST(w * 1000000 // sum_w AS BIGINT) AS temp_share_ppm,
         |  CAST(w * 1000000 // sum_w AS DOUBLE)
         |    / (total_tokens * 1000000 // sum_tokens) AS boost
         |FROM w, s ORDER BY source""".stripMargin,

    "llm_mix_sample" ->
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w
         |  FROM per),
         |tot AS (
         |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
         |    CAST(sum(w) AS BIGINT) AS sum_w FROM w),
         |r AS (
         |  SELECT source, n_docs,
         |    CAST((n_total // 2) * w // sum_w AS BIGINT) AS quota,
         |    CAST(least(1000000,
         |      ((n_total // 2) * w // sum_w) * 1000000 // n_docs) AS BIGINT)
         |      AS rate_ppm
         |  FROM w, tot)
         |SELECT r.source, r.n_docs, r.quota, r.rate_ppm,
         |  CAST(sum(CASE WHEN
         |    ${hash32Sql("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 1000000
         |      < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents d JOIN r ON d.source = r.source
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    "llm_shard_balance" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (SELECT *, length(bin(n_tokens)) AS bits FROM d),
         |a AS (
         |  SELECT *, (row_number() OVER (PARTITION BY bits
         |    ORDER BY n_tokens DESC, doc_id) - 1) % $NumShards AS shard
         |  FROM b)
         |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_dsir_weights" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ${hash32Sql("term")} % $DsirBuckets AS f
         |  FROM (SELECT doc_id, lang, unnest($toksSql) AS term
         |        FROM documents)),
         |feat AS (
         |  SELECT f, CAST(count(*) AS BIGINT) AS rc,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc
         |  FROM h GROUP BY 1),
         |r AS (
         |  SELECT f, (tc + 1) * 1000000 // (rc + 1) AS ratio_ppm FROM feat),
         |tot AS (
         |  SELECT CAST(sum(rc) AS BIGINT) AS n_tot,
         |    CAST(sum(rc * ratio_ppm) AS BIGINT) AS w_tot FROM r JOIN feat USING (f))
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(ratio_ppm) AS BIGINT) AS weight_sum,
         |  CAST(sum(ratio_ppm) AS BIGINT) * n_tot > w_tot * count(*) AS selected
         |FROM h JOIN r USING (f), tot
         |GROUP BY 1, n_tot, w_tot ORDER BY 1""".stripMargin,

    "llm_token_budget_fill" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_distinct
         |  FROM documents),
         |sc AS (
         |  SELECT *, n_distinct * 1000000 // n_tokens AS score_ppm FROM d),
         |b AS (
         |  SELECT source, CAST(sum(n_tokens) // 2 AS BIGINT) AS budget
         |  FROM d GROUP BY 1),
         |c AS (
         |  SELECT sc.*, b.budget,
         |    CAST(sum(n_tokens) OVER (PARTITION BY sc.source
         |      ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS cum_tokens
         |  FROM sc JOIN b USING (source))
         |SELECT doc_id, source, n_tokens, CAST(score_ppm AS BIGINT) AS score_ppm,
         |  cum_tokens, cum_tokens <= budget AS kept
         |FROM c ORDER BY doc_id""".stripMargin,

    "llm_bpe_train" -> bpeTrainSql,

    "llm_bpe_apply" -> bpeApplySql,

    "llm_corpus_shard" ->
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    ${TextOps.hash32Sql("'shard:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |p AS (
         |  SELECT *, h % $CorpusShards AS shard,
         |    row_number() OVER (PARTITION BY h % $CorpusShards
         |                       ORDER BY h, doc_id) AS pos
         |  FROM d)
         |SELECT CAST(shard AS INT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(pos * (doc_id % 1000003)) AS BIGINT) AS order_checksum
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_winnow_fingerprint" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS t FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= $WinnowK THEN
         |      list_transform(range(1, len(t) - ${WinnowK - 1} + 1),
         |        i -> ${hash32Sql(
                 s"array_to_string(t[i:i+${WinnowK - 1}], ' ')")})
         |    ELSE [] END AS ph
         |  FROM d),
         |w AS (
         |  SELECT doc_id, CASE
         |    WHEN len(ph) >= $WinnowW THEN
         |      list_transform(range(1, len(ph) - ${WinnowW - 1} + 1),
         |        j -> list_min(ph[j:j+${WinnowW - 1}]))
         |    WHEN len(ph) > 0 THEN [list_min(ph)]
         |    ELSE [] END AS wins
         |  FROM p),
         |f AS (SELECT doc_id, list_distinct(wins) AS fps FROM w)
         |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
         |    (acc, x) -> acc + x) AS BIGINT) AS fp_sum,
         |  list_min(fps) AS min_fp, list_max(fps) AS max_fp
         |FROM f ORDER BY doc_id""".stripMargin,

    "llm_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, CAST(length(text) AS INT) + 1),
        |                     i -> ord(substr(text, i, 1)))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "llm_doc_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS INT) AS n FROM d),
         |st AS (
         |  SELECT doc_id, toks, n,
         |    unnest(range(1,
         |      2 + $ChunkStride *
         |        ((greatest(n - $ChunkWindow, 0) + ${ChunkStride - 1})
         |         // $ChunkStride),
         |      $ChunkStride)) AS start
         |  FROM n)
         |SELECT doc_id,
         |  CAST((start - 1) // $ChunkStride AS INT) AS chunk_idx,
         |  CAST(start AS INT) AS chunk_start,
         |  CAST(least($ChunkWindow, n - start + 1) AS INT) AS n_chunk_tokens,
         |  ${hash32Sql(s"array_to_string(toks[start:start+${ChunkWindow - 1}], ' ')")}
         |    AS chunk_hash
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    "llm_pii_scrub" -> {
      // the Scala literal's single backslash passes through the DuckDB
      // single-quoted string unprocessed — same regex both engines
      val email = EmailPattern
      val phone = PhonePattern
      s"""WITH t AS (
         |  SELECT doc_id, text ||
         |    CASE
         |      WHEN doc_id % 5 = 1 THEN ' contact user' || doc_id || '@example.com now'
         |      WHEN doc_id % 5 = 2 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
         |      WHEN doc_id % 5 = 3 THEN ' mail a' || doc_id || '@b.org or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      ELSE '' END AS t2
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, t2,
         |    regexp_replace(regexp_replace(t2, '$email', '[EMAIL]', 'g'),
         |                   '$phone', '[PHONE]', 'g') AS clean
         |  FROM t)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t2, '$email')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t2, '$phone')) AS INT) AS n_phones,
         |  ${hash32Sql("clean")} AS clean_hash,
         |  CAST(length(clean) AS INT) AS clean_len
         |FROM r ORDER BY doc_id""".stripMargin
    },

    // vocabulary first, then the weighted pair expansion — mirrors the
    // Spark aggregation order exactly
    "llm_bpe_pairs" ->
      s"""WITH w AS (
         |  SELECT unnest($toksSql) AS w FROM documents),
         |wf AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS freq
         |  FROM w WHERE len(w) > 0 GROUP BY 1),
         |p AS (
         |  SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair,
         |    freq
         |  FROM wf WHERE len(w) >= 2)
         |SELECT pair, CAST(sum(freq) AS BIGINT) AS n_occurrences
         |FROM p GROUP BY 1
         |ORDER BY 2 DESC, 1 LIMIT $BpeTopK""".stripMargin,

    "llm_token_fertility" ->
      s"""WITH t AS (
         |  SELECT lang,
         |    CAST(len($toksSql) AS BIGINT) AS w,
         |    CAST($subwordCostSql AS BIGINT) AS sw,
         |    CAST(length(text) AS BIGINT) AS ch
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS n_words,
         |  CAST(sum(sw) AS BIGINT) AS n_subwords,
         |  CAST(sum(ch) AS BIGINT) AS n_chars,
         |  CAST(sum(sw) * 1000000 // sum(w) AS BIGINT) AS fertility_ppm,
         |  CAST(sum(sw) * 1000 // sum(ch) AS BIGINT) AS subwords_per_kchar
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_oov_rate" ->
      s"""WITH tm AS (
         |  SELECT source, term, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest($toksSql) AS term FROM documents)
         |  GROUP BY 1, 2),
         |vocab AS (
         |  SELECT term, 1 AS inv FROM (
         |    SELECT term, row_number() OVER (
         |      ORDER BY sum(c) DESC, term) AS rn
         |    FROM tm GROUP BY term) WHERE rn <= $OovVocabK)
         |SELECT tm.source,
         |  CAST(sum(tm.c) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.inv IS NULL THEN tm.c ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(count(DISTINCT tm.term) AS BIGINT) AS n_terms,
         |  CAST(count(DISTINCT CASE WHEN v.inv IS NULL THEN tm.term END)
         |    AS BIGINT) AS n_oov_terms,
         |  CAST(sum(CASE WHEN v.inv IS NULL THEN tm.c ELSE 0 END) * 1000000
         |    // sum(tm.c) AS BIGINT) AS oov_token_ppm,
         |  CAST(count(DISTINCT CASE WHEN v.inv IS NULL THEN tm.term END)
         |    * 1000000 // count(DISTINCT tm.term) AS BIGINT) AS oov_type_ppm
         |FROM tm LEFT JOIN vocab v ON v.term = tm.term
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_preference_pairs" ->
      s"""WITH scored AS (
         |  SELECT source, doc_id,
         |    2 * ((1000000 * n_distinct) // n_tokens)
         |      + (1000000 - abs((1000000 * n_stop) // n_tokens
         |                       - $QualityStopTargetPpm))
         |      + least(n_tokens, 100) * 10000 AS score
         |  FROM (
         |    SELECT source, doc_id,
         |      CAST(len(t) AS BIGINT) AS n_tokens,
         |      CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |      CAST(len(list_filter(t, c -> c IN ($stopListSql))) AS BIGINT)
         |        AS n_stop
         |    FROM (SELECT source, doc_id, $toksSql AS t FROM documents))),
         |best AS (
         |  SELECT source, pair_rank, doc_id AS chosen,
         |    score AS chosen_score FROM (
         |    SELECT source, doc_id, score, row_number() OVER (
         |      PARTITION BY source ORDER BY score DESC, doc_id) AS pair_rank
         |    FROM scored) WHERE pair_rank <= $PrefPairsK),
         |worst AS (
         |  SELECT source, pair_rank, doc_id AS rejected,
         |    score AS rejected_score FROM (
         |    SELECT source, doc_id, score, row_number() OVER (
         |      PARTITION BY source ORDER BY score, doc_id DESC) AS pair_rank
         |    FROM scored) WHERE pair_rank <= $PrefPairsK)
         |SELECT b.source, CAST(b.pair_rank AS BIGINT) AS pair_rank,
         |  b.chosen, w.rejected,
         |  CAST(b.chosen_score - w.rejected_score AS BIGINT) AS score_gap
         |FROM best b JOIN worst w
         |  ON w.source = b.source AND w.pair_rank = b.pair_rank
         |WHERE b.chosen_score > w.rejected_score
         |ORDER BY 1, 2""".stripMargin
  )
}
