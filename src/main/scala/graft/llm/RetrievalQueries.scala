package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Corpus-frequency retrieval operators over the `documents` fixture:
  * inverted-index BM25 top-k keyword search and document-frequency
  * boilerplate detection.
  *
  * Both are built on the INVERTED-INDEX shape — explode tokens/shingles
  * into a postings stream, aggregate per term (map-side partial agg),
  * join the tiny high-level artifact (query terms, boilerplate set)
  * back by broadcast — which is the 100 TB scale path for text
  * retrieval: the postings table is the index, every heavy step is a
  * linear scan or a keyed partial aggregation, and nothing ever
  * all-pairs or collects data rows to the driver.
  *
  * Engine-portable float discipline (same rules as [[TextOps]] /
  * [[SimilarityQueries]]): every emitted double is built from EXACT
  * int64 arithmetic with at most one division per factor and a
  * SEQUENTIAL term-ordered fold for sums, so Spark and the DuckDB
  * oracle produce bit-identical values. BM25's idf is therefore the
  * RATIONAL Robertson–Sparck-Jones form `(N - df + 0.5) / (df + 0.5)`
  * WITHOUT the log: `ln` is not an IEEE-exact op (Java `Math.log` is
  * only 1-ulp-accurate, so cross-engine bit parity is not guaranteed),
  * while the rational form is two exact ints and one division.
  * Per-term ranking is unchanged (ln is monotone); multi-term score
  * sums can order differently than log-BM25 in principle, and a
  * production deployment that doesn't need cross-engine bit parity
  * swaps `ln(1 + …)` back in one line.
  */
object RetrievalQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Fixed BM25 query — a bounded term set, broadcast-joined against
    * the postings. k1 = 1.2, b = 0.75 are folded into exact integer
    * coefficients below (×10 to clear the decimals).
    */
  val QueryTerms: Seq[String] = Seq("merge", "stream", "vector")
  val Bm25TopK = 15

  /** Keywords per source emitted by `llm_tfidf_keywords`. */
  val TfidfTopK = 3

  /** Support threshold for `llm_token_pairs` as an exact ppm ratio:
    * a token is FREQUENT when it appears in >= 10% of docs
    * (df·1e6 >= n_docs·SupportPpm — integer compare, no float), which
    * bounds the frequent vocabulary by 1/support regardless of corpus
    * size. Pairs reported: top [[TokenPairsTopK]].
    */
  val SupportPpm = 100000L
  val TokenPairsTopK = 50

  /** Boilerplate df threshold as an exact ratio: a distinct bigram
    * shingle is boilerplate when df >= 8% of the corpus (25·df >= 2·N —
    * integer compare, no float). The flagged set is bounded by
    * avg-shingles-per-doc / 0.08 regardless of corpus size, hence
    * always broadcastable.
    */
  val BoilerDfNum = 2
  val BoilerDfDen = 25

  val defs: Map[String, QFn] = Map(

    // --- mean-inverse-token-frequency rarity scoring ---------------------
    // The unigram-LM quality-scoring shape without the log (ln is not
    // IEEE-exact cross-engine): a doc's score is the mean over its
    // tokens of T/freq(token) — high = rare vocabulary, low = stock
    // phrasing. Corpus term frequencies are one keyed partial agg (the
    // unigram "model"); the join-back is a term equi-join; the per-doc
    // sum folds ratios in term-sorted order (duplicate terms carry
    // identical ratios, so the fold is total-order deterministic).
    "llm_rarity_score" -> { (s, dir) =>
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select($"doc_id", explode(tokens($"text")).as("term"))
      val freq = toks.groupBy($"term").agg(count(lit(1)).as("freq"))
      val t = freq.agg(sum($"freq")).head().getLong(0) // corpus token count
      val scored = toks.join(freq, "term")
        .withColumn("ratio",
          lit(t).cast("double") / $"freq".cast("double"))
      scored.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          aggregate(transform(sort_array(collect_list(struct($"term", $"ratio"))),
            x => x("ratio")), lit(0.0), (acc, x) => acc + x).as("rarity_sum"))
        .withColumn("rarity_mean",
          $"rarity_sum" / $"n_tokens".cast("double"))
        .orderBy($"doc_id")
    },

    // --- bigram-LM fluency scoring (the perplexity-filter shape) ---------
    // The ORDER-SENSITIVE quality score unigram rarity cannot see: a
    // CCNet-style language-model filter scores each doc by how typical
    // its token TRANSITIONS are under the corpus bigram model —
    // P(w2|w1) = c(w1,w2) / Σ_x c(w1,x) in exact integer ppm (the log
    // of real perplexity is not IEEE-exact cross-engine; the mean
    // transition probability ranks the same tail). Shuffled or
    // machine-mangled text keeps its unigram profile but craters here.
    // Shape: bigram counts + prefix totals are vocab-bounded partial
    // aggs (the "model"); the doc side joins its bigram occurrences
    // back on the (w1, w2) key — a vocab-keyed equi-join, linear in
    // the token stream at any corpus size.
    "llm_bigram_lm" -> { (s, dir) =>
      import s.implicits._
      val docPairs = Tables(s, dir).documents
        .select($"doc_id", tokens($"text").as("t"))
        .filter(size($"t") >= 2)
        .select($"doc_id", explode(expr(
          """transform(sequence(1, size(t) - 1),
            |  i -> struct(element_at(t, i) AS w1,
            |              element_at(t, i + 1) AS w2))""".stripMargin)).as("p"))
        .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
      val big = docPairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_bg"))
      val pref = big.groupBy($"w1").agg(sum($"c_bg").as("c_pref"))
      val probs = big.join(pref, "w1")
        .select($"w1", $"w2", expr("c_bg * 1000000L div c_pref").as("p_ppm"))
      docPairs.join(probs, Seq("w1", "w2"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"p_ppm").as("sum_p"),
          min($"p_ppm").as("min_p_ppm"))
        .select($"doc_id", $"n_bigrams",
          expr("sum_p div n_bigrams").as("mean_p_ppm"), $"min_p_ppm")
        .orderBy($"doc_id")
    },

    // --- BM25 top-k keyword retrieval (inverted-index shape) ------------
    // tf/df/dl are exact int64 postings aggregates; the per-(doc,term)
    // score is (idf_num/idf_den) * (tf_num/tf_den) — two divisions and
    // a multiply over exact ints — and the per-doc score folds the
    // term scores in TERM-SORTED order, so both engines accumulate the
    // identical IEEE sequence. With k1=1.2, b=0.75 (×10·S to clear
    // decimals and the avgdl = S/N division):
    //   tfnorm = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)
    "llm_bm25_topk" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", tokens($"text").as("toks"))
        .select($"doc_id", $"toks", size($"toks").cast("long").as("dl"))
      // corpus stats: two bounded scalars (the same place avgdl lives
      // in any BM25 engine); ONE metadata-light agg job
      val stats = docs.agg(count(lit(1)).cast("long"), sum($"dl")).head()
      val n = stats.getLong(0)
      val sumDl = stats.getLong(1)
      val postings = docs
        .select($"doc_id", $"dl", explode($"toks").as("term"))
        .filter($"term".isin(QueryTerms: _*))
      val tf = postings.groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"), first($"dl").as("dl"))
      // df per query term — tiny (|QueryTerms| rows), broadcast back
      val dfT = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val idf = (lit(2L * n + 1L) - lit(2L) * $"df").cast("double") /
        (lit(2L) * $"df" + lit(1L)).cast("double")
      val tfnorm = (lit(22L) * $"tf" * lit(sumDl)).cast("double") /
        (lit(10L) * $"tf" * lit(sumDl) + lit(3L * sumDl) +
          lit(9L) * $"dl" * lit(n)).cast("double")
      val scored = tf.join(broadcast(dfT), "term")
        .withColumn("sc", idf * tfnorm)
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("int").as("n_terms"),
          aggregate(transform(sort_array(collect_list(struct($"term", $"sc"))),
            x => x("sc")), lit(0.0), (acc, x) => acc + x).as("score"))
      // TakeOrderedAndProject top-k, then rank over the k survivors only
      val top = scored.orderBy($"score".desc, $"doc_id".asc).limit(Bm25TopK)
      top.withColumn("rank",
          row_number().over(Window.orderBy($"score".desc, $"doc_id".asc)))
        .select($"rank", $"doc_id", $"n_terms", $"score")
        .orderBy($"rank")
    },

    // --- collocation / phrase mining (PMI-shaped lift, rational form) ---
    // The phrase-vocabulary primitive of tokenizer and n-gram-LM prep:
    // adjacent-token bigram counts vs their parts' unigram counts.
    // lift = N·c(ab) / (c(a)·c(b)) is PMI without the log (ln is not
    // IEEE-exact cross-engine; ranking per pair is unchanged). Scale
    // shape: two postings streams (unigram + bigram) aggregated
    // map-side; the join-back is keyed on the term (vocab-sized, NOT
    // corpus-sized); top-k plans as TakeOrderedAndProject. The exact
    // int64 products stay in range as long as N·c(ab) < 2^63 — at
    // larger corpora pre-scale the counts (llm_domain_mix's trick).
    "llm_collocations" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.select(tokens($"text").as("t"))
      val uni = d.select(explode($"t").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("cw"))
      val pairs = d.filter(size($"t") >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(t) - 2),
            |  i -> struct(element_at(t, i + 1) AS a,
            |              element_at(t, i + 2) AS b))""".stripMargin)).as("p"))
        .select($"p.a", $"p.b")
      val big = pairs.groupBy($"a", $"b").agg(count(lit(1)).as("n_pair"))
      val tot = big.agg(sum($"n_pair").as("n_total"))
      big.join(uni.select($"w".as("a"), $"cw".as("n_a")), "a")
        .join(uni.select($"w".as("b"), $"cw".as("n_b")), "b")
        .crossJoin(broadcast(tot))
        .filter($"n_pair" >= 5)
        .withColumn("lift", ($"n_total" * $"n_pair").cast("double") /
          ($"n_a" * $"n_b").cast("double"))
        .select($"a", $"b", $"n_pair", $"n_a", $"n_b", $"lift")
        .orderBy($"n_pair".desc, $"a", $"b")
        .limit(50)
    },

    // --- support-pruned token co-occurrence (market-basket lift) ---------
    // Which tokens travel TOGETHER across documents? The Apriori
    // insight makes this tractable at any scale: a pair can only be
    // frequent if both parts are, so each doc's token set is first
    // restricted to the frequent vocabulary (bounded by 1/support —
    // a BROADCAST join, the downward-closure prune) and the quadratic
    // pair expansion runs over those short survivor lists only. The
    // raw quadratic-in-doc-length expansion this avoids is the
    // classic market-basket scale failure. lift_ppm =
    // n_ab·N·1e6 DIV (df_a·df_b) is exact int64 (pre-scale counts at
    // corpora where N² > 2^63/1e6, as llm_domain_mix does); lift ≫ 1e6
    // means the pair co-occurs far above independence — boilerplate
    // phrases, topic markers, template fingerprints.
    "llm_token_pairs" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // distinct (doc, token) pairs are exactly the shared document-term
      // matrix's keys — no per-query corpus re-tokenization
      val dt = docTermCounts(s, dir)
        .select($"doc_id", $"term".as("tok"))
        .filter(length($"tok") > 0)
      val nDocs = Tables(s, dir).documents.agg(count(lit(1)).as("n_docs"))
      val dfs = dt.groupBy($"tok").agg(count(lit(1)).as("df"))
      val freq = dfs.crossJoin(broadcast(nDocs))
        .filter($"df" * lit(1000000L) >= $"n_docs" * lit(SupportPpm))
      // r15 (guide §2.3, narrower types): the pair expansion and its
      // aggregate used to key on (string, string) structs — the hash
      // agg and shuffle paid two string copies + compares per PAIR.
      // The frequent vocabulary is broadcast-bounded (≤ 1e6/SupportPpm
      // tokens by downward closure), so assign each token a dense int
      // id in TOKEN SORT ORDER (id order == string order, keeping the
      // i<j pairing bit-identical) and run the quadratic expansion +
      // count over ONE packed long (idA·2^31 + idB). Tokens decode
      // back via the same broadcast vocabulary after the aggregate —
      // identical output, measured 2.0 s → sub-second at sf0.1 (the
      // 1.26 s single-task string-pair aggregate was the whole cost).
      val wTok = Window.orderBy($"tok") // vocab-sized: single partition is fine
      val freqIds = freq.select($"tok", $"df")
        .withColumn("id", row_number().over(wTok).cast("long"))
      val ft = dt.join(broadcast(freqIds.select($"tok", $"id")), "tok")
        .groupBy($"doc_id").agg(sort_array(collect_list($"id")).as("ft"))
        .filter(size($"ft") >= 2)
      val pairCounts = ft.select(explode(expr(
          """flatten(transform(sequence(1, size(ft) - 1),
            |  i -> transform(sequence(i + 1, size(ft)),
            |    j -> element_at(ft, i) * 2147483648L + element_at(ft, j))))"""
            .stripMargin)).as("p"))
        .groupBy($"p").agg(count(lit(1)).as("n_ab"))
        // integer div/mod (Column./ is floating division and p exceeds
        // a double's 2^53 exact range)
        .select(expr("p div 2147483648L").as("id_a"),
          expr("p % 2147483648L").as("id_b"), $"n_ab")
      pairCounts
        .join(broadcast(freqIds.select($"id".as("id_a"),
          $"tok".as("token_a"), $"df".as("df_a"))), "id_a")
        .join(broadcast(freqIds.select($"id".as("id_b"),
          $"tok".as("token_b"), $"df".as("df_b"))), "id_b")
        .crossJoin(broadcast(nDocs))
        .select($"token_a", $"token_b", $"n_ab", $"df_a", $"df_b",
          expr("n_ab * n_docs * 1000000L div (df_a * df_b)").as("lift_ppm"))
        .orderBy($"n_ab".desc, $"token_a", $"token_b")
        .limit(TokenPairsTopK)
    },

    // --- cross-corpus n-gram novelty scoring -----------------------------
    // The diversity signal of incremental curation: what fraction of a
    // doc's distinct shingles appear HERE FIRST (doc_id standing in for
    // ingestion order)? Fully-novel docs score 1.0; a doc stitched from
    // already-seen text scores near 0 — the complement of boilerplate's
    // corpus-wide view, per document. Scale shape: one postings
    // explode, min(doc_id) per shingle as a keyed partial agg, and a
    // join-back keyed on the shingle hash — vocabulary-sized
    // aggregation state, never a corpus×corpus join.
    "llm_ngram_novelty" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id", hashedShingles($"text").as("sh"))
      val ex = sh.select($"doc_id", explode($"sh").as("h"))
      val firstSeen = ex.groupBy($"h").agg(min($"doc_id").as("first_doc"))
      val perDoc = ex.join(firstSeen, "h")
        .groupBy($"doc_id")
        .agg(sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
          .as("n_novel"))
      sh.select($"doc_id", size($"sh").cast("long").as("n_shingles"))
        .join(perDoc, Seq("doc_id"), "left")
        .select($"doc_id", $"n_shingles",
          coalesce($"n_novel", lit(0L)).as("n_novel"),
          when($"n_shingles" === 0, lit(0.0))
            .otherwise(coalesce($"n_novel", lit(0L)).cast("double") /
              $"n_shingles".cast("double")).as("novelty"))
        .orderBy($"doc_id")
    },

    // --- per-source tf-idf keyword extraction ----------------------------
    // The topic-labeling primitive of corpus cards and domain audits:
    // each source's top-3 terms by tf·idf, with the same exact-rational
    // Robertson–Sparck-Jones idf the BM25 operator uses (df here =
    // number of SOURCES containing the term, so ubiquitous words are
    // discounted without a log). Scale shape: postings explode →
    // (source, term) partial agg; per-term df is a second keyed partial
    // agg over the (source, term) table (vocab-sized, not corpus-
    // sized); top-3 per source plans as WindowGroupLimit. The source
    // count is one bounded aggregate (|sources| rows).
    "llm_tfidf_keywords" -> { (s, dir) =>
      import s.implicits._
      // NULL sources are excluded up front: Spark's distinct() counts
      // the null group but SQL's count(DISTINCT) doesn't, and a
      // diverging n would break bit parity for EVERY row
      val tf = Tables(s, dir).documents
        .filter($"source".isNotNull)
        .select($"source", explode(tokens($"text")).as("term"))
        .groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
      val n = tf.select($"source").distinct().count()
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"source")
        .orderBy($"score".desc, $"term".asc)
      tf.join(df, "term")
        .withColumn("score", $"tf".cast("double") *
          (((lit(n) - $"df").cast("double") + lit(0.5)) /
            ($"df".cast("double") + lit(0.5))))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TfidfTopK)
        .select($"source", $"rank", $"term", $"tf", $"df", $"score")
        .orderBy($"source", $"rank")
    },

    // --- corpus boilerplate detection (document-frequency filter) -------
    // The boilerplate-removal primitive of web-scale curation: distinct
    // shingles explode into a postings stream, df is a keyed partial
    // agg, the flagged set (bounded by construction) broadcast-joins
    // back, and each doc reports how much of it is boilerplate.
    "llm_boilerplate" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id", hashedShingles($"text").as("sh"))
      val n = sh.count()
      val ex = sh.select($"doc_id", explode($"sh").as("h"))
      val boiler = ex.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" * BoilerDfDen >= lit(BoilerDfNum) * lit(n))
        .select($"h")
      val perDoc = ex.join(broadcast(boiler), "h")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_boiler"))
      sh.select($"doc_id", size($"sh").cast("long").as("n_shingles"))
        .join(perDoc, Seq("doc_id"), "left")
        .select($"doc_id", $"n_shingles",
          coalesce($"n_boiler", lit(0L)).as("n_boiler"),
          when($"n_shingles" === 0, lit(0.0))
            .otherwise(coalesce($"n_boiler", lit(0L)).cast("double") /
              $"n_shingles".cast("double")).as("boiler_ratio"))
        .orderBy($"doc_id")
    }
  )

  // ------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(

    "llm_rarity_score" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |tk AS (
         |  SELECT doc_id, unnest(toks) AS term FROM d),
         |f AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tk GROUP BY 1),
         |t AS (SELECT CAST(sum(freq) AS BIGINT) AS t FROM f),
         |sc AS (
         |  SELECT tk.doc_id, tk.term,
         |    CAST(t.t AS DOUBLE) / CAST(f.freq AS DOUBLE) AS ratio
         |  FROM tk JOIN f USING (term) CROSS JOIN t)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(ratio ORDER BY term)), (acc, x) -> acc + x) AS rarity_sum,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(ratio ORDER BY term)), (acc, x) -> acc + x)
         |    / CAST(count(*) AS DOUBLE) AS rarity_mean
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_bigram_lm" ->
      s"""WITH tk AS (
         |  SELECT doc_id, $toksSql AS t FROM documents),
         |dp AS (
         |  SELECT doc_id,
         |    unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))])
         |      AS p
         |  FROM tk WHERE len(t) >= 2),
         |d2 AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM dp),
         |bg AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
         |  FROM d2 GROUP BY 1, 2),
         |pf AS (
         |  SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_pref FROM bg GROUP BY 1),
         |pr AS (
         |  SELECT bg.w1, bg.w2, c_bg * 1000000 // c_pref AS p_ppm
         |  FROM bg JOIN pf ON pf.w1 = bg.w1)
         |SELECT d2.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_p_ppm,
         |  CAST(min(p_ppm) AS BIGINT) AS min_p_ppm
         |FROM d2 JOIN pr ON pr.w1 = d2.w1 AND pr.w2 = d2.w2
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_bm25_topk" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |dd AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s
         |  FROM dd),
         |p AS (
         |  SELECT doc_id, dl, unnest(toks) AS term FROM dd),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
         |  FROM p WHERE term IN ($terms) GROUP BY 1, 2),
         |dft AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    (CAST(2 * stats.n + 1 - 2 * dft.df AS DOUBLE) /
         |     CAST(2 * dft.df + 1 AS DOUBLE)) *
         |    (CAST(22 * tf.tf * stats.s AS DOUBLE) /
         |     CAST(10 * tf.tf * stats.s + 3 * stats.s + 9 * tf.dl * stats.n
         |          AS DOUBLE)) AS sc
         |  FROM tf JOIN dft USING (term) CROSS JOIN stats),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(sc ORDER BY term)), (acc, x) -> acc + x) AS score
         |  FROM sc GROUP BY doc_id),
         |r AS (
         |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
         |  FROM agg)
         |SELECT CAST(rk AS INT) AS rank, doc_id, n_terms, score
         |FROM r WHERE rk <= $Bm25TopK ORDER BY rank""".stripMargin
    },

    "llm_collocations" ->
      s"""WITH d AS (
         |  SELECT $toksSql AS t FROM documents),
         |uni AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cw
         |  FROM (SELECT unnest(t) AS w FROM d) GROUP BY 1),
         |p AS (
         |  SELECT s.p.a AS a, s.p.b AS b FROM
         |    (SELECT unnest([{'a': t[i], 'b': t[i+1]}
         |                    for i in range(1, len(t))]) AS p
         |     FROM d WHERE len(t) >= 2) s),
         |big AS (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS n_pair FROM p GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM big)
         |SELECT a, b, n_pair, ua.cw AS n_a, ub.cw AS n_b,
         |  CAST(n_total * n_pair AS DOUBLE) / CAST(ua.cw * ub.cw AS DOUBLE) AS lift
         |FROM big JOIN uni ua ON ua.w = big.a JOIN uni ub ON ub.w = big.b
         |CROSS JOIN tot
         |WHERE n_pair >= 5
         |ORDER BY n_pair DESC, a, b LIMIT 50""".stripMargin,

    // the oracle takes the direct quadratic pair join over the
    // frequent-restricted postings — set-identical to the Spark
    // survivor-list expansion
    "llm_token_pairs" ->
      s"""WITH dt AS (
         |  SELECT doc_id, unnest(list_distinct($toksSql)) AS tok
         |  FROM documents),
         |dtf AS (SELECT doc_id, tok FROM dt WHERE len(tok) > 0),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |df AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dtf GROUP BY 1),
         |freq AS (
         |  SELECT tok, df FROM df, n
         |  WHERE df * 1000000 >= n_docs * $SupportPpm),
         |p AS (
         |  SELECT x.tok AS a, y.tok AS b
         |  FROM dtf x JOIN dtf y
         |    ON x.doc_id = y.doc_id AND x.tok < y.tok
         |  JOIN freq fx ON fx.tok = x.tok
         |  JOIN freq fy ON fy.tok = y.tok),
         |pc AS (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM p GROUP BY 1, 2)
         |SELECT pc.a AS token_a, pc.b AS token_b, pc.n_ab,
         |  fa.df AS df_a, fb.df AS df_b,
         |  (pc.n_ab * n.n_docs * 1000000) // (fa.df * fb.df) AS lift_ppm
         |FROM pc JOIN freq fa ON fa.tok = pc.a
         |JOIN freq fb ON fb.tok = pc.b, n
         |ORDER BY pc.n_ab DESC, 1, 2 LIMIT $TokenPairsTopK""".stripMargin,

    "llm_tfidf_keywords" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($toksSql) AS term FROM documents
         |  WHERE source IS NOT NULL),
         |tf AS (
         |  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2),
         |n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n FROM tf),
         |df AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT tf.source, tf.term, tf.tf, df.df,
         |    CAST(tf.tf AS DOUBLE) *
         |      ((CAST(n.n - df.df AS DOUBLE) + 0.5) /
         |       (CAST(df.df AS DOUBLE) + 0.5)) AS score
         |  FROM tf JOIN df USING (term), n),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY score DESC, term) AS rank FROM sc)
         |SELECT source, CAST(rank AS INT) AS rank, term, tf, df, score
         |FROM r WHERE rank <= $TfidfTopK ORDER BY source, rank""".stripMargin,

    "llm_ngram_novelty" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, ${hashedShinglesSql("t")} AS sh FROM d),
         |ex AS (
         |  SELECT doc_id, unnest(sh) AS h FROM sh),
         |fs AS (SELECT h, min(doc_id) AS first_doc FROM ex GROUP BY 1),
         |pd AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_novel
         |  FROM ex JOIN fs USING (h) GROUP BY 1)
         |SELECT sh.doc_id, CAST(len(sh.sh) AS BIGINT) AS n_shingles,
         |  COALESCE(pd.n_novel, 0) AS n_novel,
         |  CASE WHEN len(sh.sh) = 0 THEN 0.0
         |       ELSE CAST(COALESCE(pd.n_novel, 0) AS DOUBLE) /
         |            CAST(len(sh.sh) AS DOUBLE) END AS novelty
         |FROM sh LEFT JOIN pd USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "llm_boilerplate" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, ${hashedShinglesSql("t")} AS sh FROM d),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh),
         |ex AS (
         |  SELECT doc_id, unnest(sh) AS h FROM sh),
         |boiler AS (
         |  SELECT h FROM (SELECT h, count(*) AS df FROM ex GROUP BY 1), n
         |  WHERE df * $BoilerDfDen >= $BoilerDfNum * n.n),
         |pd AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
         |  FROM ex JOIN boiler USING (h) GROUP BY 1)
         |SELECT sh.doc_id, CAST(len(sh.sh) AS BIGINT) AS n_shingles,
         |  COALESCE(pd.n_boiler, 0) AS n_boiler,
         |  CASE WHEN len(sh.sh) = 0 THEN 0.0
         |       ELSE CAST(COALESCE(pd.n_boiler, 0) AS DOUBLE) /
         |            CAST(len(sh.sh) AS DOUBLE) END AS boiler_ratio
         |FROM sh LEFT JOIN pd USING (doc_id)
         |ORDER BY doc_id""".stripMargin
  )
}
