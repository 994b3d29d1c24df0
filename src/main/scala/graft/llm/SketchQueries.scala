package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextOps._

/** Frequency-sketch and weighted-sampling operators over the
  * `documents` fixture:
  *
  *  - Count-Min sketch heavy-hitter estimation + error audit: the
  *    mergeable, fixed-size frequency sketch every 100 TB term-stats
  *    job wants instead of a full `groupBy(term)` — the sketch is
  *    D×W counters no matter the corpus size, so it always fits in a
  *    broadcast — measured here against the exact counts so the
  *    (D, W) sizing decision is data-driven, the same audit shape as
  *    `llm_dedup_eval` / `llm_minhash_est`.
  *  - Deterministic weighted reservoir sampling (Efraimidis–Spirakis
  *    A-ES): one-pass weighted without-replacement sampling as a
  *    top-k over per-row keys u^(1/w) — no global state, no
  *    sequential reservoir, embarrassingly parallel.
  *
  * Engine-portable float discipline: weights are restricted to powers
  * of two so u^(1/w) is a chain of `sqrt` applications — IEEE 754
  * REQUIRES sqrt to be correctly rounded (unlike pow/ln, which are
  * only ~1-ulp in libm), so Spark and DuckDB produce bit-identical
  * sample keys. The uniform u itself is an exact md5-derived integer
  * scaled by 2^-32 (a power-of-two scale, also exact).
  */
object SketchQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Count-Min sketch depth (independent hash rows). */
  val CmsDepth = 4

  /** Count-Min sketch width (buckets per row; power of two). With the
    * fixture's ~30k token occurrences, W=256 gives a visible-but-small
    * overestimate — the audit's point is to MEASURE it.
    */
  val CmsWidth = 256

  /** Heavy hitters audited against the sketch. */
  val CmsTopK = 20

  /** HLL audit precision (p; 2^p registers). Smaller than the
    * production default 12 so the integer register checksum
    * Σ 2^((64−p)−rho) stays far inside 63 bits at every fixture sf.
    */
  val HllAuditP = 8

  /** Weighted-sample size. */
  val WrsK = 100

  /** KMV (bottom-k minimum hash values) sketch size per source. */
  val KmvK = 64

  /** Quantile-sketch sample size per group (bottom-k rows by hash). */
  val QskK = 128

  /** Per-row (r, bucket) probe pairs for a term column — the D sketch
    * coordinates of one term. Shared by the build (over the token
    * stream) and the probe (over the audited heavy hitters).
    */
  private[graft] def cmsCoords(term: org.apache.spark.sql.Column) =
    array((0 until CmsDepth).map { r =>
      struct(lit(r).as("r"),
        (hash32(concat(lit(s"cms$r:"), term)) % CmsWidth).as("bucket"))
    }: _*)

  /** DuckDB twin of [[cmsCoords]] for one row index `r` over term
    * expression `e`.
    */
  private def cmsBucketSql(r: String, e: String): String =
    s"${hash32Sql(s"'cms' || CAST($r AS VARCHAR) || ':' || $e")} % $CmsWidth"

  /** Power-of-two sampling weight by document length: longer documents
    * carry proportionally more training tokens, so a token-budget
    * sampler upweights them. Powers of two keep the A-ES key exact
    * (see class doc).
    */
  private def wrsWeight(nTokens: org.apache.spark.sql.Column) =
    when(nTokens >= 200, 8L).when(nTokens >= 100, 4L)
      .when(nTokens >= 50, 2L).otherwise(1L)

  val defs: Map[String, QFn] = Map(

    // --- Count-Min sketch heavy hitters + error audit -------------------
    // Build: token stream → D (row, bucket) coordinates per occurrence
    // → ONE partial+final count aggregate with at most D×W output rows
    // (a constant: 1024 cells here) — the sketch stays broadcastable at
    // any corpus size, which is exactly why it replaces groupBy(term)
    // at 100 TB. Probe: the exact top-K terms (the audit truth) look up
    // min over their D counters via a broadcast join against the
    // sketch. CMS guarantees est >= exact (one-sided error); the audit
    // emits the realized overestimate per heavy hitter.
    "llm_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      // occurrence counts fold from the shared document-term matrix —
      // the per-occurrence explode collapses to vocabulary×doc rows
      // weighted by c, same sums exactly
      val dtc = docTermCounts(s, dir)
      val sketch = dtc
        .select(explode(cmsCoords($"term")).as("rb"), $"c")
        .groupBy($"rb.r".as("r"), $"rb.bucket".as("bucket"))
        .agg(sum($"c").as("c"))
      val top = dtc.groupBy($"term").agg(sum($"c").as("exact_cnt"))
        .orderBy($"exact_cnt".desc, $"term").limit(CmsTopK)
      top
        .select($"term", $"exact_cnt", explode(cmsCoords($"term")).as("rb"))
        .select($"term", $"exact_cnt",
          $"rb.r".as("r"), $"rb.bucket".as("bucket"))
        .join(broadcast(sketch), Seq("r", "bucket"))
        .groupBy($"term", $"exact_cnt")
        .agg(min($"c").as("cms_est"))
        .select($"term", $"exact_cnt", $"cms_est",
          ($"cms_est" - $"exact_cnt").as("overest"),
          (($"cms_est" - $"exact_cnt").cast("double") / $"exact_cnt")
            .as("err_frac"))
        .orderBy($"term")
    },

    // --- HLL UDAF register audit (estimate + exact + error, r10) --------
    // Gates [[HllAggregator]]'s reduce/merge (via the register-exposing
    // [[HllSketchAggregator]]) against a DuckDB re-derivation of every
    // register: idx = low p bits, rho = trailing zeros of the remaining
    // bits + 1, per-register max. The register MULTISET is pinned
    // integer-exactly through s_scaled = Σ 2^(g−rho) (g = 64−p, summed
    // as DECIMAL/HUGEINT — no float fold order anywhere), n_regs and
    // max_rho; the RAW harmonic estimate and its realized error ppm
    // derive from s_scaled with a fixed operation order both engines
    // execute identically (exact-integer → double conversions and one
    // division; no ln/pow — the small-range-corrected estimate stays
    // spec-gated in HllAggregatorSpec where cross-engine bit equality
    // is not required). p=8 keeps Σ 2^(g−rho) inside 63 bits with wide
    // margin at every fixture scale.
    "llm_hll_audit" -> { (s, dir) =>
      import s.implicits._
      val hllSketch = udaf(new HllSketchAggregator(HllAuditP),
        org.apache.spark.sql.Encoders.scalaLong)
      // events.event_id: the fixture's one genuinely high-cardinality
      // stream (the documents vocab is ~31 tokens — an HLL over it
      // would sit in the linear-counting regime and audit nothing)
      val h = Tables(s, dir).events
        .select(hash60($"event_id".cast("string")).as("h"))
      val guard = 64 - HllAuditP
      val m = 1 << HllAuditP
      val am2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      // ONE scan: the sketch UDAF and the exact distinct fuse into a
      // single Expand-based aggregation (at 100 TB a second audit scan
      // doubles the IO for nothing)
      h.agg(hllSketch($"h").as("regs"), countDistinct($"h").as("exact_cnt"))
        .select($"exact_cnt", posexplode($"regs").as(Seq("idx", "rho")))
        .filter($"rho" > 0)
        .agg(
          max($"exact_cnt").as("exact_cnt"),
          count(lit(1)).as("n_regs"),
          max($"rho").as("max_rho"),
          // clamp: rho can reach guard+1 (all post-index hash bits
          // zero), where Spark's shiftleft would wrap the negative
          // count to 1<<63 while DuckDB's << would not — greatest(0,·)
          // on BOTH sides keeps the checksum defined for the full rho
          // range (~2^-52/row with 60-bit hashes, latent but real)
          sum(expr(
            s"shiftleft(cast(1 as bigint), greatest(0, cast($guard - rho as int)))")
            .cast("decimal(38,0)")).as("s_raw"))
        // an empty corpus reports NO rows, not one all-null row (the
        // global agg over zero registers would otherwise fabricate one)
        .filter($"n_regs" > 0)
        .select(
          $"exact_cnt", $"n_regs", $"max_rho",
          $"s_raw".cast("double").as("s_scaled"),
          floor(lit(am2) /
            ((lit(m.toDouble) - $"n_regs".cast("double")) +
              $"s_raw".cast("double") / lit(math.pow(2.0, guard))))
            .as("est_raw"))
        .withColumn("err_ppm",
          floor(abs($"est_raw" - $"exact_cnt").cast("double") * lit(1e6) /
            $"exact_cnt".cast("double")))
    },

    // --- CMS join-cardinality estimation (optimizer-statistics audit) ----
    // The classic sketch application INSIDE a query engine: estimate
    // |R ⋈_k S| without running the join, from each side's Count-Min
    // sketch over the join key — est_r = Σ_w cR[r,w]·cS[r,w] per hash
    // row, estimate = min_r (the CMS inner product; an overestimate,
    // never under, since colliding keys only ADD cross terms). This is
    // the statistic a cost-based planner wants before picking
    // broadcast-vs-shuffle or deciding to salt (q23/q31), at the cost
    // of two linear scans folding into two constant-size (D×W) tables
    // whose "join" is D×W broadcast rows. The query audits the
    // estimate against the exact join count — at 100 TB you keep the
    // sketches and drop the audit join.
    "llm_join_size_est" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      def sketch(df: DataFrame, key: org.apache.spark.sql.Column) =
        df.select(explode(cmsCoords(key.cast("string"))).as("rb"))
          .groupBy($"rb.r".as("r"), $"rb.bucket".as("bucket"))
          .agg(count(lit(1)).as("c"))
      val cE = sketch(t.events, $"user_id")
      val cC = sketch(t.customer, $"c_custkey")
      val est = cE.join(cC.select($"r", $"bucket", $"c".as("c2")),
          Seq("r", "bucket"))
        .groupBy($"r").agg(sum($"c" * $"c2").as("est_r"))
        .agg(min($"est_r").as("cms_est"))
      val exact = t.events.join(t.customer, $"user_id" === $"c_custkey")
        .agg(count(lit(1)).as("exact_n"))
      exact.crossJoin(est)
        .select($"exact_n", $"cms_est",
          ($"cms_est" - $"exact_n").as("overest"),
          expr("(cms_est - exact_n) * 1000000L div exact_n").as("err_ppm"))
    },

    // --- KMV bottom-k sketches + cross-source vocabulary overlap ---------
    // The set-operation sketch CMS can't provide: per source, the K
    // smallest distinct token hashes are an order-free, mergeable
    // summary of the whole vocabulary (bottom-k of a hash set is the
    // same under ANY partitioning — no float, no order sensitivity).
    // Pairwise source overlap then costs |sources|·K rows instead of a
    // vocab×vocab join: merge two sketches, keep the K smallest of the
    // union M, and estimate Jaccard as |M ∩ A ∩ B| / |M| (the standard
    // KMV estimator). The bottom-k itself is a rank window that plans
    // as WindowGroupLimit — a bounded per-partition heap, never a full
    // per-source sort. Like llm_dedup_eval / llm_minhash_est, the query
    // ALSO computes the exact vocab Jaccard (one token-keyed equi-join
    // — the linear audit you can still afford at fixture scale) and
    // emits the realized estimator error per pair; at 100 TB you keep
    // the sketch half (constant size) and drop the audit half.
    "llm_kmv_overlap" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // the per-source hashed vocabulary (distinct (source, h))
      val v = IndexArtifacts.cachedIndex(s, dir, "kmv-vocab",
        Seq(s"$dir/documents.parquet"))(
        Tables(s, dir).documents
          .select($"source", explode(tokens($"text")).as("tok"))
          .select($"source", hash32($"tok").as("h"))
          .distinct())
      val wS = Window.partitionBy($"source").orderBy($"h".asc)
      val sk = v.withColumn("rn", row_number().over(wS))
        .filter($"rn" <= KmvK).select($"source", $"h")
      val srcs = sk.select($"source").distinct()
      val pairs = srcs.as("a").join(srcs.as("b"),
          col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
      // union the pair's two sketches, flagging membership per side
      val ea = pairs.join(sk, $"source" === $"src_a")
        .select($"src_a", $"src_b", $"h",
          lit(1L).as("ina"), lit(0L).as("inb"))
      val eb = pairs.join(sk, $"source" === $"src_b")
        .select($"src_a", $"src_b", $"h",
          lit(0L).as("ina"), lit(1L).as("inb"))
      val u = ea.union(eb).groupBy($"src_a", $"src_b", $"h")
        .agg(max($"ina").as("ina"), max($"inb").as("inb"))
      val wP = Window.partitionBy($"src_a", $"src_b").orderBy($"h".asc)
      val est = u.withColumn("rn", row_number().over(wP))
        .filter($"rn" <= KmvK)
        .groupBy($"src_a", $"src_b")
        .agg(count(lit(1)).as("m_size"), sum($"ina" * $"inb").as("n_shared"))
      // exact truth (the audit side): vocab sizes + token-keyed join
      val counts = v.groupBy($"source").agg(count(lit(1)).as("n"))
      val ex = v.as("x").join(v.as("y"),
          col("x.h") === col("y.h") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
      pairs
        .join(broadcast(counts.select($"source".as("src_a"), $"n".as("n_a"))),
          Seq("src_a"))
        .join(broadcast(counts.select($"source".as("src_b"), $"n".as("n_b"))),
          Seq("src_b"))
        .join(ex, Seq("src_a", "src_b"), "left")
        .join(est, Seq("src_a", "src_b"))
        .withColumn("n_common", coalesce($"n_common", lit(0L)))
        .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_common",
          expr("n_common * 1000000L div (n_a + n_b - n_common)")
            .as("jacc_exact_ppm"),
          expr("n_shared * 1000000L div m_size").as("jacc_est_ppm"))
        .withColumn("err_ppm", abs($"jacc_est_ppm" - $"jacc_exact_ppm"))
        .orderBy($"src_a", $"src_b")
    },

    // --- mergeable uniform-sample quantile sketch + exact audit ---------
    // The distributed-quantile primitive (the GK/KLL deployment shape):
    // per group, the K rows with the SMALLEST md5-derived hash of the
    // row id form the sketch — a bottom-K-by-hash set is simultaneously
    // a uniform sample and a MERGEABLE summary (union-then-truncate
    // combines partials associatively, so at 100 TB it map-side
    // combines exactly like the KMV sketch above; the window form here
    // is the small-group shape of the same computation). Deciles read
    // off the sample by exact rank arithmetic (percentile_disc
    // semantics: value at rank ceil(q·n/10), 1-based), and the exact
    // per-group deciles ride along as the audit — est vs exact per
    // (source, decile) with absolute error, so the K-sizing decision is
    // data-driven. Integer ranks + md5 hashing only: bit-identical in
    // DuckDB, no floating-point quantile interpolation to disagree on.
    "llm_quantile_sketch" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir).documents
        .select($"source", $"doc_id", length($"text").cast("long").as("v"))
      def deciles(df: DataFrame, out: String): DataFrame = {
        val wv = Window.partitionBy($"source").orderBy($"v".asc, $"doc_id".asc)
        val ranked = df.withColumn("rn", row_number().over(wv).cast("long"))
        val pos = df.groupBy($"source").agg(count(lit(1)).as("n"))
          .select($"source", explode(sequence(lit(1L), lit(9L))).as("decile"),
            $"n")
          .withColumn("pos", expr("(decile * n + 9) div 10"))
          .select($"source", $"decile", $"pos")
        // 9 rows per group: always broadcast, rank-indexed point lookup
        ranked.join(broadcast(pos), Seq("source")).filter($"rn" === $"pos")
          .select($"source", $"decile", $"v".as(out))
      }
      val wh = Window.partitionBy($"source").orderBy(
        hash32(concat(lit("qsk:"), $"doc_id".cast("string"))).asc,
        $"doc_id".asc)
      val samp = d.withColumn("hrn", row_number().over(wh))
        .filter($"hrn" <= QskK).drop("hrn")
      deciles(samp, "est_v").join(deciles(d, "exact_v"),
          Seq("source", "decile"))
        .withColumn("err", abs($"est_v" - $"exact_v"))
        .orderBy($"source", $"decile")
    },

    // --- deterministic weighted reservoir sample (A-ES) -----------------
    // Efraimidis–Spirakis: each row draws key = u^(1/w); the k largest
    // keys are a weighted without-replacement sample. One corpus scan +
    // one top-k (TakeOrderedAndProject — no global sort); the keys need
    // no coordination, so the operator parallelizes trivially and
    // composes with any upstream filter. Weights are powers of two and
    // u is an exact 2^-32-scaled md5 integer, so the key is a chain of
    // correctly-rounded sqrts — bit-identical in both engines.
    "llm_weighted_sample" -> { (s, dir) =>
      import s.implicits._
      val u = (hash32(concat(lit("wrs:"), $"doc_id".cast("string"))) + 1L)
        .cast("double") / lit(4294967296.0)
      val w = wrsWeight(size(tokens($"text")))
      Tables(s, dir).documents
        .select($"doc_id", w.as("weight"), u.as("u"))
        .withColumn("sample_key",
          when($"weight" === 8L, sqrt(sqrt(sqrt($"u"))))
            .when($"weight" === 4L, sqrt(sqrt($"u")))
            .when($"weight" === 2L, sqrt($"u"))
            .otherwise($"u"))
        .orderBy($"sample_key".desc, $"doc_id").limit(WrsK)
        .select($"doc_id", $"weight", $"sample_key")
    }
  )

  val oracles: Map[String, String] = Map(

    "llm_heavy_hitters" -> {
      val buildBuckets = (0 until CmsDepth).map { r =>
        s"{'r': $r, 'bucket': ${cmsBucketSql(r.toString, "term")}}"
      }.mkString(",\n            ")
      s"""WITH posts AS (
         |  SELECT unnest($toksSql) AS term FROM documents),
         |coords AS (
         |  SELECT unnest([$buildBuckets]) AS rb FROM posts),
         |sketch AS (
         |  SELECT rb.r AS r, rb.bucket AS bucket, count(*) AS c
         |  FROM coords GROUP BY 1, 2),
         |top AS (
         |  SELECT term, count(*) AS exact_cnt FROM posts
         |  GROUP BY term ORDER BY exact_cnt DESC, term LIMIT $CmsTopK),
         |probe AS (
         |  SELECT t.term, t.exact_cnt, g.r AS r,
         |    ${cmsBucketSql("g.r", "t.term")} AS bucket
         |  FROM top t, range(0, $CmsDepth) g(r)),
         |est AS (
         |  SELECT p.term, p.exact_cnt, min(s.c) AS cms_est
         |  FROM probe p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
         |  GROUP BY 1, 2)
         |SELECT term, exact_cnt, cms_est,
         |  cms_est - exact_cnt AS overest,
         |  CAST(cms_est - exact_cnt AS DOUBLE) / exact_cnt AS err_frac
         |FROM est ORDER BY term""".stripMargin
    },

    "llm_hll_audit" -> {
      val g = 64 - HllAuditP
      val m = 1 << HllAuditP
      val am2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      val pow2g = math.pow(2.0, g)
      val x = s"((h // $m) | (CAST(1 AS BIGINT) << $g))"
      s"""WITH h AS (
         |  SELECT ${hash60Sql("CAST(event_id AS VARCHAR)")} AS h
         |  FROM events),
         |rr AS (SELECT h % $m AS idx,
         |  bit_count(($x & -$x) - 1) + 1 AS rho FROM h),
         |regs AS (SELECT idx, max(rho) AS rho FROM rr GROUP BY idx),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_regs,
         |  CAST(max(rho) AS BIGINT) AS max_rho,
         |  sum(CAST(1 AS BIGINT) << greatest(0, $g - rho)) AS s_raw FROM regs),
         |ex AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS exact_cnt FROM h),
         |est AS (
         |  SELECT exact_cnt, n_regs, max_rho,
         |    CAST(s_raw AS DOUBLE) AS s_scaled,
         |    CAST(floor(CAST($am2 AS DOUBLE) /
         |      ((CAST($m AS DOUBLE) - CAST(n_regs AS DOUBLE)) +
         |        CAST(s_raw AS DOUBLE) / CAST($pow2g AS DOUBLE))) AS BIGINT)
         |      AS est_raw
         |  FROM agg, ex)
         |SELECT exact_cnt, n_regs, max_rho, s_scaled, est_raw,
         |  CAST(floor(CAST(abs(est_raw - exact_cnt) AS DOUBLE) * 1e6 /
         |    CAST(exact_cnt AS DOUBLE)) AS BIGINT) AS err_ppm
         |FROM est""".stripMargin
    },

    "llm_join_size_est" -> {
      def buckets(e: String) = (0 until CmsDepth).map { r =>
        s"{'r': $r, 'bucket': ${cmsBucketSql(r.toString, e)}}"
      }.mkString(",\n            ")
      s"""WITH ce AS (
         |  SELECT rb.r AS r, rb.bucket AS bucket,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest([${buckets("CAST(user_id AS VARCHAR)")}]) AS rb
         |        FROM events)
         |  GROUP BY 1, 2),
         |cc AS (
         |  SELECT rb.r AS r, rb.bucket AS bucket,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest([${buckets("CAST(c_custkey AS VARCHAR)")}]) AS rb
         |        FROM customer)
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT min(est_r) AS cms_est FROM (
         |    SELECT ce.r, CAST(sum(ce.c * cc.c) AS BIGINT) AS est_r
         |    FROM ce JOIN cc ON cc.r = ce.r AND cc.bucket = ce.bucket
         |    GROUP BY 1)),
         |ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS exact_n
         |  FROM events JOIN customer ON user_id = c_custkey)
         |SELECT exact_n, cms_est, cms_est - exact_n AS overest,
         |  CAST((cms_est - exact_n) * 1000000 // exact_n AS BIGINT) AS err_ppm
         |FROM ex, est""".stripMargin
    },

    "llm_kmv_overlap" ->
      s"""WITH v AS (
         |  SELECT DISTINCT source, ${hash32Sql("tok")} AS h
         |  FROM (SELECT source, unnest($toksSql) AS tok FROM documents)),
         |sk AS (
         |  SELECT source, h FROM (
         |    SELECT source, h,
         |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |    FROM v) WHERE rn <= $KmvK),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b
         |  FROM srcs a JOIN srcs b ON a.source < b.source),
         |u AS (
         |  SELECT src_a, src_b, h, max(ina) AS ina, max(inb) AS inb FROM (
         |    SELECT p.src_a, p.src_b, s.h, 1 AS ina, 0 AS inb
         |    FROM pairs p JOIN sk s ON s.source = p.src_a
         |    UNION ALL
         |    SELECT p.src_a, p.src_b, s.h, 0 AS ina, 1 AS inb
         |    FROM pairs p JOIN sk s ON s.source = p.src_b)
         |  GROUP BY 1, 2, 3),
         |m AS (
         |  SELECT src_a, src_b, ina, inb FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src_a, src_b
         |      ORDER BY h) AS rn FROM u) WHERE rn <= $KmvK),
         |est AS (
         |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS m_size,
         |    CAST(sum(ina * inb) AS BIGINT) AS n_shared
         |  FROM m GROUP BY 1, 2),
         |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
         |ex AS (
         |  SELECT x.source AS src_a, y.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_common
         |  FROM v x JOIN v y ON x.h = y.h AND x.source < y.source
         |  GROUP BY 1, 2)
         |SELECT p.src_a, p.src_b, ca.n AS n_a, cb.n AS n_b,
         |  COALESCE(ex.n_common, 0) AS n_common,
         |  CAST(COALESCE(ex.n_common, 0) * 1000000 //
         |    (ca.n + cb.n - COALESCE(ex.n_common, 0)) AS BIGINT)
         |    AS jacc_exact_ppm,
         |  CAST(est.n_shared * 1000000 // est.m_size AS BIGINT)
         |    AS jacc_est_ppm,
         |  CAST(abs(est.n_shared * 1000000 // est.m_size -
         |    COALESCE(ex.n_common, 0) * 1000000 //
         |    (ca.n + cb.n - COALESCE(ex.n_common, 0))) AS BIGINT) AS err_ppm
         |FROM pairs p
         |JOIN c ca ON ca.source = p.src_a
         |JOIN c cb ON cb.source = p.src_b
         |LEFT JOIN ex ON ex.src_a = p.src_a AND ex.src_b = p.src_b
         |JOIN est ON est.src_a = p.src_a AND est.src_b = p.src_b
         |ORDER BY 1, 2""".stripMargin,

    "llm_quantile_sketch" ->
      s"""WITH d AS (
         |  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS v
         |  FROM documents),
         |samp AS (
         |  SELECT source, doc_id, v FROM (
         |    SELECT source, doc_id, v, row_number() OVER (
         |      PARTITION BY source
         |      ORDER BY ${hash32Sql("'qsk:' || CAST(doc_id AS VARCHAR)")},
         |        doc_id) AS hrn
         |    FROM d) WHERE hrn <= $QskK),
         |qs AS (SELECT unnest(generate_series(1, 9)) AS decile),
         |est AS (
         |  SELECT r.source, p.decile, r.v AS est_v
         |  FROM (SELECT source, v, row_number() OVER (
         |          PARTITION BY source ORDER BY v, doc_id) AS rn
         |        FROM samp) r
         |  JOIN (SELECT c.source, q.decile,
         |          (q.decile * c.n + 9) // 10 AS pos
         |        FROM (SELECT source, CAST(count(*) AS BIGINT) AS n
         |              FROM samp GROUP BY 1) c, qs q) p
         |    ON p.source = r.source AND p.pos = r.rn),
         |ex AS (
         |  SELECT r.source, p.decile, r.v AS exact_v
         |  FROM (SELECT source, v, row_number() OVER (
         |          PARTITION BY source ORDER BY v, doc_id) AS rn
         |        FROM d) r
         |  JOIN (SELECT c.source, q.decile,
         |          (q.decile * c.n + 9) // 10 AS pos
         |        FROM (SELECT source, CAST(count(*) AS BIGINT) AS n
         |              FROM d GROUP BY 1) c, qs q) p
         |    ON p.source = r.source AND p.pos = r.rn)
         |SELECT est.source, CAST(est.decile AS BIGINT) AS decile,
         |  est.est_v, ex.exact_v,
         |  CAST(abs(est.est_v - ex.exact_v) AS BIGINT) AS err
         |FROM est JOIN ex ON ex.source = est.source
         |  AND ex.decile = est.decile
         |ORDER BY 1, 2""".stripMargin,

    "llm_weighted_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN len($toksSql) >= 200 THEN CAST(8 AS BIGINT)
         |         WHEN len($toksSql) >= 100 THEN CAST(4 AS BIGINT)
         |         WHEN len($toksSql) >= 50 THEN CAST(2 AS BIGINT)
         |         ELSE CAST(1 AS BIGINT) END AS weight,
         |    CAST(${hash32Sql("'wrs:' || CAST(doc_id AS VARCHAR)")} + 1
         |         AS DOUBLE) / 4294967296.0 AS u
         |  FROM documents),
         |keyed AS (
         |  SELECT doc_id, weight,
         |    CASE weight WHEN 8 THEN sqrt(sqrt(sqrt(u)))
         |                WHEN 4 THEN sqrt(sqrt(u))
         |                WHEN 2 THEN sqrt(u)
         |                ELSE u END AS sample_key
         |  FROM d)
         |SELECT doc_id, weight, sample_key
         |FROM (SELECT * FROM keyed
         |      ORDER BY sample_key DESC, doc_id LIMIT $WrsK)
         |ORDER BY doc_id""".stripMargin
  )
}
