package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextOps._

/** Document-deduplication + corpus-curation operator family over the
  * `documents` fixture (SURVEY.md §7.5; the reference has no analog —
  * these are the training-data-pipeline extensions the driver
  * mandates). Each operator has a DuckDB oracle twin built from the
  * same deterministic primitives ([[TextOps]]):
  *
  *  - exact dedup: normalized-content md5 → hash groupBy.
  *  - MinHash-LSH near-dedup: k=16 signature → 4 banded buckets →
  *    bucket equi-join for candidates → exact-Jaccard verification.
  *  - SimHash near-dedup: 32-bit sign-aggregated fingerprint, 4×8-bit
  *    banded buckets, Hamming-distance verification via bit_count(xor).
  *  - n-gram (trigram) Jaccard near-dedup: MinHash-banded candidates +
  *    exact verification via the codegen'd two-pointer intersect.
  *  - embedding-cosine near-dup: MinHash-banded candidates + exact
  *    integer CENTERED-cosine verification over feature-hashed count
  *    vectors.
  *  - near-dup cluster resolution: distributed min-label connected
  *    components → one canonical doc per duplicate family.
  *  - deterministic stratified sampling and leakage-safe train/test
  *    splitting (split unit = dedup cluster).
  *  - corpus curation composite: quality gates + canonicalization with
  *    auditable per-doc rejection reasons.
  *
  * Scale invariant shared by every near-dup operator here: candidate
  * generation is ALWAYS a band/bucket equi-join on uniformly-hashed
  * keys, and the exact verifier touches candidate pairs only. At 100 TB
  * the knobs are the band structure (more rows per band keeps buckets
  * bounded as the corpus grows); the join never degrades to Σ|block|²
  * all-pairs.
  */
object DedupQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** PageRank fixed-point scale: scores are integers in units of
    * 1e-6 rank mass, so damping and degree division stay exact int64
    * arithmetic (identical in both engines — no float summation
    * order to disagree on).
    */
  val PrScale = 1000000L

  /** Unrolled PageRank iterations — enough to separate hubs from
    * leaves on diameter-small dup families; at 100 TB this is a knob,
    * each extra iteration costing one edge join + partial agg.
    */
  val PrIters = 3

  /** documents ∪ a planted duplicate set: the first 20 docs re-appear
    * upper-cased under doc_id+10000, so exact dedup has real work to do
    * (the raw corpus is duplicate-free). Mirrored verbatim in the
    * oracle SQL.
    */
  /** Build-once batch-1 incremental-cluster index (docs with
    * doc_id % 3 != 0) — the shared SETUP of `llm_cluster_inc` (which
    * times the incremental batch-2 update against a copy) and the
    * full-state artifact behind `llm_cluster_retire`.
    */
  private def clusterIncBase(s: SparkSession, dir: String,
      docs: DataFrame): String = {
    import s.implicits._
    IndexArtifacts.cachedPath(dir, "cluster-inc-base",
      inputs = Seq(s"$dir/documents.parquet")) { out =>
      IncrementalClusters.update(s, out, docs.filter($"doc_id" % 3 =!= 0))
    }
  }

  /** Recursive file copy — an index-mutating query works on a COPY of
    * the build-once artifact, never the artifact itself.
    */
  private def copyRec(from: java.io.File, to: java.io.File): Unit = {
    if (from.isDirectory) {
      to.mkdirs()
      Option(from.listFiles()).getOrElse(Array.empty)
        .foreach(f => copyRec(f, new java.io.File(to, f.getName)))
    } else
      java.nio.file.Files.copy(from.toPath, to.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

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

  /** [[shingledSql]] over a filtered corpus — shared by the retirement
    * oracle, whose fixpoint is the closure over the REMAINING docs.
    */
  private def shingledSqlWhere(pred: String) =
    s"""SELECT doc_id, sh FROM (
       |    SELECT doc_id, ${hashedShinglesSql("t")} AS sh
       |    FROM (SELECT doc_id, $toksSql AS t FROM documents WHERE $pred))
       |  WHERE len(sh) > 0""".stripMargin

  private val shingledSql = shingledSqlWhere("TRUE")

  /** MinHash band table `(doc_id, band, bh)` for a `(doc_id, sh)` input —
    * the shared candidate-generation index of `llm_minhash_lsh` and
    * `llm_ngram_jaccard`. All 4 band hashes come from ONE projection +
    * explode (a 4-way union would recompute the whole signature
    * pipeline per band). Callers persist the result: both sides of the
    * candidate self-join consume it, and it is 4 rows × (long + 32-char
    * hash) per doc — the LSH "index", tiny next to the corpus at any
    * scale.
    */
  private[llm] def minhashBands(docs: DataFrame): DataFrame =
    bandsFromSig(minhashSig(docs))

  // ---- build-once shared LSH base (per corpus) -----------------------
  // The r3-mandated shared-artifact pattern (cluster labels) extended
  // to the index itself: a real pipeline shingles, signs, and bands the
  // corpus ONCE, and every consumer — near-dedup verifies, estimator
  // and recall audits, skew reports, graph/triplet mining — reads the
  // same index files. Build seconds surface in Bench `artifacts`
  // (nothing hidden); queries whose POINT is building a variant index
  // (the trigram table, incremental state) keep their own builds.

  /** The bigram-shingled corpus `(doc_id, sh)`, built once per corpus. */
  private[llm] def sharedShingles(s: SparkSession, dir: String): DataFrame =
    IndexArtifacts.cached(s, dir, "dedup-shingles",
      inputs = Seq(s"$dir/documents.parquet")) { out =>
      shingled(s, dir).write.parquet(out)
    }

  /** The 16-permutation signature table, built once per corpus. */
  private[llm] def sharedSig(s: SparkSession, dir: String): DataFrame = {
    // resolve the dependency OUTSIDE the build lambda so each
    // artifact's reported build seconds are its own increment, not the
    // whole nested chain
    val sh = sharedShingles(s, dir)
    IndexArtifacts.cached(s, dir, "dedup-sig",
      inputs = Seq(s"$dir/documents.parquet")) { out =>
      minhashSig(sh).write.parquet(out)
    }
  }

  /** The band index over [[sharedSig]], built once per corpus. */
  private[llm] def sharedBands(s: SparkSession, dir: String): DataFrame = {
    val sig = sharedSig(s, dir)
    IndexArtifacts.cached(s, dir, "dedup-bands",
      inputs = Seq(s"$dir/documents.parquet")) { out =>
      bandsFromSig(sig).write.parquet(out)
    }
  }

  /** The 16-permutation MinHash signature `(doc_id, m0..m15)` — the
    * sketch both the band index and the estimator audit
    * (`llm_minhash_est`) derive from.
    */
  private[llm] def minhashSig(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(col("sh")).as("h0"))
      .withColumn("h", col("h0") % P)
    tok.groupBy(col("doc_id")).agg(
      min((lit(perms(0)._1) * col("h") + lit(perms(0)._2)) % P).as("m0"),
      perms.zipWithIndex.tail.map { case ((a, b), i) =>
        min((lit(a) * col("h") + lit(b)) % P).as(s"m$i")
      }: _*)
  }

  /** Band table from a pre-computed signature — lets a caller that
    * materialized the signature build bands without recomputing it.
    */
  private[llm] def bandsFromSig(sig: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { k =>
      val cols = (0 until RowsPerBand)
        .map(r => col(s"m${k * RowsPerBand + r}").cast("string"))
      struct(lit(k).as("band"), md5(concat_ws(",", cols: _*)).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("s"))
      .select(col("doc_id"), col("s.band").as("band"), col("s.bh").as("bh"))
  }

  /** Candidate pairs `(doc_a, doc_b)` from a band table: bucket
    * equi-join, deduplicated across bands.
    */
  private def bandCandidates(bands: DataFrame, keys: Seq[String]): DataFrame =
    bands.as("bx").join(bands.as("by"),
        keys.map(k => col(s"bx.$k") === col(s"by.$k")).reduce(_ && _) &&
          col("bx.doc_id") < col("by.doc_id"))
      .select(col("bx.doc_id").as("doc_a"), col("by.doc_id").as("doc_b"))
      .distinct()

  /** HOT-BUCKET-BOUNDED candidate pairs — the mitigation
    * `llm_band_skew` measures for. The plain bucket self-join is
    * quadratic INSIDE each (band, bh) bucket, so one boilerplate
    * bucket of B docs costs C(B,2) pairs and dominates the pipeline.
    * Here a bucket of size ≤ cap expands to full pairs (identical to
    * [[bandCandidates]]); a bucket of size > cap contributes only its
    * id-sorted adjacent CHAIN — B−1 pairs, linear in the bucket.
    *
    * What the cap preserves and what it trades: the chain keeps the
    * bucket CONNECTED, so connected-component clustering over
    * verified pairs sees the same components whenever verification
    * passes along the chain (the boilerplate case that creates hot
    * buckets — near-identical docs — is exactly the case where it
    * does). What it gives up is pair-level completeness: a distant
    * pair inside a hot bucket is only reached transitively. That is
    * the standard production trade (cap/shard/stop-shingle); the
    * measure (`llm_band_skew`) prices when to take it.
    *
    * Shapes: one (band, bh)-keyed partial-agg for sizes, one keyed
    * equi-join over the ≤cap slice, one (band, bh)-partitioned window
    * over the >cap slice — never Σ B² anywhere.
    */
  private[llm] def bandCandidatesCapped(bands: DataFrame, cap: Int): DataFrame = {
    val sized = bands.join(
      bands.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("bsz")),
      Seq("band", "bh"))
    val small = sized.filter(col("bsz") <= cap)
    val fullPairs = small.as("bx").join(small.as("by"),
        col("bx.band") === col("by.band") && col("bx.bh") === col("by.bh") &&
          col("bx.doc_id") < col("by.doc_id"))
      .select(col("bx.doc_id").as("doc_a"), col("by.doc_id").as("doc_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bh")).orderBy(col("doc_id"))
    val chain = sized.filter(col("bsz") > cap)
      .withColumn("nxt", lead(col("doc_id"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id").as("doc_a"), col("nxt").as("doc_b"))
    fullPairs.unionByName(chain).distinct()
  }

  /** Cap for `llm_band_cap` — 2 at fixture scale so BOTH paths carry
    * rows (sf0.01 buckets top out at 3); at 100 TB the cap is set from
    * the `llm_band_skew` report (e.g. 100× the expected bucket size).
    */
  val BandCap = 2

  /** Feature-hash dimensionality of the count vectors in
    * `llm_vector_neardup`.
    */
  val VDim = 32

  /** Absolute audit-scope bound for `llm_dedup_eval`: the exact
    * all-pairs ground truth covers docs with `doc_id < AuditScope`
    * only (≤ ~500k pairs) — a deterministic sample whose cost is
    * CONSTANT in corpus size, which is what makes an all-pairs audit
    * admissible at any scale.
    */
  val AuditScope = 1000L

  /** Connected-component label per doc appearing in a near-dup pair
    * (MinHash-banded candidates, exact Jaccard >= 0.3 verify), by
    * distributed MIN-LABEL PROPAGATION: every vertex starts labeled
    * with its own id and repeatedly takes the min over its neighborhood
    * until fixpoint. One bucketed equi-join + partially-aggregated
    * groupBy per iteration; iterations bounded by component diameter
    * (near-dup families are tiny cliques, so 1-2 rounds); the driver
    * only checks the convergence count. Bench note: at fixture scale
    * the wall time is fixed multi-job scheduling latency of the
    * iterative loop (2 rounds × job overhead), not data volume — the
    * per-round work is one bucketed join + partial agg, which is what
    * scales.
    *
    * MATERIALIZED ONCE per (JVM, corpus dir) as a pipeline artifact
    * ([[IndexArtifacts.cached]]) shared by `llm_dedup_clusters`,
    * `llm_split_leakage_safe` and `llm_corpus_filter` — a real pipeline
    * computes cluster labels once and joins them everywhere; running
    * connected components three times is thrown-away compute at 100 TB.
    * The DuckDB oracles share the label CTE textually the same way.
    */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame =
    IndexArtifacts.cached(s, dir, "cluster-labels",
      inputs = Seq(s"$dir/documents.parquet"))(buildClusterLabels(s, dir, _))

  /** One-shot builder behind [[clusterLabels]]: runs the full pipeline,
    * writes the `(doc_id, label)` table to `out`, and releases every
    * cache it took — the artifact files are the only thing left behind.
    */
  private def buildClusterLabels(s: SparkSession, dir: String, out: String): Unit = {
    import s.implicits._
    val pairs = dupPairs(s, dir)
    val (labels, release) = propagateMinLabels(
      pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst"))))
    labels.write.parquet(out)
    release()
  }

  /** Verified near-dup pairs `(doc_a, doc_b)` (doc_a < doc_b, Jaccard
    * >= 0.3) as a build-once artifact — the EDGE TABLE of the near-dup
    * graph, shared by the cluster-label builder and the graph
    * analytics (`llm_dup_pagerank`). A real pipeline materializes the
    * candidate-verify output once; every graph consumer afterwards
    * reads edges, never re-runs the LSH pipeline.
    */
  private[llm] def dupPairs(s: SparkSession, dir: String): DataFrame =
    IndexArtifacts.cached(s, dir, "dup-pairs",
      inputs = Seq(s"$dir/documents.parquet"))(buildDupPairs(s, dir, _))

  private def buildDupPairs(s: SparkSession, dir: String, out: String): Unit = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // the shared shingle + band artifacts feed the candidate join and
    // both verify sides (built once; this builder may be their first
    // caller)
    val docs = sharedShingles(s, dir)
    val bands = sharedBands(s, dir)
    // union-shaped two-pointer verify: same rational as
    // array_intersect/array_union but codegen'd, and the injected
    // JaccardLengthFilter rule prepends the O(1) size bounds
    bandCandidates(bands, Seq("band", "bh"))
      .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sa")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sb")), "doc_b")
      .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
      .filter(($"nc".cast("double") /
        (size($"sa") + size($"sb") - $"nc").cast("double")) >= 0.3)
      .select($"doc_a", $"doc_b")
      .write.parquet(out)
  }

  /** Edge-count bound under which connected components run as a
    * driver-side union-find instead of the distributed propagation
    * loop. 4M symmetric edges ≈ 64 MB collected — bounded, and the
    * dup-graph edge table is already the VERIFIED pair set (tiny
    * relative to the corpus: it is the near-dup rate × corpus, not the
    * corpus itself). The incremental maintainer's per-batch affected
    * subgraph in particular is almost always far below this.
    */
  private val UnionFindEdgeCap = 4L << 20

  /** MIN-LABEL connected components over a symmetric edge table
    * `(src, dst)` → `(doc_id, label)` per vertex, label = min doc_id of
    * its connected component. Scale-adaptive: an edge table within
    * [[UnionFindEdgeCap]] collects once and resolves by driver
    * union-find (exact, one job — the common case: verified near-dup
    * edges are sparse, and incremental batches touch small
    * neighborhoods); above the cap, distributed min-label propagation
    * runs one bucketed equi-join + partial agg per iteration,
    * iterations bounded by component diameter, one action per
    * iteration (the convergence flag rides in the next-generation
    * projection). Both paths produce the identical fixpoint. Returns
    * the labels plus a release() the caller MUST invoke after
    * consuming them — shared by the batch builder and the incremental
    * maintainer.
    */
  private[llm] def propagateMinLabels(adjIn: DataFrame): (DataFrame, () => Unit) = {
    val s = adjIn.sparkSession
    import s.implicits._
    // ONE probe job decides the path and, in the common case, already
    // delivers the payload: collect up to cap+1 edges; a result within
    // the cap IS the full edge set.
    val probe = adjIn.select($"src", $"dst")
      .limit(UnionFindEdgeCap.toInt + 1).as[(Long, Long)].collect()
    if (probe.length <= UnionFindEdgeCap) {
      // Driver union-find with union-by-min-root: attaching the larger
      // root under the smaller makes every final root the component
      // MINIMUM — the same fixpoint the propagation loop reaches.
      val edges = probe
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      val vertices = edges.iterator.flatMap(e => Iterator(e._1, e._2))
        .toSet
      val labels = s.createDataset(
        vertices.toSeq.map(v => (v, find(v)))).toDF("doc_id", "label")
      return (labels, () => ())
    }
    val adj = adjIn.persist()
    // `gen` tracks the PERSISTED handle of the current generation (a
    // derived select's unpersist would be a no-op on the parent cache)
    var gen = adj.select($"src".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("label")).persist()
    var labels = gen
    var converged = false
    while (!converged) {
      val neighborMin = adj.toDF("src", "dst")
        .join(labels.toDF("dst", "dstLabel"), "dst")
        .groupBy($"src").agg(min($"dstLabel").as("nmin"))
        .toDF("doc_id", "nmin")
      // ONE action per iteration: the convergence flag rides along and
      // its count also materializes the persisted next generation
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select($"doc_id",
          least($"label", coalesce($"nmin", $"label")).as("label"),
          coalesce($"nmin" < $"label", lit(false)).as("changed"))
        .persist()
      val changed = next.filter($"changed").count()
      gen.unpersist()
      gen = next
      labels = next.select($"doc_id", $"label") // reads the cached next
      converged = changed == 0
    }
    val genFinal = gen
    (labels, () => { genFinal.unpersist(); adj.unpersist(); () })
  }

  /** Shared reachability pipeline of the cluster oracles: near-dup
    * pairs → symmetric edges → recursive-CTE transitive closure →
    * min-label per doc (equals the propagation fixpoint).
    */
  /** Oracle twin of [[dupPairs]] + the symmetric `edges` CTE — the
    * shared prefix of every dup-graph oracle (cluster closure,
    * PageRank).
    */
  private def dupEdgesSql: String = dupEdgesSqlWhere("TRUE")

  private def dupEdgesSqlWhere(pred: String): String =
    s"""docs AS (${shingledSqlWhere(pred)}),
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
       |pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM cand
       |  JOIN docs da ON da.doc_id = doc_a
       |  JOIN docs db ON db.doc_id = doc_b
       |  WHERE ${jaccardSql("da.sh", "db.sh")} >= 0.3),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs)""".stripMargin

  private def clusterLabelsSql: String = clusterLabelsSqlWhere("TRUE")

  private def clusterLabelsSqlWhere(pred: String): String =
    s"""${dupEdgesSqlWhere(pred)},
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION SELECT a, a FROM edges
       |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |labels AS (
       |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)""".stripMargin

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
      graft.functions.GraftFunctions.register(s)
      val docs = sharedShingles(s, dir)
      // the build-once LSH index; both candidate-join sides consume it
      val bands = sharedBands(s, dir)
      val cand = bandCandidates(bands, Seq("band", "bh"))
      cand
        .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sa")), "doc_a")
        .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sb")), "doc_b")
        .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
        .withColumn("jaccard", $"nc".cast("double") /
          (size($"sa") + size($"sb") - $"nc").cast("double"))
        .filter($"jaccard" >= 0.3)
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    },

    // --- LSH quality audit: banding recall/precision vs exact truth ------
    // Every production dedup pipeline needs to KNOW its LSH miss rate,
    // not assume it: ground truth is the exact all-pairs Jaccard over
    // a BOUNDED audit scope, compared against the band-collision
    // candidates over that same scope. The all-pairs join is the POINT
    // of the audit and is the deliberate exception to the no-all-pairs
    // rule — bounded ABSOLUTELY (`AuditScope` docs by deterministic
    // id predicate, ~500k pairs), so the audit costs the same at sf0.1
    // as at 100 TB; the per-pair verify is the codegen'd two-pointer
    // intersect, and the streamed side is repartitioned so the audit
    // parallelizes instead of running as one broadcast-loop task.
    // Output: one row of counts + ppm recall (truth pairs the bands
    // caught) and ppm precision (candidates that are true pairs — the
    // verify stage's workload efficiency).
    "llm_dedup_eval" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // the exact all-pairs GROUND TRUTH is an audit fixture of the
      // corpus state, not part of the evaluated pipeline — build once
      // per corpus (cost in the bench `artifacts` field), re-audit many.
      // The audit-scope shingle table exists only to feed this build,
      // so it materializes inside it — a re-audit pays zero scope IO.
      val truth = IndexArtifacts.cached(s, dir, "eval-truth",
          inputs = Seq(s"$dir/documents.parquet")) { out =>
        val docs = IndexArtifacts.materialize(s,
          sharedShingles(s, dir).filter($"doc_id" < AuditScope), "eval-scope")
        val streamSide = docs.select($"doc_id".as("doc_a"), $"sh".as("sa"))
          .repartition(s.sparkContext.defaultParallelism)
        streamSide
          .join(broadcast(docs.select($"doc_id".as("doc_b"), $"sh".as("sb"))),
            col("doc_a") < col("doc_b"))
          .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
          .filter(($"nc".cast("double") /
            (size($"sa") + size($"sb") - $"nc").cast("double")) >= 0.3)
          .select($"doc_a", $"doc_b")
          .write.parquet(out)
      }
      // per-doc band rows depend only on that doc's shingles, so the
      // audit scope's band table IS the shared index filtered to it
      val cand = IndexArtifacts.cachedIndex(s, dir, "eval-cand",
        Seq(s"$dir/documents.parquet"))(
        bandCandidates(sharedBands(s, dir).filter($"doc_id" < AuditScope),
          Seq("band", "bh")))
      val hit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select($"n_true", $"n_cand", $"n_hit",
          expr("(1000000 * n_hit) div n_true").as("recall_ppm"),
          expr("(1000000 * n_hit) div n_cand").as("precision_ppm"))
    },

    // --- SimHash near-dedup (banded Hamming) ----------------------------
    "llm_simhash" -> { (s, dir) =>
      import s.implicits._
      val tok = sharedShingles(s, dir)
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
      // built once per corpus for the same reason as the MinHash band
      // table: the self-join would otherwise recompute the 32-sum
      // signature per side (and every invocation would rebuild it)
      val bands = IndexArtifacts.cachedIndex(s, dir, "simhash-bands",
        Seq(s"$dir/documents.parquet"))(simhash
        .select($"doc_id", $"simhash", explode(array(bandCols: _*)).as("s"))
        .select($"doc_id", $"simhash", col("s.band").as("band"), col("s.bb").as("bb")))
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
    // Each document becomes a VDim-dim COUNT vector by feature hashing
    // its shingles (h mod VDim); near-dups are pairs whose CENTERED
    // vectors (d_i = VDim·c_i − Σc) have cosine >= 0.8. Centering
    // matters: raw count vectors all sit in the positive orthant, so
    // raw cosine between unrelated docs has a ~0.75 baseline and a
    // threshold over it mostly surfaces noise; centered cosine of
    // unrelated fixture docs maxes ~0.6 while true near-dups sit at
    // 0.95+ — a clean separation. Candidate generation reuses the
    // MinHash band index over the same shingles (the llm_minhash_lsh
    // shape): a (band, bh) equi-join, NEVER all-pairs — shingle-banded
    // candidates are strictly sharper here than hyperplane signs
    // because the count vector is itself derived from the shingles
    // (for real learned embeddings, llm_embed_lsh_ann's hyperplane
    // bucketing is the template). All counts/dots/norms² are exact
    // 64-bit integers; the only floating point is the final
    // sqrt+divide, identical in both engines.
    "llm_vector_neardup" -> { (s, dir) =>
      import s.implicits._
      // the shared (doc_id, sh) table feeds the band index AND the
      // candidate count vectors
      val docs = sharedShingles(s, dir)
      val bands = sharedBands(s, dir)
      // lazy on purpose: both consumers re-run the cheap band equi-join
      // over the materialized bands scan, keeping the banded candidate
      // shape visible in (and asserted on) this query's physical plan
      val cand = bandCandidates(bands, Seq("band", "bh"))
      // the count-vector aggregate only matters for candidate docs — a
      // broadcast semi-join restricts the 33-column groupBy to that
      // tiny set instead of vectorizing the whole corpus (the shape
      // that matters at 100 TB; at bench scale variants are within
      // run-to-run noise)
      val candIds = cand
        .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
      val tok = docs.join(broadcast(candIds), "doc_id")
        .select($"doc_id", explode($"sh").as("h0"))
        .withColumn("d", pmod($"h0", lit(VDim.toLong)))
      val counts = (0 until VDim).map(i =>
        sum(when($"d" === i, 1L).otherwise(0L)).as(s"c$i"))
      val v = tok.groupBy($"doc_id")
        .agg(counts.head, (counts.tail :+ count(lit(1)).as("tot")): _*)
        .withColumn("n2c", lit(VDim.toLong * VDim) *
          (0 until VDim).map(i => col(s"c$i") * col(s"c$i")).reduce(_ + _) -
          lit(VDim.toLong) * $"tot" * $"tot")
      // v NOT persisted: measured slower through the 33-column columnar
      // cache than recomputing the groupBy from the cached (doc_id, sh)
      // centered dot: Σ(VDim·cx_i − tx)(VDim·cy_i − ty)
      //             = VDim²·Σ cx_i·cy_i − VDim·tx·ty   (exact integers)
      val dotC = lit(VDim.toLong * VDim) *
        (0 until VDim).map(i => col(s"x.c$i") * col(s"y.c$i")).reduce(_ + _) -
        lit(VDim.toLong) * col("x.tot") * col("y.tot")
      cand
        .join(v.as("x"), col("x.doc_id") === cand("doc_a"))
        .join(v.as("y"), col("y.doc_id") === cand("doc_b"))
        .withColumn("cosine", dotC.cast("double") /
          (sqrt(col("x.n2c").cast("double")) * sqrt(col("y.n2c").cast("double"))))
        .filter($"cosine" >= 0.8)
        .select($"doc_a", $"doc_b", $"cosine")
        .orderBy($"doc_a", $"doc_b")
    },

    // --- near-dup cluster resolution (connected components) -------------
    // The pipeline stage AFTER pair generation: near-dup pairs form a
    // graph; each connected component is one duplicate family and the
    // member with the smallest doc_id is kept as canonical. Computed by
    // MIN-LABEL PROPAGATION — the standard distributed connected-
    // components loop: every vertex starts labeled with its own id and
    // repeatedly takes the min over its neighborhood until fixpoint.
    // Scale shape: one bucketed equi-join + partial-aggregated groupBy
    // per iteration, iterations bounded by component DIAMETER (near-dup
    // families are tiny cliques, so 1-2 rounds); the driver only
    // checks the convergence count, rows never leave the cluster.
    "llm_dedup_clusters" -> { (s, dir) =>
      import s.implicits._
      clusterLabels(s, dir)
        .select($"doc_id", $"label".as("cluster_id"),
          ($"doc_id" === $"label").as("keep"))
        .orderBy($"doc_id")
    },

    // --- PageRank centrality over the near-dup graph ---------------------
    // Which document in a duplicate family is the REPRESENTATIVE? The
    // min-id rule (llm_dedup_clusters) is arbitrary; PageRank over the
    // near-dup edges ranks docs by how centrally duplicated they are —
    // a hub copied by many variants outranks a leaf variant, so
    // "keep the most central" becomes a principled canonical-selection
    // policy. Shape: each of the PrIters unrolled iterations is one
    // edge-table join + keyed partial agg — the edge table (the shared
    // dup-pairs artifact) is what shuffles, never the corpus. All
    // arithmetic is exact int64 (score DIV degree contributions,
    // damping as (15·S + 85·Σ) DIV 100), so both engines agree bitwise
    // with no float-order concerns.
    "llm_dup_pagerank" -> { (s, dir) =>
      import s.implicits._
      val pairs = dupPairs(s, dir)
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      var score = deg.select($"src".as("doc_id"), lit(PrScale).as("score"))
      for (_ <- 1 to PrIters) {
        val contrib = edges
          .join(deg, "src")
          .join(score.withColumnRenamed("doc_id", "src"), "src")
          .select($"dst", expr("score div deg").as("c"))
          .groupBy($"dst").agg(sum($"c").as("contrib"))
        score = contrib.select($"dst".as("doc_id"),
          expr(s"(15 * ${PrScale}L + 85 * contrib) div 100").as("score"))
      }
      deg.select($"src".as("doc_id"), $"deg")
        .join(score, "doc_id")
        .select($"doc_id", $"deg", $"score".as("pagerank"))
        .orderBy($"doc_id")
    },

    // --- triangle count / local clustering coefficient -------------------
    // How CLIQUE-LIKE is each duplicate neighborhood? A doc whose
    // near-dup neighbors are also near-dups of EACH OTHER (high local
    // clustering coefficient) sits inside a tight copy family; a doc
    // bridging otherwise-unrelated neighbors (low cc despite high
    // degree) is a template/boilerplate hub — a different curation
    // action (strip the template) than a copy family (pick one).
    // Shape: the standard degree-oriented enumeration — orient every
    // edge from its lexicographically smaller ((deg, id)) endpoint, so
    // every vertex's out-degree is bounded by O(sqrt(|E|)) regardless
    // of hubs; wedges are a self-equi-join of the oriented edge table
    // on the source vertex, closed by a semi-join back against
    // oriented edges. Each triangle {x<y<z by (deg,id)} is produced
    // exactly once, at its minimum vertex. Only the (bounded) edge
    // table shuffles, never the corpus, and the orientation is exactly
    // what keeps a 10M-degree hub from exploding the wedge join at
    // 100 TB. All counts exact int64; cc_ppm = 2·tri·1e6 DIV deg(deg−1).
    "llm_dup_triangles" -> { (s, dir) =>
      import s.implicits._
      val pairs = dupPairs(s, dir)
      val deg = pairs.select($"doc_a".as("doc_id"))
        .union(pairs.select($"doc_b".as("doc_id")))
        .groupBy($"doc_id").agg(count(lit(1)).as("deg"))
      // orient: u = smaller (deg, id) endpoint; carry the head's key
      // so the wedge join can order its two heads without a re-join
      val oriented = pairs
        .join(deg.select($"doc_id".as("doc_a"), $"deg".as("da")), "doc_a")
        .join(deg.select($"doc_id".as("doc_b"), $"deg".as("db")), "doc_b")
        .select(when($"da" < $"db" || ($"da" === $"db" && $"doc_a" < $"doc_b"),
            struct($"doc_a".as("u"), $"doc_b".as("v"), $"db".as("dv")))
          .otherwise(
            struct($"doc_b".as("u"), $"doc_a".as("v"), $"da".as("dv"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.u") === col("e2.u") &&
            (col("e1.dv") < col("e2.dv") ||
              (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
        .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      val triangles = wedges.join(
        oriented.select($"u".as("y"), $"v".as("z")), Seq("y", "z"), "left_semi")
      val triCounts = triangles
        .select(explode(array($"x", $"y", $"z")).as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_tri"))
      deg.join(triCounts, Seq("doc_id"), "left")
        .select($"doc_id", $"deg",
          coalesce($"n_tri", lit(0L)).as("n_tri"),
          when($"deg" >= 2,
            expr("2 * coalesce(n_tri, 0L) * 1000000L div (deg * (deg - 1))"))
            .otherwise(lit(0L)).as("cc_ppm"))
        .orderBy($"doc_id")
    },

    // --- repetition-aware loss weighting ---------------------------------
    // The soft alternative to dropping duplicates: keep every copy but
    // weight each document by 1/family_size so a duplicate family
    // contributes ONE document's worth of gradient in aggregate
    // (near-dup-aware example weighting). Exact integer ppm weights
    // (1e6 DIV family_size); singleton docs weigh exactly 1e6. Rides
    // the shared label artifact: one |families| partial agg + one
    // left join — free once labels exist, and at 100 TB the weight
    // column ships with the corpus instead of a destructive drop.
    "llm_dup_weights" -> { (s, dir) =>
      import s.implicits._
      val sizes = clusterLabels(s, dir)
        .groupBy($"label").agg(count(lit(1)).as("family_size"))
      Tables(s, dir).documents.select($"doc_id")
        .join(clusterLabels(s, dir), Seq("doc_id"), "left")
        .join(sizes, Seq("label"), "left")
        .select($"doc_id",
          coalesce($"family_size", lit(1L)).as("family_size"),
          expr("1000000L div coalesce(family_size, 1L)").as("weight_ppm"))
        .orderBy($"doc_id")
    },

    // --- per-source dataset-card report ----------------------------------
    // The one-row-per-source summary a curation pipeline ships with its
    // output: volume (docs, whitespace tokens), near-dup exposure (docs
    // in a dup family, non-canonical docs), and the duplicate ratio —
    // all exact ints plus ONE division. Composes the shared label
    // artifact with a token-count scan: one groupBy each, joined on the
    // bounded source key.
    "llm_source_report" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", $"source", size(tokens($"text")).as("n_toks"))
      val dups = docs.select($"doc_id", $"source")
        .join(clusterLabels(s, dir), Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(sum(when($"label".isNotNull, 1L).otherwise(0L)).as("n_in_family"),
          sum(when($"label".isNotNull && $"label" =!= $"doc_id", 1L)
            .otherwise(0L)).as("n_dup"))
      docs.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_toks").cast("long").as("n_tokens"))
        .join(dups, Seq("source"))
        .withColumn("dup_ratio", $"n_dup".cast("double") / $"n_docs".cast("double"))
        .select($"source", $"n_docs", $"n_tokens", $"n_in_family",
          $"n_dup", $"dup_ratio")
        .orderBy($"source")
    },

    // --- dedup report: duplicate-family size histogram -------------------
    // The audit summary every dedup run ships with: how many families
    // of each size the corpus contains (family = connected near-dup
    // cluster). Two partial-agg groupBys over the shared label
    // artifact — the report is free once the labels exist.
    "llm_dedup_stats" -> { (s, dir) =>
      import s.implicits._
      clusterLabels(s, dir)
        .groupBy($"label").agg(count(lit(1)).as("family_size"))
        .groupBy($"family_size").agg(count(lit(1)).as("n_families"))
        .orderBy($"family_size")
    },

    // --- cross-source duplication matrix ---------------------------------
    // Corpus forensics the per-source exposure report can't answer:
    // WHICH sources share near-duplicate content with which (mirror
    // sites, syndication, scraped re-posts)? Verified near-dup pairs
    // (the shared dup-pairs artifact) join their endpoints' source
    // labels; the unordered source pair normalizes by name. Scale
    // shape: the near-dup-rate-sized edge table is what shuffles
    // (keyed on doc_id), never the corpus; output ≤ |sources|² rows.
    "llm_dup_sources" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents.select($"doc_id", $"source")
      dupPairs(s, dir)
        .join(docs.select($"doc_id".as("doc_a"), $"source".as("source_a")),
          "doc_a")
        .join(docs.select($"doc_id".as("doc_b"), $"source".as("source_b")),
          "doc_b")
        .select(least($"source_a", $"source_b").as("src_lo"),
          greatest($"source_a", $"source_b").as("src_hi"))
        .groupBy($"src_lo", $"src_hi")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"src_lo", $"src_hi")
    },

    // --- LSH band-skew diagnosis (the candidate-explosion guard) --------
    // The practical LSH killer at 100 TB is a HOT BUCKET: boilerplate
    // shingle sets collapse thousands of docs into one (band, bh)
    // bucket and the candidate equi-join goes quadratic INSIDE it
    // (Σ C(B,2) per bucket). This report prices that risk before it
    // bites — per band: bucket count, the largest bucket, and the
    // exact candidate-pair cost the band contributes — the same
    // measure-then-decide role q31_skew_report plays for joins (the
    // remedies differ: cap/drop hot buckets as stop-shingles, or shard
    // them). Two keyed partial aggregates over the band index; the
    // report is |bands| rows at any corpus size.
    "llm_band_skew" -> { (s, dir) =>
      import s.implicits._
      val bands = sharedBands(s, dir)
      bands.groupBy($"band", $"bh").agg(count(lit(1)).as("b"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_buckets"),
          max($"b").as("max_bucket"),
          sum(expr("b * (b - 1) DIV 2")).as("candidate_pairs"))
        .orderBy($"band")
    },

    // --- the mitigation llm_band_skew prices: capped candidates ---------
    // Candidate pairs under the hot-bucket cap (bandCandidatesCapped):
    // buckets ≤ BandCap expand fully, larger buckets contribute their
    // id-sorted chain only — per-bucket cost drops C(B,2) → B−1 while
    // bucket connectivity (what clustering consumes) is preserved. At
    // fixture scale the cap is set low (2) so both code paths carry
    // rows; the output is the capped candidate edge list itself.
    "llm_band_cap" -> { (s, dir) =>
      import s.implicits._
      val bands = sharedBands(s, dir)
      bandCandidatesCapped(bands, BandCap)
        .orderBy($"doc_a", $"doc_b")
    },

    // --- contrastive training triplets off the dedup pipeline -----------
    // (anchor, positive, hard negative) triplets for training retrieval
    // /embedding models, mined ENTIRELY from structures the pipeline
    // already has: the positive is the anchor's min-id verified
    // near-dup partner (the edge artifact), and the hard negative is a
    // BANDED CANDIDATE THAT FAILED VERIFICATION and sits in a different
    // dedup cluster — a document the LSH index found surface-similar
    // but that is provably not a near-dup, exactly the "hard" part of
    // a hard negative (cluster membership, not just pair failure,
    // screens transitive near-dups out). Everything is keyed joins off
    // the band index + edge artifact — never all-pairs — and the
    // min-id picks make the triplets deterministic.
    "llm_contrastive_triplets" -> { (s, dir) =>
      import s.implicits._
      val pairs = dupPairs(s, dir)
      val lab = clusterLabels(s, dir)
      val sym = pairs.select($"doc_a".as("anchor"), $"doc_b".as("p"))
        .unionByName(pairs.select($"doc_b".as("anchor"), $"doc_a".as("p")))
      val pos = sym.groupBy($"anchor").agg(min($"p").as("positive"))
      val cand = bandCandidates(sharedBands(s, dir), Seq("band", "bh"))
      val candSym = cand.select($"doc_a".as("anchor"), $"doc_b".as("c"))
        .unionByName(cand.select($"doc_b".as("anchor"), $"doc_a".as("c")))
      val neg = candSym
        .join(lab.select($"doc_id".as("anchor"), $"label".as("la")),
          Seq("anchor"), "left")
        .join(lab.select($"doc_id".as("c"), $"label".as("lc")), Seq("c"), "left")
        .filter(coalesce($"la", $"anchor") =!= coalesce($"lc", $"c"))
        .groupBy($"anchor").agg(min($"c").as("negative"))
      pos.join(neg, Seq("anchor"), "left")
        .select($"anchor", $"positive", $"negative")
        .orderBy($"anchor")
    },

    // --- deterministic stratified sampling (data mixing) ----------------
    // Per-(source, lang) stratum subsample at a fixed rate, selected by
    // an md5-derived hash of the doc id — reproducible across runs and
    // engines, zero shuffle beyond the summary aggregate. The per-doc
    // decision is the operator; the query reports per-stratum totals so
    // the oracle is compact at any corpus size.
    "llm_stratified_sample" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .groupBy($"source", $"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(hash32(concat(lit("sample:"), $"doc_id".cast("string")))
              % 100 < 10, 1L).otherwise(0L)).as("n_sampled"))
        .orderBy($"source", $"lang")
    },

    // --- leakage-safe train/test split ----------------------------------
    // Contamination-safe splitting: the split UNIT is the near-dup
    // CLUSTER (falling back to the doc itself), so near-duplicate
    // documents can never straddle train and test — the property plain
    // per-doc hash splitting silently violates. Unit assignment is the
    // same deterministic md5 hash in both engines.
    "llm_split_leakage_safe" -> { (s, dir) =>
      import s.implicits._
      val labels = clusterLabels(s, dir)
        .select($"doc_id", $"label".as("cluster_id"))
      Tables(s, dir).documents.select($"doc_id")
        .join(labels, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("unit"))
        .withColumn("split",
          when(hash32(concat(lit("split:"), $"unit".cast("string")))
            % 100 < 90, "train").otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"unit").as("n_units"))
        .orderBy($"split")
    },

    // --- corpus curation composite --------------------------------------
    // The end-to-end filter a training-data pipeline applies before
    // tokenization, composed from the primitives above: length gate →
    // lexical-diversity gate (type-token ratio) → stopword-density gate
    // (drops non-natural-language text) → near-dup canonicalization
    // (only the cluster minimum survives). Every doc gets a verdict
    // with its FIRST failing rule, so rejection reasons are auditable.
    // One scan + the cluster-label join — no new shuffle shapes.
    "llm_corpus_filter" -> { (s, dir) =>
      import s.implicits._
      val labels = clusterLabels(s, dir)
      val t = tokens($"text")
      val stats = Tables(s, dir).documents
        .select($"doc_id",
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_distinct"),
          size(filter(t, c =>
            c.isin(TextAnalysisQueries.stopwords.map(lit): _*))).as("n_stop"))
        .withColumn("ttr", $"n_distinct".cast("double") / $"n_tokens")
        .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_tokens")
      stats.join(labels, Seq("doc_id"), "left")
        .withColumn("reason",
          when($"n_tokens" < 40, "short")
            .when($"ttr" < 0.35, "low_ttr")
            .when($"stop_ratio" < 0.02, "low_stopword")
            .when($"label".isNotNull && $"label" =!= $"doc_id", "duplicate")
            .otherwise("ok"))
        .select($"doc_id", $"reason", ($"reason" === "ok").as("kept"))
        .orderBy($"doc_id")
    },

    // --- incremental cluster maintenance (batch-checkable form) ---------
    // The streaming twin ([[IncrementalClusters]]) driven as a batch
    // query: the corpus feeds a COLD state dir in two micro-batches, so
    // batch-2 docs join/merge batch-1 clusters through the persisted
    // band index alone. Final labels provably equal the one-shot batch
    // pipeline (candidate coverage over the union corpus is complete —
    // see IncrementalClusters' scaladoc), so the oracle is the same
    // recursive-CTE closure as llm_dedup_clusters. Bench note: wall
    // time is FIXED per-micro-batch multi-job scheduling latency ×2
    // batches (materialize + candidate join + propagation rounds +
    // replica MERGE ≈ a dozen driver-scheduled jobs each, at any sf) —
    // at scale the per-batch cost rides the batch's neighborhood, not
    // the corpus.
    "llm_cluster_inc" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents.select($"doc_id", $"text")
      // the batch-1 bulk load is SETUP (the initial index build, the
      // same pipeline cluster-labels already prices); the operator
      // under test is the INCREMENTAL batch-2 update, so batch 1 is a
      // build-once artifact and each run updates a file copy of it —
      // per-batch cost rides the batch's neighborhood, which is the
      // operator's 100 TB contract
      val base = clusterIncBase(s, dir, docs)
      val state = IndexArtifacts.tempDir("cluster-inc-state")
      copyRec(new java.io.File(base), new java.io.File(state))
      IncrementalClusters.update(s, state, docs.filter($"doc_id" % 3 === 0))
      IncrementalClusters.labels(s, state)
        .select($"doc_id", $"label".as("cluster_id"),
          ($"doc_id" === $"label").as("keep"))
        .orderBy($"doc_id")
    },

    // --- incremental cluster maintenance under RETIREMENT ----------------
    // The forgetting half of the cycle: build the index in two
    // micro-batches, then retire every doc_id % 7 == 0 (content
    // changed / takedown). Only components containing a retired doc
    // recompute, from the persisted edge table; the final labels must
    // equal a from-scratch closure over the REMAINING corpus — which
    // is exactly what the oracle computes (the same recursive CTE as
    // llm_dedup_clusters with the retired docs filtered out of the
    // corpus). Bridge removals split components; edge-less leftovers
    // tombstone out of the label store.
    "llm_cluster_retire" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents.select($"doc_id", $"text")
      // the two-batch index build is SETUP, not the operator under
      // test: build it once as an artifact (on top of the shared
      // batch-1 base) and retire against a file copy (retire mutates),
      // so the timed work is retirement itself
      val built = IndexArtifacts.cachedPath(dir, "cluster-full-state",
        inputs = Seq(s"$dir/documents.parquet")) { out =>
        copyRec(new java.io.File(clusterIncBase(s, dir, docs)),
          new java.io.File(out))
        IncrementalClusters.update(s, out, docs.filter($"doc_id" % 3 === 0))
      }
      val state = IndexArtifacts.tempDir("cluster-retire-state")
      copyRec(new java.io.File(built), new java.io.File(state))
      IncrementalClusters.retire(s, state,
        docs.filter($"doc_id" % 7 === 0).select($"doc_id"))
      IncrementalClusters.labels(s, state)
        .select($"doc_id", $"label".as("cluster_id"),
          ($"doc_id" === $"label").as("keep"))
        .orderBy($"doc_id")
    },

    // --- n-gram (trigram) Jaccard near-dedup ----------------------------
    // TRIGRAM shingles (vs the bigram llm_minhash_lsh): trigram Jaccard
    // between unrelated fixture docs maxes ~0.04 (bigram noise reaches
    // ~0.2), so the 0.1 threshold sits cleanly ABOVE noise — a banded
    // candidate stage loses nothing. Candidates come from a MinHash
    // band index over the trigram shingles (the llm_minhash_lsh
    // shape): a (band, bh) equi-join, never all-pairs. Shingles are
    // hashed to longs and SORTED once per document; the per-candidate
    // work is a codegen'd two-pointer merge count
    // (graft.functions.SortedIntersectCount) — zero allocation on the
    // verify hot path, the shape that survives 100×.
    "llm_ngram_jaccard" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // the trigram variant of the shared index — its own build-once
      // artifacts (different shingle alphabet than the bigram base)
      val d = IndexArtifacts.cached(s, dir, "trigram-shingles",
          inputs = Seq(s"$dir/documents.parquet")) { out =>
        Tables(s, dir).documents
          .select($"doc_id", hashedNgrams($"text", 3).as("sh"))
          .filter(size($"sh") > 0).write.parquet(out)
      }
      val bands = IndexArtifacts.cached(s, dir, "trigram-bands",
          inputs = Seq(s"$dir/documents.parquet")) { out =>
        minhashBands(d).write.parquet(out)
      }
      val cand = bandCandidates(bands, Seq("band", "bh"))
      cand
        .join(d.as("x"), col("x.doc_id") === cand("doc_a"))
        .join(d.as("y"), col("y.doc_id") === cand("doc_b"))
        .withColumn("n_common", expr("sorted_intersect_count(x.sh, y.sh)"))
        .select($"doc_a", $"doc_b", $"n_common",
          ($"n_common".cast("double") /
            (size(col("x.sh")) + size(col("y.sh")) - $"n_common")).as("jaccard"))
        .filter($"jaccard" >= 0.1)
        .orderBy($"doc_a", $"doc_b")
    },

    // --- MinHash estimator accuracy audit --------------------------------
    // The companion of llm_dedup_eval: that one measures the BANDING's
    // recall, this one measures the SKETCH's error — per banded
    // candidate pair, the signature-agreement estimate (matching
    // components / NumHashes, the unbiased MinHash Jaccard estimator)
    // next to the exact two-pointer Jaccard. The audit that tells you
    // whether 16 permutations suffice BEFORE you trust sketch-only
    // dedup at full scale; at 100 TB it rides the same bounded
    // candidate set as the verify stage — signature columns are 16
    // longs/doc, the estimate is expression work.
    "llm_minhash_est" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val docs = sharedShingles(s, dir)
      val sig = sharedSig(s, dir)
      val cand = bandCandidates(sharedBands(s, dir), Seq("band", "bh"))
      val sigA = sig.select(($"doc_id".as("doc_a") +:
        (0 until NumHashes).map(i => col(s"m$i").as(s"a$i"))): _*)
      val sigB = sig.select(($"doc_id".as("doc_b") +:
        (0 until NumHashes).map(i => col(s"m$i").as(s"b$i"))): _*)
      val nEq = (0 until NumHashes).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
      cand
        .join(sigA, "doc_a").join(sigB, "doc_b")
        .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sa")), "doc_a")
        .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sb")), "doc_b")
        .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
        .select($"doc_a", $"doc_b",
          nEq.as("n_eq"),
          (nEq.cast("double") / lit(NumHashes.toDouble)).as("est_jaccard"),
          ($"nc".cast("double") /
            (size($"sa") + size($"sb") - $"nc").cast("double")).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
    },

    // --- MinHash UDAF signature audit (r10) ------------------------------
    // Gates [[MinHashAggregator]] — the Dataset-typed Aggregator twin
    // of the SQL signature — bit-exactly: every document's full k=16
    // signature must equal the oracle's min((a_i·h + b_i) mod P) per
    // permutation. Exercises the UDAF's reduce AND its distributed
    // partial+final merge path (elementwise min across partitions);
    // all values exact integers, no float anywhere.
    "llm_minhash_udaf" -> { (s, dir) =>
      import s.implicits._
      val mh = udaf(new MinHashAggregator(),
        org.apache.spark.sql.Encoders.scalaLong)
      shingled(s, dir)
        .select($"doc_id", explode($"sh").as("h0"))
        .groupBy($"doc_id").agg(mh($"h0").as("sig"))
        .select(($"doc_id" +: (0 until NumHashes).map(i =>
          $"sig".getItem(i).as(s"m$i"))): _*)
        .orderBy($"doc_id")
    },

    // --- asymmetric containment near-dedup -------------------------------
    // The subset-duplication detector Jaccard under-weights: containment
    // C(A→B) = |A∩B| / |A| is ~1 when doc A is embedded inside a much
    // larger doc B even though Jaccard ≈ |A|/|B| is tiny — the common
    // shape of quote-expansion and boilerplate-wrapped reposts in a
    // training corpus. Same banded candidates and codegen'd two-pointer
    // intersect as the Jaccard verify; both directions emitted, gated
    // on the larger one. KNOWN LSH bias, stated not hidden: MinHash
    // bands recall by JACCARD, so a high-containment/low-Jaccard pair
    // needs |A|≈|B| or extra band rows to surface — at 100 TB a
    // containment-complete pipeline adds a suffix/winnow fingerprint
    // index (llm_winnow_fingerprint is that index here).
    "llm_containment" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val d = sharedShingles(s, dir)
      val bands = sharedBands(s, dir)
      val cand = bandCandidates(bands, Seq("band", "bh"))
      cand
        .join(d.as("x"), col("x.doc_id") === cand("doc_a"))
        .join(d.as("y"), col("y.doc_id") === cand("doc_b"))
        .withColumn("n_common", expr("sorted_intersect_count(x.sh, y.sh)"))
        .select($"doc_a", $"doc_b", $"n_common",
          ($"n_common".cast("double") / size(col("x.sh")).cast("double"))
            .as("cont_a"),
          ($"n_common".cast("double") / size(col("y.sh")).cast("double"))
            .as("cont_b"))
        .filter(greatest($"cont_a", $"cont_b") >= 0.3)
        .orderBy($"doc_a", $"doc_b")
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

    "llm_dedup_eval" ->
      s"""WITH docs AS (
         |  SELECT * FROM ($shingledSql) WHERE doc_id < $AuditScope),
         |truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |  WHERE ${jaccardSql("a.sh", "b.sh")} >= 0.3),
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
         |h AS (
         |  SELECT count(*) AS n_hit FROM truth t
         |  JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
         |SELECT n_true, n_cand, n_hit,
         |  (1000000 * n_hit) // n_true AS recall_ppm,
         |  (1000000 * n_hit) // n_cand AS precision_ppm
         |FROM (SELECT count(*) AS n_true FROM truth),
         |     (SELECT count(*) AS n_cand FROM cand), h""".stripMargin,

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

    // same candidate+verify pipeline as llm_minhash_lsh, then full
    // reachability via a recursive CTE — min over the transitive
    // closure equals the label-propagation fixpoint
    "llm_dedup_clusters" ->
      s"""WITH RECURSIVE $clusterLabelsSql
         |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
         |FROM labels ORDER BY 1""".stripMargin,

    // same verified-pair pipeline, then PrIters unrolled exact-integer
    // power iterations — mirrors the Spark recurrence literally
    "llm_dup_pagerank" -> {
      val iters = (1 to PrIters).map { i =>
        s"""c$i AS (
           |  SELECT e.b AS doc_id,
           |    CAST(sum(s.score // d.deg) AS BIGINT) AS contrib
           |  FROM edges e
           |  JOIN deg d ON d.doc_id = e.a
           |  JOIN s${i - 1} s ON s.doc_id = e.a
           |  GROUP BY e.b),
           |s$i AS (
           |  SELECT doc_id, (15 * $PrScale + 85 * contrib) // 100 AS score
           |  FROM c$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH $dupEdgesSql,
         |deg AS (
         |  SELECT a AS doc_id, count(*) AS deg FROM edges GROUP BY a),
         |s0 AS (
         |  SELECT doc_id, CAST($PrScale AS BIGINT) AS score FROM deg),
         |$iters
         |SELECT d.doc_id, d.deg, s.score AS pagerank
         |FROM deg d JOIN s$PrIters s ON s.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // unordered source pair over the verified pair table — the same
    // pairs CTE every dup-graph oracle shares
    "llm_dup_sources" ->
      s"""WITH $dupEdgesSql,
         |m AS (
         |  SELECT least(da.source, db.source) AS src_lo,
         |         greatest(da.source, db.source) AS src_hi
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.doc_a
         |  JOIN documents db ON db.doc_id = p.doc_b)
         |SELECT src_lo, src_hi, count(*) AS n_pairs
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "llm_band_skew" ->
      s"""WITH docs AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM docs)),
         |$minhashSigSql,
         |bands AS (
         |  $minhashBandsSql),
         |bsz AS (SELECT band, bh, count(*) AS b FROM bands GROUP BY 1, 2)
         |SELECT band, count(*) AS n_buckets, CAST(max(b) AS BIGINT) AS max_bucket,
         |  CAST(sum(b * (b - 1) // 2) AS BIGINT) AS candidate_pairs
         |FROM bsz GROUP BY band ORDER BY band""".stripMargin,

    // full pairs from buckets ≤ cap, id-sorted adjacent chain from
    // buckets > cap — the window formulation mirrors the Spark lead()
    "llm_band_cap" ->
      s"""WITH docs AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM docs)),
         |$minhashSigSql,
         |bands AS (
         |  $minhashBandsSql),
         |sized AS (
         |  SELECT doc_id, band, bh,
         |    count(*) OVER (PARTITION BY band, bh) AS bsz
         |  FROM bands),
         |full_pairs AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM sized x JOIN sized y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
         |  WHERE x.bsz <= $BandCap),
         |chain AS (
         |  SELECT doc_id AS doc_a,
         |    lead(doc_id) OVER (PARTITION BY band, bh ORDER BY doc_id) AS doc_b
         |  FROM sized WHERE bsz > $BandCap)
         |SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT * FROM full_pairs
         |  UNION ALL SELECT * FROM chain WHERE doc_b IS NOT NULL)
         |ORDER BY 1, 2""".stripMargin,

    "llm_contrastive_triplets" ->
      s"""WITH RECURSIVE $clusterLabelsSql,
         |sym AS (
         |  SELECT doc_a AS anchor, doc_b AS p FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |pos AS (SELECT anchor, min(p) AS positive FROM sym GROUP BY anchor),
         |candsym AS (
         |  SELECT doc_a AS anchor, doc_b AS c FROM cand
         |  UNION ALL SELECT doc_b, doc_a FROM cand),
         |neg AS (
         |  SELECT cs.anchor, min(cs.c) AS negative
         |  FROM candsym cs
         |  LEFT JOIN labels la ON la.doc_id = cs.anchor
         |  LEFT JOIN labels lc ON lc.doc_id = cs.c
         |  WHERE COALESCE(la.cluster_id, cs.anchor)
         |     <> COALESCE(lc.cluster_id, cs.c)
         |  GROUP BY cs.anchor)
         |SELECT p.anchor, p.positive, n.negative
         |FROM pos p LEFT JOIN neg n ON p.anchor = n.anchor
         |ORDER BY 1""".stripMargin,

    // canonical a<b<c enumeration over the id-ordered pair table —
    // the triangle SET is orientation-invariant, so the simple oracle
    // matches the degree-oriented Spark enumeration exactly
    "llm_dup_triangles" ->
      s"""WITH $dupEdgesSql,
         |deg AS (
         |  SELECT a AS doc_id, count(*) AS deg FROM edges GROUP BY a),
         |tri AS (
         |  SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
         |  FROM pairs p1
         |  JOIN pairs p2 ON p2.doc_a = p1.doc_b
         |  JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
         |tv AS (
         |  SELECT unnest([a, b, c]) AS doc_id FROM tri),
         |tc AS (
         |  SELECT doc_id, count(*) AS n_tri FROM tv GROUP BY 1)
         |SELECT d.doc_id, d.deg,
         |  CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST(CASE WHEN d.deg >= 2
         |    THEN (2 * coalesce(tc.n_tri, 0) * 1000000) // (d.deg * (d.deg - 1))
         |    ELSE 0 END AS BIGINT) AS cc_ppm
         |FROM deg d LEFT JOIN tc ON tc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "llm_dup_weights" ->
      s"""WITH RECURSIVE $clusterLabelsSql,
         |sizes AS (
         |  SELECT cluster_id, count(*) AS family_size
         |  FROM labels GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(s.family_size, 1) AS family_size,
         |  1000000 // coalesce(s.family_size, 1) AS weight_ppm
         |FROM documents d
         |LEFT JOIN labels l ON l.doc_id = d.doc_id
         |LEFT JOIN sizes s ON s.cluster_id = l.cluster_id
         |ORDER BY d.doc_id""".stripMargin,

    "llm_source_report" ->
      s"""WITH RECURSIVE $clusterLabelsSql,
         |doc_toks AS (
         |  SELECT doc_id, source,
         |    CAST(len(${graft.llm.TextOps.toksSql}) AS BIGINT) AS n_toks
         |  FROM documents),
         |vol AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
         |  FROM doc_toks GROUP BY 1),
         |dup AS (
         |  SELECT d.source,
         |    CAST(sum(CASE WHEN l.cluster_id IS NOT NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in_family,
         |    CAST(sum(CASE WHEN l.cluster_id IS NOT NULL
         |      AND l.cluster_id <> d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup
         |  FROM doc_toks d LEFT JOIN labels l ON l.doc_id = d.doc_id
         |  GROUP BY 1)
         |SELECT vol.source, vol.n_docs, vol.n_tokens,
         |  dup.n_in_family, dup.n_dup,
         |  CAST(dup.n_dup AS DOUBLE) / CAST(vol.n_docs AS DOUBLE) AS dup_ratio
         |FROM vol JOIN dup USING (source)
         |ORDER BY source""".stripMargin,

    "llm_dedup_stats" ->
      s"""WITH RECURSIVE $clusterLabelsSql,
         |fam AS (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS family_size
         |  FROM labels GROUP BY 1)
         |SELECT family_size, CAST(count(*) AS BIGINT) AS n_families
         |FROM fam GROUP BY 1 ORDER BY 1""".stripMargin,

    // incremental ingestion converges to the same fixpoint — same oracle
    "llm_cluster_inc" ->
      s"""WITH RECURSIVE $clusterLabelsSql
         |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
         |FROM labels ORDER BY 1""".stripMargin,

    // retirement fixpoint == from-scratch closure over the remaining docs
    "llm_cluster_retire" ->
      s"""WITH RECURSIVE ${clusterLabelsSqlWhere("doc_id % 7 <> 0")}
         |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
         |FROM labels ORDER BY 1""".stripMargin,

    "llm_corpus_filter" -> {
      val stopList = TextAnalysisQueries.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH RECURSIVE $clusterLabelsSql,
         |stats AS (
         |  SELECT doc_id,
         |    CAST(len(t) AS INT) AS n_tokens,
         |    len(list_distinct(t))::DOUBLE / len(t) AS ttr,
         |    len(list_filter(t, c -> c IN ($stopList)))::DOUBLE / len(t) AS stop_ratio
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents)),
         |v AS (
         |  SELECT s.doc_id,
         |    CASE WHEN s.n_tokens < 40 THEN 'short'
         |         WHEN s.ttr < 0.35 THEN 'low_ttr'
         |         WHEN s.stop_ratio < 0.02 THEN 'low_stopword'
         |         WHEN l.cluster_id IS NOT NULL AND l.cluster_id <> s.doc_id
         |           THEN 'duplicate'
         |         ELSE 'ok' END AS reason
         |  FROM stats s LEFT JOIN labels l ON l.doc_id = s.doc_id)
         |SELECT doc_id, reason, reason = 'ok' AS kept
         |FROM v ORDER BY doc_id""".stripMargin
    },

    "llm_stratified_sample" ->
      s"""SELECT source, lang,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN ${hash32Sql("'sample:' || CAST(doc_id AS VARCHAR)")} % 100 < 10
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "llm_split_leakage_safe" ->
      s"""WITH RECURSIVE $clusterLabelsSql,
         |units AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS unit
         |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
         |s AS (
         |  SELECT doc_id, unit,
         |    CASE WHEN ${hash32Sql("'split:' || CAST(unit AS VARCHAR)")} % 100 < 90
         |         THEN 'train' ELSE 'test' END AS split
         |  FROM units)
         |SELECT split, count(*) AS n_docs,
         |  CAST(count(DISTINCT unit) AS BIGINT) AS n_units
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_vector_neardup" -> {
      val countsSql = (0 until VDim)
        .map(i => s"count(*) FILTER (WHERE d = $i) AS c$i").mkString(",\n    ")
      val n2Sql = (0 until VDim).map(i => s"c$i*c$i").mkString(" + ")
      val dotSql = (0 until VDim).map(i => s"x.c$i*y.c$i").mkString(" + ")
      val vd2 = VDim.toLong * VDim
      s"""WITH docs AS ($shingledSql),
         |ctok AS (
         |  SELECT doc_id, tok % $VDim AS d
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM docs)),
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
         |  SELECT doc_id, count(*) AS tot,
         |    $countsSql
         |  FROM ctok GROUP BY 1),
         |n AS (SELECT *, ($vd2*($n2Sql) - $VDim*tot*tot) AS n2c FROM v)
         |SELECT * FROM (
         |  SELECT cand.doc_a AS doc_a, cand.doc_b AS doc_b,
         |    CAST(($vd2*($dotSql) - $VDim*x.tot*y.tot) AS DOUBLE)
         |      / (sqrt(CAST(x.n2c AS DOUBLE)) * sqrt(CAST(y.n2c AS DOUBLE))) AS cosine
         |  FROM cand
         |  JOIN n x ON x.doc_id = cand.doc_a
         |  JOIN n y ON y.doc_id = cand.doc_b)
         |WHERE cosine >= 0.8
         |ORDER BY 1, 2""".stripMargin
    },

    "llm_ngram_jaccard" ->
      s"""WITH d AS (
         |  SELECT doc_id, sh FROM (
         |    SELECT doc_id, ${hashedNgramsSql("t", 3)} AS sh
         |    FROM (SELECT doc_id, $toksSql AS t FROM documents))
         |  WHERE len(sh) > 0),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM d)),
         |$minhashSigSql,
         |bands AS (
         |  $minhashBandsSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
         |SELECT * FROM (
         |  SELECT cand.doc_a AS doc_a, cand.doc_b AS doc_b,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS INT) AS n_common,
         |    ${jaccardSql("x.sh", "y.sh")} AS jaccard
         |  FROM cand
         |  JOIN d x ON x.doc_id = cand.doc_a
         |  JOIN d y ON y.doc_id = cand.doc_b)
         |WHERE jaccard >= 0.1
         |ORDER BY 1, 2""".stripMargin,

    "llm_minhash_udaf" -> {
      val cols = (0 until NumHashes).map(i => s"m$i").mkString(", ")
      s"""WITH d AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM d)),
         |$minhashSigSql
         |SELECT doc_id, $cols FROM sig ORDER BY doc_id""".stripMargin
    },

    "llm_minhash_est" -> {
      val eqSum = (0 until NumHashes)
        .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH d AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM d)),
         |$minhashSigSql,
         |bands AS (
         |  $minhashBandsSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |est AS (
         |  SELECT cand.doc_a, cand.doc_b, ($eqSum) AS n_eq
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = cand.doc_a
         |  JOIN sig sb ON sb.doc_id = cand.doc_b)
         |SELECT e.doc_a, e.doc_b, CAST(e.n_eq AS INT) AS n_eq,
         |  CAST(e.n_eq AS DOUBLE) / CAST($NumHashes AS DOUBLE) AS est_jaccard,
         |  ${jaccardSql("x.sh", "y.sh")} AS jaccard
         |FROM est e
         |JOIN d x ON x.doc_id = e.doc_a
         |JOIN d y ON y.doc_id = e.doc_b
         |ORDER BY 1, 2""".stripMargin
    },

    "llm_containment" ->
      s"""WITH d AS ($shingledSql),
         |tok AS (
         |  SELECT doc_id, tok % $P AS h
         |  FROM (SELECT doc_id, unnest(sh) AS tok FROM d)),
         |$minhashSigSql,
         |bands AS (
         |  $minhashBandsSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
         |SELECT * FROM (
         |  SELECT cand.doc_a AS doc_a, cand.doc_b AS doc_b,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS INT) AS n_common,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / CAST(len(x.sh) AS DOUBLE) AS cont_a,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / CAST(len(y.sh) AS DOUBLE) AS cont_b
         |  FROM cand
         |  JOIN d x ON x.doc_id = cand.doc_a
         |  JOIN d y ON y.doc_id = cand.doc_b)
         |WHERE greatest(cont_a, cont_b) >= 0.3
         |ORDER BY 1, 2""".stripMargin
  )
}
