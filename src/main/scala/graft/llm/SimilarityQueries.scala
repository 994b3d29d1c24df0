package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over the `embeddings` fixture
  * (500 × 64-dim float vectors at sf0.01).
  *
  * Two operators:
  *
  *  - `llm_embed_topk`: brute-force cosine top-k for a small broadcast
  *    query set — the exact baseline. Scale shape: the query side is
  *    broadcast (bounded), the corpus side is one embarrassingly
  *    parallel scan; no shuffle except the tiny per-query top-k window.
  *  - `llm_embed_lsh_ann`: random-hyperplane LSH — each vector gets a
  *    sign-bit bucket from 6 fixed hyperplanes, candidates are
  *    same-bucket pairs (bucket equi-join, never all-pairs), and each
  *    vector reports its best same-bucket neighbour. At 100 TB you add
  *    planes to keep buckets bounded; the join stays keyed and
  *    skew-free because hyperplane signs of random data are uniform.
  *
  * Float parity with the DuckDB oracle: both engines widen each float
  * to double and accumulate with an explicit SEQUENTIAL left-fold
  * (Spark `aggregate`, DuckDB `list_reduce(list_prepend(0.0, …))`) —
  * DuckDB's builtin `list_cosine_similarity` accumulates in float32
  * and does NOT match, so the oracle never uses it. Hyperplane
  * constants are embedded as integer expressions
  * `CAST(s AS DOUBLE)/2147483648.0 - 0.5` (exact dyadic rationals), so
  * both engines parse identical doubles.
  */
object SimilarityQueries {

  type QFn = (SparkSession, String) => DataFrame

  val Dim = 64
  val NumPlanes = 6
  val TopK = 10
  val NumQueries = 10

  /** LCG seed for hyperplane component (p, d); the raw 31-bit integer
    * is what gets embedded in SQL.
    */
  def planeSeed(p: Int, d: Int): Long =
    (1103515245L * (p.toLong * Dim + d + 1) + 12345L) % 2147483648L

  val NumCentroids = 8
  val IvfTopK = 3
  val KmeansK = 8

  /** Coreset size for the greedy k-center selection
    * (`llm_coreset_sample`) — bounded, so the k−1 selection passes stay
    * a constant number of corpus scans.
    */
  val CoresetK = 8

  /** Edges per node in the kNN graph (`llm_knn_graph`). */
  val KnnK = 3

  /** Matryoshka prefix dims: candidates rank by the dot over the first
    * `MatPrefix` of `Dim` dimensions (2× less scan traffic), exact
    * full-dim cosine reranks the survivors. Half the dims — these
    * fixtures are NOT Matryoshka-trained, so the prefix carries only
    * its proportional share of the signal; trained nested embeddings
    * front-load information and would support a far shorter prefix at
    * the same recall (the constant is the tuning knob).
    */
  val MatPrefix = 32
  val MatCandidates: Int = 3 * TopK

  /** Deterministic centroid sample selector: `vec_id % CentroidStride
    * == CentroidPhase`, lowest vec_ids first — the k-means|| init
    * stand-in. Both engines select the SAME rows, so the centroid
    * vectors are identical exact floats in both.
    */
  val CentroidStride = 17
  val CentroidPhase = 5

  /** SQL fragment for hyperplane component (p, d): exact in both
    * engines.
    */
  private def planeComp(p: Int, d: Int): String =
    s"(CAST(${planeSeed(p, d)} AS DOUBLE) / 2147483648.0 - 0.5)"

  /** The identical double, computed in Scala (exact dyadic rational —
    * bit-equal to the SQL-parsed expression).
    */
  private def planeCompVal(p: Int, d: Int): Double =
    planeSeed(p, d).toDouble / 2147483648.0 - 0.5

  /** Native sequential double-fold dot product
    * ([[graft.functions.VectorDot]]) — same IEEE op order as the
    * portable `aggregate(zip_with(...))` fold and the DuckDB
    * `list_reduce` twin, so results stay bit-identical; ~10× faster
    * than the interpreted lambda fold.
    */
  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.VectorDot(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  private def norm(c: Column): Column = sqrt(dot(c, c))

  /** Exact int64 dot over two long arrays (the quantized-dot kernel) —
    * native codegen'd loop, value bit-identical to the
    * `aggregate(zip_with(...))` fold and the DuckDB `list_reduce` twin.
    */
  private def dotLong(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.VectorDotLong(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  private def planeDot(p: Int): Column =
    dot(col("embedding"), array((0 until Dim).map(d => lit(planeCompVal(p, d))): _*))

  /** Build-once kNN edge table `(src, rank, dst, cos_sim)` over
    * LSH-bucket candidates — the graph index shared by
    * `llm_knn_graph` (mutual-edge analysis) and `llm_graph_ann`
    * (beam-search probe): the real pipeline builds the graph once and
    * both consumers read it. Build seconds surface in Bench
    * `artifacts`.
    */
  private[llm] def knnEdges(s: SparkSession, dir: String): DataFrame =
    IndexArtifacts.cached(s, dir, "knn-edges",
      inputs = Seq(s"$dir/embeddings.parquet")) { out =>
      import s.implicits._
      val bucket = (0 until NumPlanes).map { p =>
        when(planeDot(p) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val b = Tables(s, dir).embeddings
        .select($"vec_id", $"embedding", norm($"embedding").as("norm"),
          bucket.as("bucket"))
      val (bm, dropB) = IndexArtifacts.materializeOwned(s, b, "knn-bucket")
      val w = Window.partitionBy(col("x.vec_id"))
        .orderBy(col("cos_sim").desc, col("y.vec_id").asc)
      try bm.as("x").join(bm.as("y"),
          col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("cos_sim",
          dot(col("x.embedding"), col("y.embedding")) /
            (col("x.norm") * col("y.norm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= KnnK)
        .select(col("x.vec_id").as("src"), col("rank"),
          col("y.vec_id").as("dst"), col("cos_sim"))
        .write.parquet(out)
      finally dropB()
    }

  /** `llm_graph_ann` parameters: IVF-derived CONSTANT-SIZE entry set
    * (the HNSW upper-layer analog — r14, replacing the 1/50 corpus
    * stride that was the last corpus-proportional term in any ANN
    * path): per IVF cell the `GraphEntryPerCell` lowest-vec_id members
    * are the hub set, and each query enters the walk only through its
    * `GraphProbeCells` best cells' hubs — GraphProbeCells ×
    * GraphEntryPerCell entry candidates per query at ANY corpus size.
    * `GraphBeam` best-first frontier, `GraphHops` unrolled expansions
    * (unrolled in the ORACLE too — two engines, one walk).
    */
  val GraphEntryPerCell = 4
  val GraphProbeCells = 2
  val GraphBeam = 4
  val GraphHops = 2

  /** The deterministic centroid sample, collected to the driver (k
    * vectors of Dim floats — bounded, the same place k-means centroids
    * live between iterations). Embedded as exact literals, the
    * per-vector assignment stays a zero-shuffle projection.
    */
  private[graft] def sampleCentroids(s: SparkSession, dir: String,
      numCentroids: Int): Seq[Array[Float]] = {
    import s.implicits._
    Tables(s, dir).embeddings
      .filter(pmod($"vec_id", lit(CentroidStride.toLong)) === CentroidPhase)
      .orderBy($"vec_id")
      .limit(numCentroids)
      .select($"embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray).toSeq
  }

  /** IVF assignment score for a sampled centroid: `e·c − ||c||²/2` —
    * argmax over c is the nearest-centroid (argmin L2) assignment, in
    * one dot per centroid. The half-norm is the same sequential
    * left-fold both engines compute (`0.0 + x0² + x1² + …` then / 2),
    * over the identical float values, so scores are bit-equal.
    */
  private[graft] def centroidScore(cent: Array[Float]): Column = {
    val halfNorm = cent.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble) / 2.0
    dot(col("embedding"), array(cent.map(x => lit(x.toDouble)).toSeq: _*)) -
      lit(halfNorm)
  }

  /** Nearest-centroid cell id over pre-computed score columns cs0..csN
    * with deterministic lowest-index tie-break (same greatest+CASE
    * shape as the oracle).
    */
  private[graft] def cellFromScores(k: Int): Column = {
    val mx = greatest((0 until k).map(c => col(s"cs$c")): _*)
    (1 until k).foldLeft(
      when(col("cs0") === mx, 0)) { (acc, c) => acc.when(col(s"cs$c") === mx, c) }
  }

  /** SQ8 quantization scale: `q_i = floor(x_i · 200)` — fixture values
    * lie in (−0.6, 0.6), so codes lie in (−120, 120): int8 range, and
    * `floor` (unlike `round` or int casts, whose half-way/truncation
    * rules differ between engines) is IEEE-exact in both. At 100 TB the
    * scale comes from a bounded min/max scan instead of a constant.
    */
  val Sq8Scale = 200
  /** Quantized-scan candidates per query before the exact rerank. */
  val Sq8Candidates: Int = 3 * TopK

  /** int8-code column `floor(x·scale)` per dimension — the ONE
    * quantizer both SQ8 consumers (`llm_embed_sq8`, `llm_hybrid_rrf`)
    * share, widened to double BEFORE the multiply so a float product
    * cannot round differently than the oracle's double multiply and
    * flip a floor at an integer boundary. [[sq8Sql]] is the DuckDB
    * twin; keep the pair in lockstep.
    */
  private def sq8Codes(e: Column): Column =
    transform(e, x => floor(x.cast("double") * lit(Sq8Scale.toDouble)).cast("long"))

  private def sq8Sql(e: String): String =
    s"""list_transform($e,
       |      x -> CAST(floor(x::DOUBLE * CAST($Sq8Scale AS DOUBLE)) AS BIGINT))""".stripMargin

  /** The SQ8 code table (vec_id, embedding, norm, qv) — one build-once
    * index per corpus state, shared by the quantized scan
    * (`llm_embed_sq8`) and RRF fusion (`llm_hybrid_rrf`).
    */
  private def sq8CodeTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    IndexArtifacts.cachedIndex(s, dir, "sq8-codes",
      Seq(s"$dir/embeddings.parquet"))(Tables(s, dir).embeddings
      .select($"vec_id", $"embedding", norm($"embedding").as("norm"),
        sq8Codes($"embedding").as("qv")))
  }

  /** Product-quantization geometry: Dim = PqM × PqSubDim subspaces,
    * PqK centroids per subspace codebook (the sampled-vector subslices,
    * same deterministic sample as IVF). Codes are PqM small ints per
    * vector — 8 small codes standing in for 256 bytes of floats
    * (int8 storage: 32× less scan IO). Init codebooks are the sampled
    * vectors' subslices; one deterministic Lloyd refinement learns the
    * final entries.
    */
  val PqM = 8
  val PqSubDim: Int = Dim / PqM
  val PqK = 16

  /** Semantic-dedup cosine threshold (the fixture's cross-pair cosines
    * top out near 0.51, so 0.35 flags a meaningful-but-small set).
    */
  val SemDedupTau = 0.35

  // ------------------------------------------------- shared PQ pipeline
  // Cosine-faithful PQ: L2-normalize corpus, queries, AND codebook
  // first — on the unit sphere d² = 2 − 2·cos, so ADC's L2 ranking IS
  // the cosine ranking up to quantization error. Normalization is one
  // sqrt + one divide per element, each a single correctly-rounded
  // IEEE op both engines share. Shared by `llm_embed_pq` (flat scan)
  // and `llm_embed_ivfpq` (cell-pruned scan).

  /** L2-normalized copy of a float vector. */
  private def normalizedArr(v: Array[Float]): Array[Double] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    v.map(_.toDouble / n)
  }

  /** The corpus, L2-normalized to doubles. */
  private def normalizedEmb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).embeddings
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
      .select($"vec_id",
        transform($"embedding", x => x.cast("double") / $"nrm")
          .as("embedding"))
  }

  /** [[centroidScore]] for an already-normalized double centroid. */
  private def centroidScoreD(cent: Array[Double]): Column = {
    val halfNorm = cent.foldLeft(0.0)((a, x) => a + x * x) / 2.0
    dot(col("embedding"), array(cent.map(lit).toIndexedSeq: _*)) -
      lit(halfNorm)
  }

  /** ADC partial score of subspace m against codebook entry j:
    * `q_m·c − ||c||²/2` (argmax ⇔ nearest entry, same kernel as IVF).
    */
  private def pqSubScore(cb: IndexedSeq[IndexedSeq[Array[Double]]],
      e: Column, m: Int, j: Int): Column = {
    val cv = cb(m)(j)
    val hn = cv.foldLeft(0.0)((a, x) => a + x * x) / 2.0
    dot(slice(e, m * PqSubDim + 1, PqSubDim),
      array(cv.map(lit).toIndexedSeq: _*)) - lit(hn)
  }

  private def pqCodeOf(m: Int, k: Int): Column = {
    val mx = greatest((0 until k).map(j => col(s"s${m}_$j")): _*)
    (1 until k).foldLeft(when(col(s"s${m}_0") === mx, 0)) {
      (acc, j) => acc.when(col(s"s${m}_$j") === mx, j)
    }
  }

  /** Encode each vector as PqM nearest-entry codes (keeps `embedding`
    * for downstream consumers to slice or score).
    */
  private def pqEncode(cb: IndexedSeq[IndexedSeq[Array[Double]]],
      df: DataFrame): DataFrame = {
    val k = cb.head.size
    df.select(Seq(col("vec_id"), col("embedding")) ++
      (for { m <- 0 until PqM; j <- 0 until k }
        yield pqSubScore(cb, col("embedding"), m, j).as(s"s${m}_$j")): _*)
      .select(Seq(col("vec_id"), col("embedding")) ++
        (0 until PqM).map(m => pqCodeOf(m, k).as(s"c$m")): _*)
  }

  /** Learned codebooks: sampled-subslice init + ONE deterministic
    * Lloyd refinement per subspace — assign against the init codebook,
    * recompute each entry as its members' mean (summed in ascending
    * vec_id order with a sequential element fold so the mean's bits
    * reproduce anywhere), keep the init entry where a code attracted
    * no members. Centroids live on the driver (PqM×PqK small vectors)
    * between iterations, exactly the k-means shape; the assignment
    * itself is a zero-shuffle scan.
    */
  private def pqCodebook(s: SparkSession, dir: String,
      emb: DataFrame): IndexedSeq[IndexedSeq[Array[Double]]] = {
    import s.implicits._
    val init = sampleCentroids(s, dir, PqK).map(normalizedArr)
    val K = init.size
    val cb0 = IndexedSeq.tabulate(PqM)(m =>
      init.map(_.slice(m * PqSubDim, (m + 1) * PqSubDim)).toIndexedSeq)
    // TRAIN ONCE, serve many: the refined codebook is a build-once
    // artifact (like kmeans-cells) — PQ consumers re-read PqM×PqK tiny
    // rows instead of re-running the corpus-wide Lloyd step per query.
    val refined = IndexArtifacts.cached(s, dir, "pq-codebook",
        inputs = Seq(s"$dir/embeddings.parquet")) { out =>
      val memb = pqEncode(cb0, emb)
        .select($"vec_id", explode(array((0 until PqM).map(m =>
          struct(lit(m).as("m"), col(s"c$m").as("code"),
            slice($"embedding", m * PqSubDim + 1, PqSubDim).as("sub"))): _*))
          .as("x"))
        .select($"vec_id", $"x.m".as("m"), $"x.code".as("code"),
          $"x.sub".as("sub"))
      val zero = s"transform(sequence(1, $PqSubDim), i -> 0D)"
      memb.groupBy($"m", $"code")
        .agg(count(lit(1)).as("n"),
          sort_array(collect_list(struct($"vec_id", $"sub"))).as("mem"))
        .withColumn("cv", expr(
          s"""transform(aggregate(transform(mem, x -> x.sub), $zero,
             |  (acc, x) -> zip_with(acc, x, (p, q) -> p + q)),
             |  sv -> sv / CAST(n AS DOUBLE))""".stripMargin))
        .select($"m", $"code", $"cv")
        .write.parquet(out)
    }.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
      .toMap
    IndexedSeq.tabulate(PqM)(m => IndexedSeq.tabulate(K)(j =>
      refined.getOrElse((m, j), cb0(m)(j))))
  }

  /** Per-query ADC lookup tables: for each subspace m, (query_id,
    * c{m}, s{m}) with PqK rows per query — always broadcastable.
    */
  private def pqQueryTables(cb: IndexedSeq[IndexedSeq[Array[Double]]],
      emb: DataFrame): Seq[DataFrame] = {
    val k = cb.head.size
    val q = emb.filter(col("vec_id") < NumQueries)
    (0 until PqM).map { m =>
      q.select(col("vec_id").as("query_id"),
        explode(array((0 until k).map(j =>
          struct(lit(j).as("code"),
            pqSubScore(cb, col("embedding"), m, j).as("s"))): _*)).as("e"))
        .select(col("query_id"), col("e.code").as(s"c$m"),
          col("e.s").as(s"s$m"))
    }
  }

  /** Reciprocal-rank-fusion smoothing constant (the standard k=60). */
  val RrfK = 60

  val defs: Map[String, QFn] = Map(

    // --- brute-force cosine top-k (exact ANN baseline) ------------------
    "llm_embed_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables(s, dir).embeddings
        .select($"vec_id", $"embedding", norm($"embedding").as("norm"))
      val q = emb.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm".as("qn"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      emb.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("cos_sim",
          dot($"qe", $"embedding") / ($"qn" * $"norm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cos_sim")
        .orderBy($"query_id", $"rank")
    },

    // --- IVF-style cell-probed ANN --------------------------------------
    "llm_embed_ivf" -> embedIvf(),

    // --- IVF multi-probe: top-2 cells per query (boundary recall) -------
    "llm_embed_ivf_probe2" -> embedIvf(nprobe = 2),

    // --- random-hyperplane LSH bucketed ANN -----------------------------
    "llm_embed_lsh_ann" -> embedLshAnn(),

    // --- kNN graph construction (bucketed edges + mutual marking) -------
    // The graph every graph-based curation step starts from (SemDeDup
    // clustering, label propagation, connectivity audits): top-KnnK
    // cosine edges per node among same-LSH-bucket candidates, plus a
    // MUTUAL flag (is the reverse edge also in the neighbor's top-k) —
    // mutual-kNN is the standard edge filter before community
    // detection, because one-way edges are mostly hub noise. The
    // candidate set is the bucket equi-join (never all-pairs); the
    // edge table materializes ONCE and the mutual flag is a self-join
    // on the reversed key — at 100 TB that is a keyed shuffle of the
    // edge table (n·k rows), not of the corpus.
    "llm_knn_graph" -> { (s, dir) =>
      import s.implicits._
      val edges = knnEdges(s, dir)
      val rev = edges.select($"src".as("rsrc"), $"dst".as("rdst"))
      edges.join(rev, $"src" === $"rdst" && $"dst" === $"rsrc", "left")
        .select($"src", $"rank", $"dst", $"cos_sim",
          $"rsrc".isNotNull.cast("int").as("mutual"))
        .orderBy($"src", $"rank")
    },

    // --- graph ANN: beam search over the kNN graph (HNSW family) --------
    // The graph-navigation ANN shape (HNSW/NSG): start from a
    // deterministic entry set, repeatedly expand the per-query best-B
    // frontier along the kNN graph's directed edges, keep every
    // visited node's exact score, answer top-k from the visited set.
    // Here the hierarchy is flattened to GraphHops unrolled expansions
    // so the ORACLE can replay the identical walk (two engines, one
    // fixpoint — scores are the shared sequential-fold dot, ties break
    // by vec_id). Scale: after the build-once edge index, per-hop cost
    // is |Q|·B edge lookups + candidate-sized scoring joins — the
    // corpus never re-enters; the entry set is CONSTANT-SIZE (r14):
    // per IVF cell the GraphEntryPerCell lowest-vec_id members are the
    // hub set (the HNSW upper-layer analog, derived from the SAME
    // build-once ivf-assign index llm_embed_ivf reads), and each query
    // enters only through its GraphProbeCells best cells' hubs —
    // nprobe·R entry candidates per query at any corpus size, so NO
    // term in this path grows with the corpus after the index builds.
    "llm_graph_ann" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables(s, dir).embeddings
        .select($"vec_id", $"embedding", norm($"embedding").as("norm"))
      val qs = emb.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm".as("qn"))
      val edges = knnEdges(s, dir).select($"src", $"dst")
      def score(cand: DataFrame): DataFrame =
        cand.join(emb, "vec_id").join(broadcast(qs), "query_id")
          .select($"query_id", $"vec_id",
            (dot($"qe", $"embedding") / ($"qn" * $"norm")).as("cos_sim"))
      // hub set off the shared IVF assignment index (same cache key as
      // llm_embed_ivf — built once, read by both)
      val cents = sampleCentroids(s, dir, NumCentroids)
      val k = cents.size
      def withScores(df: DataFrame): DataFrame =
        df.select(Seq($"vec_id", $"embedding",
          norm($"embedding").as("norm")) ++
          cents.zipWithIndex.map { case (c, i) =>
            centroidScore(c).as(s"cs$i") }: _*)
      val assigned = IndexArtifacts.cachedIndex(s, dir, s"ivf-assign-$k",
        Seq(s"$dir/embeddings.parquet"))(
        withScores(Tables(s, dir).embeddings)
          .select($"vec_id", $"embedding", $"norm",
            cellFromScores(k).as("cell")))
      val wHub = Window.partitionBy($"cell").orderBy($"vec_id".asc)
      val hubs = assigned.select($"cell", $"vec_id")
        .withColumn("hr", row_number().over(wHub))
        .filter($"hr" <= GraphEntryPerCell)
        .select($"cell", $"vec_id")
      // each query's GraphProbeCells best cells (score desc, lowest
      // index on ties — the same rank llm_embed_ivf_probe2 uses)
      val ranked = sort_array(array((0 until k).map(i =>
        struct(col(s"cs$i").as("s"), lit(-i).as("ni"))): _*), asc = false)
      val qcells = withScores(
        Tables(s, dir).embeddings.filter($"vec_id" < NumQueries))
        .select($"vec_id".as("query_id"),
          explode(transform(slice(ranked, 1, GraphProbeCells),
            x => -x("ni"))).as("qcell"))
      val entries = broadcast(qcells)
        .join(hubs, $"qcell" === $"cell")
        .select($"query_id", $"vec_id")
        .filter($"vec_id" =!= $"query_id").distinct()
      var visited = score(entries)
      for (_ <- 1 to GraphHops) {
        val w = Window.partitionBy($"query_id")
          .orderBy($"cos_sim".desc, $"vec_id".asc)
        val frontier = visited.withColumn("rk", row_number().over(w))
          .filter($"rk" <= GraphBeam).select($"query_id", $"vec_id")
        val nbrs = frontier
          .join(edges, frontier("vec_id") === edges("src"))
          .select($"query_id", $"dst".as("vec_id"))
          .filter($"vec_id" =!= $"query_id").distinct()
        visited = visited.unionByName(score(nbrs))
          .groupBy($"query_id", $"vec_id").agg(max($"cos_sim").as("cos_sim"))
      }
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      visited.withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cos_sim")
        .orderBy($"query_id", $"rank")
    },

    // --- supervised hard-negative mining (contrastive training pairs) ---
    // Embedding-model training (contrastive / metric learning) wants,
    // per anchor, the most-similar examples of a DIFFERENT class — the
    // hard negatives that actually move the loss (random negatives are
    // trivially separated). Identical scan shape to llm_embed_topk
    // (bounded anchor set broadcast against one corpus scan) with the
    // class-disagreement predicate applied BEFORE ranking, so the
    // top-k window never spends slots on positives. At 100 TB the
    // anchor set stays bounded and the scan side swaps for any ANN
    // index here (IVF/PQ/LSH) unchanged.
    "llm_hard_negatives" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables(s, dir).embeddings
        .select($"vec_id", $"label", $"embedding", norm($"embedding").as("norm"))
      val q = emb.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"label".as("q_label"),
          $"embedding".as("qe"), $"norm".as("qn"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      emb.join(broadcast(q),
          $"vec_id" =!= $"query_id" && $"label" =!= $"q_label")
        .withColumn("cos_sim", dot($"qe", $"embedding") / ($"qn" * $"norm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"q_label", $"rank",
          $"vec_id".as("negative_id"), $"label".as("neg_label"), $"cos_sim")
        .orderBy($"query_id", $"rank")
    },

    // --- leave-one-out 1-NN label agreement (embedding quality eval) -----
    // The supervised twin of llm_ann_eval: per class, how often does a
    // vector's nearest neighbor (among same-LSH-bucket candidates —
    // the same bounded candidate policy as llm_knn_graph, never
    // all-pairs) carry the SAME label? 1-NN agreement is the standard
    // quick probe of embedding quality before training on it; per-label
    // rows expose the classes the embedding confuses. One bucket
    // equi-join + a rank-1 window + a |labels|-row aggregate.
    "llm_knn_label_eval" -> { (s, dir) =>
      import s.implicits._
      val bucket = (0 until NumPlanes).map { p =>
        when(planeDot(p) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val b = IndexArtifacts.cachedIndex(s, dir, "labeleval-bucket",
        Seq(s"$dir/embeddings.parquet"))(Tables(s, dir).embeddings
        .select($"vec_id", $"label", $"embedding",
          norm($"embedding").as("norm"), bucket.as("bucket")))
      val w = Window.partitionBy(col("x.vec_id"))
        .orderBy(col("cos_sim").desc, col("y.vec_id").asc)
      b.as("x").join(b.as("y"),
          col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("cos_sim",
          dot(col("x.embedding"), col("y.embedding")) /
            (col("x.norm") * col("y.norm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1)
        .select(col("x.label").as("label"),
          col("y.label").as("nn_label"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n_eval"),
          sum(when($"label" === $"nn_label", 1L).otherwise(0L))
            .as("n_correct"))
        .select($"label", $"n_eval", $"n_correct",
          expr("n_correct * 1000000L div n_eval").as("acc_ppm"))
        .orderBy($"label")
    },

    // --- scalar-quantized (int8) scan + exact rerank ---------------------
    // The memory-bandwidth scale path for brute-force ANN: the scan
    // side reads 64 int8 codes instead of 64 floats (4× less traffic;
    // SIMD int dot), candidates come from the EXACT-INTEGER quantized
    // dot (total order, no float drift), and only the top
    // `Sq8Candidates` per query pay the exact float cosine. Recall loss
    // is bounded by quantization error; the rerank restores exact
    // ordering among survivors.
    "llm_embed_sq8" -> { (s, dir) =>
      import s.implicits._
      // the SQ8 code table IS the index — built once per corpus, scanned
      // by every query (at scale it lives in files; 4× smaller than floats)
      val b = sq8CodeTable(s, dir)
      val q = b.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm".as("qn"), $"qv".as("qqv"))
      val qdot = dotLong($"qqv", $"qv")
      val wq = Window.partitionBy($"query_id")
        .orderBy($"qdot".desc, $"vec_id".asc)
      val cand = b.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("qdot", qdot)
        .withColumn("crk", row_number().over(wq))
        .filter($"crk" <= Sq8Candidates)
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      cand.withColumn("cos_sim", dot($"qe", $"embedding") / ($"qn" * $"norm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
          $"qdot", $"cos_sim")
        .orderBy($"query_id", $"rank")
    },

    // --- Matryoshka (prefix-dimension) progressive ANN -------------------
    // The truncated-dimension retrieval trick of nested ("Matryoshka")
    // embeddings: rank candidates by the dot over the FIRST MatPrefix
    // dims only — a 4× cheaper scan that at 100 TB means reading a
    // 4×-narrower column (store the prefix as its own column and the
    // scan prunes to it) — then pay the exact full-dim cosine for the
    // MatCandidates survivors. Same two-stage shape as the SQ8 path,
    // compressing DIMENSIONS instead of precision; both fold doubles
    // sequentially so candidate order is bit-stable cross-engine.
    "llm_embed_matryoshka" -> { (s, dir) =>
      import s.implicits._
      val b = IndexArtifacts.cachedIndex(s, dir, "mat-prefix",
        Seq(s"$dir/embeddings.parquet"))(Tables(s, dir).embeddings
        .select($"vec_id", $"embedding", norm($"embedding").as("norm"),
          slice($"embedding", 1, MatPrefix).as("pre")))
      val q = b.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm".as("qn"), $"pre".as("qpre"))
      val wq = Window.partitionBy($"query_id")
        .orderBy($"pdot".desc, $"vec_id".asc)
      val cand = b.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("pdot", dot($"qpre", $"pre"))
        .withColumn("crk", row_number().over(wq))
        .filter($"crk" <= MatCandidates)
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      cand.withColumn("cos_sim", dot($"qe", $"embedding") / ($"qn" * $"norm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
          $"pdot", $"cos_sim")
        .orderBy($"query_id", $"rank")
    },

    // --- product-quantization (PQ) compressed ANN -----------------------
    // The 64-dim vector splits into PqM=8 8-dim subspaces; each
    // subspace gets a PqK=16-entry codebook (sampled-subslice init +
    // one deterministic Lloyd refinement) and every corpus vector is
    // stored as 8 small ints — a 32× compression of the scan side. Queries rank by
    // ASYMMETRIC distance (ADC): exact query subvector vs the
    // centroid each code names. Ranking by Σ_m d²(q_m, c_code) equals
    // ranking DESC by Σ_m (q_m·c − ||c||²/2) since q·q is per-query
    // constant — so the same bit-exact score kernel as IVF/k-means
    // serves, and the per-query lookup tables (PqM×PqK rows) broadcast.
    // The plan: one scan to encode (the materialized PQ index), then
    // PqM broadcast joins against the tables and ONE top-k window —
    // no shuffle proportional to corpus×corpus, and each per-subspace
    // partial sum is a single value so the 4-term fold keeps an
    // explicit IEEE order both engines share.
    "llm_embed_pq" -> { (s, dir) =>
      import s.implicits._
      val emb = normalizedEmb(s, dir)
      val cb1 = pqCodebook(s, dir, emb)
      // the PQ index: PqM codes per vector, built once per corpus
      val codes = IndexArtifacts.cachedIndex(s, dir, "pq-codes",
        Seq(s"$dir/embeddings.parquet"))(
        pqEncode(cb1, emb).select($"vec_id" +:
          (0 until PqM).map(m => col(s"c$m")): _*))
      val dts = pqQueryTables(cb1, emb)
      val joined = dts.zipWithIndex.foldLeft(codes) { case (df, (dt, m)) =>
        df.join(broadcast(dt),
          if (m == 0) Seq(s"c$m") else Seq("query_id", s"c$m"))
      }
      val w = Window.partitionBy($"query_id")
        .orderBy($"adc_score".desc, $"vec_id".asc)
      joined.filter($"vec_id" =!= $"query_id")
        .withColumn("adc_score",
          (1 until PqM).foldLeft(col("s0"))((acc, m) => acc + col(s"s$m")))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
          $"adc_score")
        .orderBy($"query_id", $"rank")
    },

    // --- IVF-PQ: cell-pruned scan over the compressed code list ---------
    // THE production ANN composition (what FAISS calls IVFPQ): IVF
    // cells bound WHICH vectors a query scores, PQ codes bound the
    // BYTES each scored vector costs. The index row is (cell, 8 codes);
    // a query probes its top-2 cells and ADC-scores only those cells'
    // code lists via the same broadcast lookup tables as llm_embed_pq
    // — at 100 TB the scan is |probed cells| × code-list bytes, with
    // neither term proportional to the corpus. Same normalized space
    // and bit-exact score kernel as PQ; the cell assignment reuses the
    // IVF argmax over normalized centroids.
    "llm_embed_ivfpq" -> { (s, dir) =>
      import s.implicits._
      val emb = normalizedEmb(s, dir)
      val cb1 = pqCodebook(s, dir, emb)
      val cents = sampleCentroids(s, dir, NumCentroids).map(normalizedArr)
      val k = cents.size
      val np = math.min(2, k)
      def withScores(df: DataFrame): DataFrame =
        df.select(df.columns.map(col) ++
          cents.zipWithIndex.map { case (c, i) =>
            centroidScoreD(c).as(s"cs$i") }: _*)
      // the IVF-PQ index: (vec_id, cell, c0..c7) — cell-partitionable,
      // 8 small ints of payload per vector, built once per corpus
      val index = IndexArtifacts.cachedIndex(s, dir, s"ivfpq-index-$k",
        Seq(s"$dir/embeddings.parquet"))(
        withScores(pqEncode(cb1, emb))
          .withColumn("cell", cellFromScores(k))
          .select($"vec_id" +: $"cell" +:
            (0 until PqM).map(m => col(s"c$m")): _*))
      // query side: nprobe best cells, ranked (score desc, cell asc)
      val ranked = sort_array(array((0 until k).map(i =>
        struct(col(s"cs$i").as("s"), lit(-i).as("ni"))): _*), asc = false)
      val qprobe = withScores(emb.filter($"vec_id" < NumQueries))
        .select($"vec_id".as("query_id"),
          explode(transform(slice(ranked, 1, np), x => -x("ni"))).as("qcell"))
      val cand = index.join(broadcast(qprobe),
        $"cell" === $"qcell" && $"vec_id" =!= $"query_id")
      val joined = pqQueryTables(cb1, emb).zipWithIndex
        .foldLeft(cand) { case (df, (dt, m)) =>
          df.join(broadcast(dt), Seq("query_id", s"c$m"))
        }
      val w = Window.partitionBy($"query_id")
        .orderBy($"adc_score".desc, $"vec_id".asc)
      joined
        .withColumn("adc_score",
          (1 until PqM).foldLeft(col("s0"))((acc, m) => acc + col(s"s$m")))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"cell", $"vec_id".as("neighbor_id"),
          $"adc_score")
        .orderBy($"query_id", $"rank")
    },

    // --- ANN recall evaluation (IVF vs exact ground truth) ---------------
    // The similarity-side twin of llm_dedup_eval: ANN recall is a
    // TUNING decision (numCentroids/nprobe trade candidates for
    // recall), so it must be measured. Per query: |IVF top-k ∩ exact
    // top-k| / k in ppm. The exact side is the bounded broadcast
    // brute-force baseline — at 100 TB you evaluate on a query SAMPLE,
    // which is precisely what the bounded query set is.
    "llm_ann_eval" -> { (s, dir) =>
      import s.implicits._
      // the exact brute-force GROUND TRUTH is an audit fixture of the
      // corpus state — build once per corpus (cost reported in the
      // bench `artifacts` field); only the evaluated ANN path re-runs
      val exact = IndexArtifacts.cached(s, dir, "ann-truth",
          inputs = Seq(s"$dir/embeddings.parquet")) { out =>
        defs("llm_embed_topk")(s, dir)
          .filter($"rank" <= IvfTopK)
          .select($"query_id", $"neighbor_id")
          .write.parquet(out)
      }
      val ivf = embedIvf()(s, dir)
        .select($"query_id", $"neighbor_id")
        .withColumn("hit", lit(1L))
      exact.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .groupBy($"query_id")
        .agg(sum(coalesce($"hit", lit(0L))).as("n_hit"))
        .select($"query_id", $"n_hit",
          expr(s"(1000000 * n_hit) div $IvfTopK").as("recall_ppm"))
        .orderBy($"query_id")
    },

    // --- semantic dedup (cluster-scoped embedding near-dup pruning) ------
    // The SemDeDup shape: a coarse quantizer (the IVF cells) partitions
    // the corpus, near-dup pairs are searched WITHIN cells only — a
    // cell equi-join, never all-pairs — and each near-dup group keeps
    // its lowest-id member. At 100 TB you raise numCentroids so cells
    // stay bounded; the within-cell join cost is Σ|cell|², controlled
    // by the quantizer, not the corpus.
    "llm_semantic_dedup" -> { (s, dir) =>
      import s.implicits._
      val cents = sampleCentroids(s, dir, NumCentroids)
      val k = cents.size
      val b = IndexArtifacts.cachedIndex(s, dir, s"semdedup-assign-$k",
        Seq(s"$dir/embeddings.parquet"))(
        Tables(s, dir).embeddings
          .select(Seq($"vec_id", $"embedding", norm($"embedding").as("norm")) ++
            cents.zipWithIndex.map { case (c, i) => centroidScore(c).as(s"cs$i") }: _*)
          .select($"vec_id", $"embedding", $"norm", cellFromScores(k).as("cell")))
      val pruned = b.as("x").join(b.as("y"),
          col("x.cell") === col("y.cell") &&
            col("x.vec_id") < col("y.vec_id"))
        .filter(dot(col("x.embedding"), col("y.embedding")) /
          (col("x.norm") * col("y.norm")) >= SemDedupTau)
        .select(col("y.vec_id").as("vec_id")).distinct()
      b.select($"vec_id", $"cell")
        .join(pruned.withColumn("p", lit(true)), Seq("vec_id"), "left")
        .select($"vec_id", $"cell", $"p".isNull.as("keep"))
        .orderBy($"vec_id")
    },

    // --- hybrid retrieval: reciprocal-rank fusion ------------------------
    // Fuse two retrieval systems' per-query top-k lists (here: exact
    // cosine and the int8 quantized dot — in production, BM25 + dense)
    // by RRF: score = Σ 1/(k + rank). Rank inputs are exact ints, each
    // term is ONE division, and the two terms add in fixed written
    // order — bit-exact cross-engine. The scale shape: fusion only ever
    // touches the bounded top-k lists (a (query, doc) equi-join), never
    // the corpus — whatever produced the lists did the heavy lifting.
    "llm_hybrid_rrf" -> { (s, dir) =>
      import s.implicits._
      val base = sq8CodeTable(s, dir)
      val q = base.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm".as("qn"), $"qv".as("qqv"))
      val scored = base.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("cos_sim", dot($"qe", $"embedding") / ($"qn" * $"norm"))
        .withColumn("qdot", dotLong($"qqv", $"qv"))
      val wc = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      val wq = Window.partitionBy($"query_id")
        .orderBy($"qdot".desc, $"vec_id".asc)
      val ranked = scored
        .withColumn("r_cos", row_number().over(wc))
        .withColumn("r_q", row_number().over(wq))
      val topC = ranked.filter($"r_cos" <= TopK)
        .select($"query_id", $"vec_id", $"r_cos")
      val topQ = ranked.filter($"r_q" <= TopK)
        .select($"query_id", $"vec_id", $"r_q")
      val fused = topC.join(topQ, Seq("query_id", "vec_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(RrfK) + $"r_cos").cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + $"r_q").cast("double"), lit(0.0)))
      val wf = Window.partitionBy($"query_id")
        .orderBy($"rrf".desc, $"vec_id".asc)
      fused.withColumn("rank", row_number().over(wf))
        .filter($"rank" <= TopK)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
          $"r_cos", $"r_q", $"rrf")
        .orderBy($"query_id", $"rank")
    },

    // --- k-means clustering (2 Lloyd iterations, deterministic) ----------
    // The embedding-clustering primitive behind corpus topic maps and
    // cluster-balanced sampling — and the refinement loop the IVF
    // quantizer's scaladoc promises: assign → recenter → reassign.
    // Distances use the IDENTICAL expansion in both engines
    // (d² = v·v − 2·v·c + c·c, each dot a sequential left-fold), so
    // assignments and SSE are bit-exact. Centroids live on the driver
    // between iterations (k·Dim doubles — where every distributed
    // k-means keeps them); assignment is a zero-shuffle broadcast-
    // literal projection. The recenter mean folds members in vec_id
    // order for cross-engine determinism; at 100 TB you swap that for
    // plain per-dimension partial-agg sums (order-free float sums —
    // same algorithm, statistically identical centroids) and keep
    // everything else.
    "llm_embed_kmeans" -> { (s, dir) =>
      import s.implicits._
      kmeansAssigned(s, dir)
        .groupBy($"cell")
        .agg(count(lit(1)).as("n_members"),
          expr("""aggregate(transform(sort_array(collect_list(struct(vec_id, d2))),
                |  x -> x.d2), 0D, (acc, x) -> acc + x)""".stripMargin).as("sse"))
        .orderBy($"cell")
    },

    // --- cluster-balanced sampling ----------------------------------------
    // The data-mixing twin of llm_mix_sample keyed by a LEARNED
    // partition instead of source metadata: every k-means cell gets an
    // equal share of the half-corpus target (the cluster-balancing
    // recipe that keeps dominant topics from swamping a training mix),
    // with the same exact int64 quota arithmetic and deterministic md5
    // keep decision. One cells-sized broadcast rate table + one
    // assignment scan beyond the clustering itself.
    "llm_cluster_balanced_sample" -> { (s, dir) =>
      import s.implicits._
      val assigned = kmeansAssigned(s, dir).select($"vec_id", $"cell")
      val per = assigned.groupBy($"cell").agg(count(lit(1)).as("n_members"))
      val tot = per.agg(sum($"n_members").as("n_total"),
        count(lit(1)).as("n_cells"))
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("quota", expr("(n_total div 2) div n_cells"))
        .withColumn("rate_ppm",
          least(lit(1000000L), expr("quota * 1000000 div n_members")))
        .select($"cell", $"n_members", $"quota", $"rate_ppm")
      assigned.join(broadcast(rates), "cell")
        .groupBy($"cell", $"n_members", $"quota", $"rate_ppm")
        .agg(sum(when(
          TextOps.hash32(concat(lit("cbs:"), $"vec_id".cast("string")))
            % 1000000 < $"rate_ppm", 1L).otherwise(0L)).as("n_sampled"))
        .orderBy($"cell")
    },

    // --- per-cluster medoid selection (coreset / representative docs) ----
    // After clustering, every curation pipeline wants the cluster's
    // REPRESENTATIVE member (the medoid — the actual vector minimizing
    // total distance to its cellmates) for topic labeling, coreset
    // construction, or dedup canonical picks. The naive formulation is
    // a within-cell ALL-PAIRS join (Σ|cell|² — the shape this repo
    // bans); the fix is the algebraic identity
    //   Σ_b d²(a,b) = n·(a·a) − 2·a·Σb + Σ(b·b)
    // which needs only per-cell moment aggregates (Σb element-wise,
    // Σ(b·b), n) — ONE cell-keyed partial agg producing |cells| rows
    // (always broadcastable), one scan to score every member against
    // its cell's moments, and a per-cell top-1. Distances use the
    // shared SQ8 integer quantizer so every sum is exact int64 —
    // order-free under any partitioning, bit-equal to the oracle.
    "llm_cluster_medoids" -> { (s, dir) =>
      import s.implicits._
      val m = kmeansAssigned(s, dir).select($"vec_id", $"cell")
        .join(Tables(s, dir).embeddings
          .select($"vec_id", sq8Codes($"embedding").as("qv")), "vec_id")
        .withColumn("qq", dotLong($"qv", $"qv"))
      val moments = m.groupBy($"cell").agg(
        count(lit(1)).as("n_members"),
        sum($"qq").as("sqq"),
        expr(s"""aggregate(collect_list(qv), array_repeat(0L, $Dim),
                |  (acc, x) -> zip_with(acc, x, (p, q) -> p + q))""".stripMargin)
          .as("sv"))
      val w = Window.partitionBy($"cell").orderBy($"s_d2".asc, $"vec_id".asc)
      m.join(broadcast(moments), "cell")
        .withColumn("s_d2",
          $"n_members" * $"qq" - lit(2L) * dotLong($"qv", $"sv") + $"sqq")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"cell", $"n_members", $"vec_id".as("medoid_vec_id"),
          $"s_d2".as("sum_d2"))
        .orderBy($"cell")
    },

    // --- greedy k-center coreset (farthest-point traversal) --------------
    // The DIVERSITY dual of the medoid pick: medoids name each
    // cluster's most central member; k-center greedily selects the
    // mutually most SPREAD-OUT members — the classic 2-approximation
    // coreset for data-efficient training subsets, eval-set seeding,
    // and annotation budgets (cover the space, don't oversample the
    // dense core). Seed = lowest vec_id; each round picks the vector
    // maximizing its min distance to everything already chosen.
    // Scale shape: k is bounded, so this is k−1 passes, each a ZERO-
    // SHUFFLE projection (the ≤k chosen centers are driver-collected
    // and embedded as exact literals, same discipline as the Lloyd
    // iterations) followed by a TakeOrdered top-1 — no join, no
    // all-pairs, no quadratic anything; 100 TB costs k corpus scans.
    // Float parity: d² = v·v − 2·(v·c) + c·c with every dot a
    // sequential left-fold and c·c folded once on the driver — the
    // oracle twin computes the identical doubles, and min/argmax are
    // comparisons (order-free).
    "llm_coreset_sample" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables(s, dir).embeddings
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("dvv", dot($"v", $"v"))
      val seed = emb.orderBy($"vec_id".asc).limit(1)
        .select($"vec_id", $"v").head()
      var picked = Vector[(Int, Long, Option[Double], Seq[Double])](
        (1, seed.getLong(0), None, seed.getSeq[Double](1)))
      var r = 2
      var exhausted = false
      while (r <= CoresetK && !exhausted) {
        val mind2 = picked.map { case (_, _, _, c) =>
          val cc = c.foldLeft(0.0)((a, x) => a + x * x)
          $"dvv" - lit(2.0) * dot($"v", array(c.map(lit): _*)) + lit(cc)
        }.reduce(least(_, _))
        val ids = picked.map(_._2)
        emb.filter(!$"vec_id".isin(ids: _*))
          .select($"vec_id", mind2.as("mind2"), $"v")
          .orderBy($"mind2".desc, $"vec_id".asc).limit(1)
          .collect().headOption match {
          case None =>
            // corpus smaller than CoresetK: every vector is already
            // picked — stop, matching the oracle's empty-CTE tail
            exhausted = true
          case Some(next) =>
            picked :+= ((r, next.getLong(0), Some(next.getDouble(1)),
              next.getSeq[Double](2)))
            r += 1
        }
      }
      picked.map { case (r, id, d, _) => (r, id, d) }
        .toDF("sel_rank", "vec_id", "dist2")
        .orderBy($"sel_rank")
    }
  )

  /** Final per-vector assignment of the 2-iteration deterministic
    * Lloyd run — `(vec_id, cell, d2)` — shared by `llm_embed_kmeans`
    * (aggregates to per-cell SSE) and `llm_cluster_balanced_sample`
    * (samples evenly across cells). A BUILD-ONCE corpus artifact
    * (same policy as the cluster-label table): clustering an
    * embedding corpus is something a pipeline does once and joins
    * everywhere, not once per consuming query — Bench reports the
    * build seconds in its `artifacts` field.
    */
  private def kmeansAssigned(s: SparkSession, dir: String): DataFrame =
    IndexArtifacts.cached(s, dir, "kmeans-cells",
      inputs = Seq(s"$dir/embeddings.parquet")) { out =>
      buildKmeansAssigned(s, dir)
        .select(col("vec_id"), col("cell"), col("d2"))
        .write.parquet(out)
    }

  /** One 2-iteration Lloyd run: centroids live on the driver between
    * iterations; each assignment is a zero-shuffle broadcast-literal
    * projection (see the kmeans def's scaladoc for the bit-parity
    * discipline).
    */
  private def buildKmeansAssigned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir).embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val seeds: Seq[(Int, Seq[Double])] = emb.filter($"vec_id" < KmeansK)
      .orderBy($"vec_id").select($"vec_id", $"v").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    def assign(cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val k = cents.size
      val base = emb.withColumn("dvv", dot($"v", $"v"))
      val withD = cents.zipWithIndex.foldLeft(base) { case (df, ((_, c), i)) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        df.withColumn(s"d$i",
          $"dvv" - lit(2.0) * dot($"v", array(c.map(lit): _*)) + lit(cc))
      }
      val mn = least((0 until k).map(i => col(s"d$i")): _*)
      // first position attaining the min == ORDER BY (d2, cell id)
      // because cents arrive in ascending cell-id order
      val pos = (1 until k).foldLeft(when(col("d0") === mn, 0)) {
        (a, i) => a.when(col(s"d$i") === mn, i)
      }
      withD.withColumn("pos", pos)
        .withColumn("cell",
          element_at(array(cents.map(x => lit(x._1)): _*), col("pos") + 1))
        .withColumn("d2",
          element_at(array((0 until k).map(i => col(s"d$i")): _*), col("pos") + 1))
        .select($"vec_id", $"v", $"cell", $"d2")
    }
    val zero = s"transform(sequence(1, $Dim), i -> 0D)"
    val cents2: Seq[(Int, Seq[Double])] = assign(seeds)
      .groupBy($"cell")
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct($"vec_id", $"v"))).as("m"))
      .withColumn("cv", expr(
        s"""transform(aggregate(transform(m, x -> x.v), $zero,
           |  (acc, x) -> zip_with(acc, x, (p, q) -> p + q)),
           |  sv -> sv / CAST(n AS DOUBLE))""".stripMargin))
      .select($"cell", $"cv").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assign(cents2)
  }

  /** IVF cell-probed ANN with a configurable, DATA-DERIVED coarse
    * quantizer: centroids are a deterministic sample of the corpus
    * (k-means-init style; a full k-means refinement would iterate the
    * same collect + reassign shape), collected to the driver and
    * embedded as exact literals. Every vector is assigned to its
    * nearest cell (argmin L2 via one dot per centroid — a zero-shuffle
    * projection), queries probe their `nprobe` highest-scoring cells
    * (multi-probe: boundary vectors near a cell edge recover the
    * neighbors a single-cell probe loses) and rank candidates by exact
    * cosine. The 100 TB shape: assignment is an embarrassingly parallel
    * scan, the probe stays a cell EQUI-join (the probe list explodes to
    * (query, cell) rows — never a containment predicate that would
    * break the hash join), and at scale you raise `numCentroids` to
    * keep cells bounded and `nprobe` to buy recall with linearly more
    * candidates.
    */
  def embedIvf(numCentroids: Int = NumCentroids, nprobe: Int = 1): QFn = { (s, dir) =>
    import s.implicits._
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cents = sampleCentroids(s, dir, numCentroids)
    require(cents.nonEmpty, "embeddings contain no centroid-sample rows")
    val k = cents.size
    val np = math.min(nprobe, k)
    def withScores(df: DataFrame): DataFrame =
      df.select(Seq($"vec_id", $"embedding", norm($"embedding").as("norm")) ++
        cents.zipWithIndex.map { case (c, i) => centroidScore(c).as(s"cs$i") }: _*)
    // the IVF index table — every vector's nearest cell, built once per
    // corpus (at scale it lives in files anyway)
    val b = IndexArtifacts.cachedIndex(s, dir, s"ivf-assign-$k",
      Seq(s"$dir/embeddings.parquet"))(withScores(Tables(s, dir).embeddings)
      .select($"vec_id", $"embedding", $"norm", cellFromScores(k).as("cell")))
    // query side: re-score only the bounded query set and keep its
    // nprobe best cells, ranked (score desc, cell asc) — for nprobe=1
    // this equals the cellFromScores assignment (same tie-break)
    val ranked = sort_array(array((0 until k).map(i =>
      struct(col(s"cs$i").as("s"), lit(-i).as("ni"))): _*), asc = false)
    val q = withScores(Tables(s, dir).embeddings.filter($"vec_id" < NumQueries))
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        $"norm".as("qn"),
        explode(transform(slice(ranked, 1, np), x => -x("ni"))).as("qcell"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_sim".desc, $"vec_id".asc)
    b.join(broadcast(q), $"cell" === $"qcell" && $"vec_id" =!= $"query_id")
      .withColumn("cos_sim", dot($"qe", $"embedding") / ($"qn" * $"norm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= IvfTopK)
      .select($"query_id", $"rank", $"cell", $"vec_id".as("neighbor_id"),
        $"cos_sim")
      .orderBy($"query_id", $"rank")
  }

  /** Random-hyperplane LSH ANN with a configurable plane count — at
    * larger corpora raise `numPlanes` so bucket populations stay
    * bounded (buckets = 2^numPlanes, uniformly filled for random data).
    */
  def embedLshAnn(numPlanes: Int = NumPlanes): QFn = { (s, dir) =>
    import s.implicits._
    val bucket = (0 until numPlanes).map { p =>
      when(planeDot(p) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    // both self-join sides re-run the plane dots otherwise; built once
    // per corpus like every other index table
    val b = IndexArtifacts.cachedIndex(s, dir, s"lsh-bucket-$numPlanes",
      Seq(s"$dir/embeddings.parquet"))(Tables(s, dir).embeddings
      .select($"vec_id", $"embedding", norm($"embedding").as("norm"),
        bucket.as("bucket")))
    val w = Window.partitionBy(col("x.vec_id"))
      .orderBy(col("cos_sim").desc, col("y.vec_id").asc)
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .withColumn("cos_sim",
        dot(col("x.embedding"), col("y.embedding")) /
          (col("x.norm") * col("y.norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("x.vec_id").as("vec_id"), col("x.bucket").as("bucket"),
        col("y.vec_id").as("neighbor_id"), col("cos_sim"))
      .orderBy(col("vec_id"))
  }

  // ------------------------------------------------------------- oracles

  /** DuckDB twin of the greedy k-center loop: round r's CTE selects the
    * argmax-of-min-distance vector against centers c1..c(r−1) via a
    * correlated min subquery, with the identical d² =
    * v·v − 2·(v·c) + c·c sequential-fold doubles as the Spark side.
    * Generated, not hand-written — [[CoresetK]] drives both engines.
    */
  private def coresetSql: String = {
    val dvvSql =
      """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
        |      (acc, x) -> acc + x)""".stripMargin
    val sb = new StringBuilder
    sb ++=
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
         |    $dvvSql AS dvv
         |  FROM embeddings),
         |c1 AS (
         |  SELECT 1 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS dist2,
         |    v, dvv AS cvv
         |  FROM e WHERE vec_id = (SELECT min(vec_id) FROM e))""".stripMargin
    for (r <- 2 to CoresetK) {
      val prev = (1 until r)
        .map(i => s"SELECT vec_id, v AS cv, cvv FROM c$i")
        .mkString(" UNION ALL ")
      sb ++=
        s""",
           |m$r AS (
           |  SELECT e.vec_id,
           |    min(e.dvv - 2.0 * (${dotSql("e.v", "c.cv")}) + c.cvv) AS mind2
           |  FROM e CROSS JOIN ($prev) c
           |  WHERE e.vec_id NOT IN (SELECT vec_id FROM ($prev))
           |  GROUP BY e.vec_id),
           |c$r AS (
           |  SELECT $r AS sel_rank, m.vec_id, m.mind2 AS dist2, e.v,
           |    e.dvv AS cvv
           |  FROM m$r m JOIN e ON e.vec_id = m.vec_id
           |  ORDER BY m.mind2 DESC, m.vec_id ASC LIMIT 1)""".stripMargin
    }
    sb ++= "\n"
    sb ++=
      s"""SELECT sel_rank, vec_id, dist2 FROM (
         |${(1 to CoresetK)
          .map(i => s"  SELECT sel_rank, vec_id, dist2 FROM c$i")
          .mkString(" UNION ALL\n")}
         |) ORDER BY sel_rank""".stripMargin
    sb.toString
  }

  private val normSql =
    """sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |  list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
      |  (acc, x) -> acc + x))""".stripMargin

  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${Dim + 1}), k -> $a[k]::DOUBLE * $b[k]::DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Exact int64 dot over two BIGINT-list expressions — the DuckDB twin
    * of [[dotLong]] (same fold the SQ8/PQ oracles inline).
    */
  private def dotLongSql(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, ${Dim + 1}), k -> $a[k] * $b[k])),
       |  (acc, v) -> acc + v)""".stripMargin

  /** [[dotSql]] over only the first `n` dims — the Matryoshka prefix
    * dot; same sequential left-fold.
    */
  private def dotPrefixSql(a: String, b: String, n: Int) =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${n + 1}), k -> $a[k]::DOUBLE * $b[k]::DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  private def planeDotSql(p: Int): String = {
    val arr = (0 until Dim).map(planeComp(p, _)).mkString(", ")
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${Dim + 1}), k -> embedding[k]::DOUBLE * ([$arr])[k])),
       |  (acc, v) -> acc + v)""".stripMargin
  }

  private val bucketSql = (0 until NumPlanes).map { p =>
    s"(CASE WHEN ${planeDotSql(p)} >= 0 THEN ${1 << p} ELSE 0 END)"
  }.mkString(" + ")

  /** Centroid half squared norm over the sampled centroid's list —
    * the same sequential left-fold the Scala side computes.
    */
  private val centHalfNorm2Sql =
    """(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |  list_transform(c.ce, x -> x::DOUBLE * x::DOUBLE)),
      |  (a, b) -> a + b) / 2.0)""".stripMargin

  /** Shared PQ oracle CTE chain (normalize → init codebooks → assign →
    * Lloyd refine → final codebooks → subspace scores `sc` → codes
    * `enc`) — the DuckDB twin of [[pqCodebook]] + [[pqEncode]], used by
    * both the flat (`llm_embed_pq`) and cell-pruned (`llm_embed_ivfpq`)
    * ADC oracles.
    */
  private val pqCtesSql: String =
    s"""cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
       |    embedding AS ce
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        WHERE vec_id % $CentroidStride = $CentroidPhase
       |        ORDER BY vec_id LIMIT $PqK)),
       |cn AS (
       |  SELECT j, list_transform(ce, x -> x::DOUBLE /
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(ce, y -> y::DOUBLE * y::DOUBLE)),
       |      (a, b) -> a + b))) AS ce
       |  FROM cents),
       |en AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE /
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)),
       |      (a, b) -> a + b))) AS embedding
       |  FROM embeddings),
       |cb0 AS (
       |  SELECT mm.m, c.j,
       |    c.ce[mm.m*$PqSubDim+1 : mm.m*$PqSubDim+$PqSubDim] AS cv
       |  FROM cn c CROSS JOIN
       |    (SELECT CAST(unnest(range($PqM)) AS INT) AS m) mm),
       |cbh0 AS (
       |  SELECT m, j, cv,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(cv, x -> x * x)),
       |      (a, b) -> a + b) / 2.0 AS hn
       |  FROM cb0),
       |sc0 AS (
       |  SELECT e.vec_id, cb.m, cb.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, ${PqSubDim + 1}),
       |        k -> e.embedding[cb.m*$PqSubDim+k] * cb.cv[k])),
       |      (acc, v) -> acc + v) - cb.hn AS s
       |  FROM en e CROSS JOIN cbh0 cb),
       |enc0 AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m
       |                         ORDER BY s DESC, j ASC) AS rk
       |    FROM sc0) WHERE rk = 1),
       |mem AS (
       |  SELECT n0.m, n0.code, count(*) AS n,
       |    list_reduce(
       |      list_prepend([CAST(0.0 AS DOUBLE) for i in range(0, $PqSubDim)],
       |        list(e.embedding[n0.m*$PqSubDim+1 : n0.m*$PqSubDim+$PqSubDim]
       |             ORDER BY n0.vec_id)),
       |      (acc, x) -> list_transform(range(1, ${PqSubDim + 1}),
       |                                 i -> acc[i] + x[i])) AS sv
       |  FROM enc0 n0 JOIN en e ON e.vec_id = n0.vec_id
       |  GROUP BY 1, 2),
       |cb1 AS (
       |  SELECT b.m, b.j,
       |    coalesce(list_transform(mem.sv, x -> x / CAST(mem.n AS DOUBLE)),
       |      b.cv) AS cv
       |  FROM cb0 b LEFT JOIN mem ON mem.m = b.m AND mem.code = b.j),
       |cbh AS (
       |  SELECT m, j, cv,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(cv, x -> x * x)),
       |      (a, b) -> a + b) / 2.0 AS hn
       |  FROM cb1),
       |sc AS (
       |  SELECT e.vec_id, cb.m, cb.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, ${PqSubDim + 1}),
       |        k -> e.embedding[cb.m*$PqSubDim+k] * cb.cv[k])),
       |      (acc, v) -> acc + v) - cb.hn AS s
       |  FROM en e CROSS JOIN cbh cb),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m
       |                         ORDER BY s DESC, j ASC) AS rk
       |    FROM sc) WHERE rk = 1)""".stripMargin

  /** The ADC score as PqM per-subspace max-CASE partial sums, folded
    * in explicit ascending-m order (the IEEE order the Spark fold
    * uses).
    */
  private val adcSumSql: String =
    (1 until PqM).foldLeft("max(CASE WHEN e.m = 0 THEN d.s END)")(
      (acc, m) => s"($acc + max(CASE WHEN e.m = $m THEN d.s END))")

  val oracles: Map[String, String] = Map(

    "llm_embed_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $normSql AS norm FROM embeddings),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn
         |  FROM e WHERE vec_id < $NumQueries),
         |p AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${dotSql("q.qe", "e.embedding")} / (q.qn * e.norm) AS cos_sim
         |  FROM e, q WHERE e.vec_id <> q.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM p)
         |SELECT query_id, CAST(rk AS INT) AS rank, neighbor_id, cos_sim
         |FROM r WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin,

    "llm_embed_ivf" ->
      s"""WITH cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
         |    embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id % $CentroidStride = $CentroidPhase
         |        ORDER BY vec_id LIMIT $NumCentroids)),
         |e AS (SELECT vec_id, embedding, $normSql AS norm FROM embeddings),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, e.norm, c.centroid_id,
         |    ${dotSql("e.embedding", "c.ce")} - $centHalfNorm2Sql AS score
         |  FROM e CROSS JOIN cent c),
         |b AS (
         |  SELECT vec_id, embedding, norm, centroid_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM scored) WHERE rk = 1),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn,
         |    cell AS qcell
         |  FROM b WHERE vec_id < $NumQueries),
         |p AS (
         |  SELECT q.query_id, b.cell AS cell, b.vec_id AS neighbor_id,
         |    ${dotSql("q.qe", "b.embedding")} / (q.qn * b.norm) AS cos_sim
         |  FROM b JOIN q ON b.cell = q.qcell AND b.vec_id <> q.query_id),
         |r AS (
         |  SELECT query_id, cell, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM p)
         |SELECT query_id, CAST(rk AS INT) AS rank, cell, neighbor_id, cos_sim
         |FROM r WHERE rk <= $IvfTopK ORDER BY 1, 2""".stripMargin,

    // multi-probe twin: queries probe their TOP-2 cells (rank over the
    // same centroid scores, lowest index on ties); each corpus vector
    // still lives in exactly one cell, so no candidate can duplicate
    "llm_embed_ivf_probe2" ->
      s"""WITH cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
         |    embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id % $CentroidStride = $CentroidPhase
         |        ORDER BY vec_id LIMIT $NumCentroids)),
         |e AS (SELECT vec_id, embedding, $normSql AS norm FROM embeddings),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, e.norm, c.centroid_id,
         |    ${dotSql("e.embedding", "c.ce")} - $centHalfNorm2Sql AS score
         |  FROM e CROSS JOIN cent c),
         |b AS (
         |  SELECT vec_id, embedding, norm, centroid_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM scored) WHERE rk = 1),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn,
         |    centroid_id AS qcell
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY score DESC, centroid_id ASC) AS crk
         |    FROM scored WHERE vec_id < $NumQueries) WHERE crk <= 2),
         |p AS (
         |  SELECT q.query_id, b.cell AS cell, b.vec_id AS neighbor_id,
         |    ${dotSql("q.qe", "b.embedding")} / (q.qn * b.norm) AS cos_sim
         |  FROM b JOIN q ON b.cell = q.qcell AND b.vec_id <> q.query_id),
         |r AS (
         |  SELECT query_id, cell, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM p)
         |SELECT query_id, CAST(rk AS INT) AS rank, cell, neighbor_id, cos_sim
         |FROM r WHERE rk <= $IvfTopK ORDER BY 1, 2""".stripMargin,

    "llm_ann_eval" ->
      s"""WITH cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
         |    embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id % $CentroidStride = $CentroidPhase
         |        ORDER BY vec_id LIMIT $NumCentroids)),
         |e AS (SELECT vec_id, embedding, $normSql AS norm FROM embeddings),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, e.norm, c.centroid_id,
         |    ${dotSql("e.embedding", "c.ce")} - $centHalfNorm2Sql AS score
         |  FROM e CROSS JOIN cent c),
         |b AS (
         |  SELECT vec_id, embedding, norm, centroid_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM scored) WHERE rk = 1),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn,
         |    cell AS qcell
         |  FROM b WHERE vec_id < $NumQueries),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${dotSql("q.qe", "e.embedding")} / (q.qn * e.norm)
         |          DESC, e.vec_id ASC) AS rk
         |    FROM e, q WHERE e.vec_id <> q.query_id)
         |  WHERE rk <= $IvfTopK),
         |ivf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, b.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${dotSql("q.qe", "b.embedding")} / (q.qn * b.norm)
         |          DESC, b.vec_id ASC) AS rk
         |    FROM b JOIN q ON b.cell = q.qcell AND b.vec_id <> q.query_id)
         |  WHERE rk <= $IvfTopK)
         |SELECT ex.query_id,
         |  CAST(count(iv.neighbor_id) AS BIGINT) AS n_hit,
         |  (1000000 * count(iv.neighbor_id)) // $IvfTopK AS recall_ppm
         |FROM exact ex LEFT JOIN ivf iv
         |  ON iv.query_id = ex.query_id AND iv.neighbor_id = ex.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_embed_lsh_ann" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $normSql AS norm,
         |    $bucketSql AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT x.vec_id AS vec_id, x.bucket AS bucket,
         |    y.vec_id AS neighbor_id,
         |    ${dotSql("x.embedding", "y.embedding")} / (x.norm * y.norm) AS cos_sim
         |  FROM b x JOIN b y
         |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT vec_id, bucket, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY vec_id
         |                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM p)
         |SELECT vec_id, bucket, neighbor_id, cos_sim
         |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // Matryoshka oracle: identical prefix fold for the candidate rank,
    // identical full fold + division for the rerank
    "llm_embed_matryoshka" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $normSql AS norm FROM embeddings),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn
         |  FROM e WHERE vec_id < $NumQueries),
         |p AS (
         |  SELECT q.query_id, e.vec_id, e.embedding, e.norm, q.qe, q.qn,
         |    ${dotPrefixSql("q.qe", "e.embedding", MatPrefix)} AS pdot
         |  FROM e, q WHERE e.vec_id <> q.query_id),
         |c AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY pdot DESC, vec_id ASC) AS crk
         |    FROM p) WHERE crk <= $MatCandidates),
         |r AS (
         |  SELECT query_id, vec_id AS neighbor_id, pdot,
         |    ${dotSql("qe", "embedding")} / (qn * norm) AS cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY ${dotSql("qe", "embedding")} / (qn * norm) DESC,
         |                                vec_id ASC) AS rk
         |  FROM c)
         |SELECT query_id, CAST(rk AS INT) AS rank, neighbor_id, pdot, cos_sim
         |FROM r WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin,

    // kNN-graph oracle: identical buckets, identical fold dot; the
    // mutual flag is the same reversed-key self-join over the edge CTE
    "llm_knn_graph" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $normSql AS norm,
         |    $bucketSql AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT x.vec_id AS src, y.vec_id AS dst,
         |    ${dotSql("x.embedding", "y.embedding")} / (x.norm * y.norm) AS cos_sim
         |  FROM b x JOIN b y
         |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src, dst, cos_sim,
         |    row_number() OVER (PARTITION BY src
         |                       ORDER BY cos_sim DESC, dst ASC) AS rk
         |  FROM p),
         |ed AS (
         |  SELECT src, CAST(rk AS INT) AS rank, dst, cos_sim
         |  FROM r WHERE rk <= $KnnK)
         |SELECT ed.src, ed.rank, ed.dst, ed.cos_sim,
         |  CAST(m.src IS NOT NULL AS INT) AS mutual
         |FROM ed LEFT JOIN (SELECT src, dst FROM ed) m
         |  ON ed.src = m.dst AND ed.dst = m.src
         |ORDER BY 1, 2""".stripMargin,

    // beam-search oracle: the IDENTICAL unrolled walk — same entry
    // set, same per-hop top-B frontier (ties by vec_id), same directed
    // edges, same sequential-fold scores — so the visited sets and
    // final top-k agree bit-for-bit
    "llm_graph_ann" -> {
      val hops = (1 to GraphHops).map { h =>
        val prev = s"v${h - 1}"
        s"""f$h AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY cos_sim DESC, vec_id ASC) AS rk
           |    FROM $prev)
           |  WHERE rk <= $GraphBeam),
           |n$h AS (
           |  SELECT DISTINCT f.query_id, ed.dst AS vec_id
           |  FROM f$h f JOIN ed ON ed.src = f.vec_id
           |  WHERE ed.dst <> f.query_id),
           |s$h AS (
           |  SELECT n.query_id, n.vec_id,
           |    ${dotSql("q.qe", "e.embedding")} / (q.qn * e.norm) AS cos_sim
           |  FROM n$h n JOIN b e ON e.vec_id = n.vec_id
           |  JOIN qs q ON q.query_id = n.query_id),
           |v$h AS (
           |  SELECT query_id, vec_id, max(cos_sim) AS cos_sim FROM (
           |    SELECT * FROM $prev UNION ALL SELECT * FROM s$h)
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $normSql AS norm,
         |    $bucketSql AS bucket
         |  FROM embeddings),
         |qs AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn
         |  FROM b WHERE vec_id < $NumQueries),
         |p AS (
         |  SELECT x.vec_id AS src, y.vec_id AS dst,
         |    ${dotSql("x.embedding", "y.embedding")} / (x.norm * y.norm) AS cos_sim
         |  FROM b x JOIN b y
         |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |ed AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      row_number() OVER (PARTITION BY src
         |                         ORDER BY cos_sim DESC, dst ASC) AS rk
         |    FROM p)
         |  WHERE rk <= $KnnK),
         |cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
         |    embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id % $CentroidStride = $CentroidPhase
         |        ORDER BY vec_id LIMIT $NumCentroids)),
         |cscore AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${dotSql("e.embedding", "c.ce")} - $centHalfNorm2Sql AS score
         |  FROM b e CROSS JOIN cent c),
         |cellof AS (
         |  SELECT vec_id, centroid_id AS cell FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM cscore) WHERE rk = 1),
         |hubs AS (
         |  SELECT cell, vec_id FROM (
         |    SELECT cell, vec_id,
         |      row_number() OVER (PARTITION BY cell ORDER BY vec_id ASC) AS hr
         |    FROM cellof) WHERE hr <= $GraphEntryPerCell),
         |qc AS (
         |  SELECT vec_id AS query_id, centroid_id AS qcell FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM cscore WHERE vec_id < $NumQueries)
         |  WHERE rk <= $GraphProbeCells),
         |v0 AS (
         |  SELECT q.query_id, e.vec_id,
         |    ${dotSql("q.qe", "e.embedding")} / (q.qn * e.norm) AS cos_sim
         |  FROM (SELECT DISTINCT qc.query_id, h.vec_id
         |        FROM qc JOIN hubs h ON h.cell = qc.qcell
         |        WHERE h.vec_id <> qc.query_id) n
         |  JOIN b e ON e.vec_id = n.vec_id
         |  JOIN qs q ON q.query_id = n.query_id),
         |$hops
         |SELECT query_id, CAST(rk AS INT) AS rank, vec_id AS neighbor_id,
         |  cos_sim
         |FROM (
         |  SELECT query_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id ASC) AS rk
         |  FROM v$GraphHops)
         |WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin
    },

    // PQ oracle: same sampled codebooks, same e·c − ||c||²/2 kernel per
    // subspace (folds over the identical floats in the identical
    // order), argmax encoding with the same lowest-j tie-break, ADC
    // sum folded in explicit m order (each per-m term is a single row,
    // so max(CASE) extracts it exactly)
    "llm_embed_pq" ->
      s"""WITH $pqCtesSql,
         |adc AS (
         |  SELECT d.vec_id AS query_id, e.vec_id, $adcSumSql AS adc_score
         |  FROM enc e JOIN sc d
         |    ON d.m = e.m AND d.j = e.code AND d.vec_id < $NumQueries
         |  WHERE e.vec_id <> d.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, CAST(rk AS INT) AS rank, vec_id AS neighbor_id,
         |  adc_score
         |FROM (SELECT query_id, vec_id, adc_score,
         |        row_number() OVER (PARTITION BY query_id
         |                           ORDER BY adc_score DESC, vec_id ASC) AS rk
         |      FROM adc)
         |WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin,

    // the PQ chain plus normalized-space IVF cells: the ADC join is
    // RESTRICTED to code rows whose cell is among the query's probed
    // top-2 cells
    "llm_embed_ivfpq" ->
      s"""WITH $pqCtesSql,
         |centi AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
         |      AS centroid_id,
         |    embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id % $CentroidStride = $CentroidPhase
         |        ORDER BY vec_id LIMIT $NumCentroids)),
         |cni AS (
         |  SELECT centroid_id, list_transform(ce, x -> x::DOUBLE /
         |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(ce, y -> y::DOUBLE * y::DOUBLE)),
         |      (a, b) -> a + b))) AS ce
         |  FROM centi),
         |csc AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${dotSql("e.embedding", "c.ce")} -
         |    (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |       list_transform(c.ce, x -> x * x)),
         |       (a, b) -> a + b) / 2.0) AS score
         |  FROM en e CROSS JOIN cni c),
         |cellb AS (
         |  SELECT vec_id, centroid_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM csc) WHERE rk = 1),
         |qp AS (
         |  SELECT vec_id AS query_id, centroid_id AS qcell FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM csc WHERE vec_id < $NumQueries) WHERE rk <= 2),
         |adc AS (
         |  SELECT d.vec_id AS query_id, e.vec_id, cb.cell AS cell,
         |    $adcSumSql AS adc_score
         |  FROM enc e
         |  JOIN sc d ON d.m = e.m AND d.j = e.code
         |    AND d.vec_id < $NumQueries
         |  JOIN cellb cb ON cb.vec_id = e.vec_id
         |  JOIN qp ON qp.query_id = d.vec_id AND qp.qcell = cb.cell
         |  WHERE e.vec_id <> d.vec_id
         |  GROUP BY 1, 2, 3)
         |SELECT query_id, CAST(rk AS INT) AS rank, cell,
         |  vec_id AS neighbor_id, adc_score
         |FROM (SELECT query_id, vec_id, cell, adc_score,
         |        row_number() OVER (PARTITION BY query_id
         |                           ORDER BY adc_score DESC, vec_id ASC) AS rk
         |      FROM adc)
         |WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin,


    "llm_hard_negatives" ->
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding, $normSql AS norm
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS query_id, label AS q_label,
         |    embedding AS qe, norm AS qn
         |  FROM b WHERE vec_id < $NumQueries),
         |sc AS (
         |  SELECT q.query_id, q.q_label, b.vec_id, b.label,
         |    ${dotSql("q.qe", "b.embedding")} / (q.qn * b.norm) AS cos_sim
         |  FROM b, q
         |  WHERE b.vec_id <> q.query_id AND b.label <> q.q_label)
         |SELECT query_id, q_label, CAST(rk AS INT) AS rank,
         |  vec_id AS negative_id, label AS neg_label, cos_sim
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos_sim DESC, vec_id ASC) AS rk FROM sc)
         |WHERE rk <= $TopK ORDER BY 1, 3""".stripMargin,

    "llm_knn_label_eval" ->
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding, $normSql AS norm,
         |    $bucketSql AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT x.vec_id AS src, x.label AS label, y.label AS nn_label,
         |    ${dotSql("x.embedding", "y.embedding")} / (x.norm * y.norm)
         |      AS cos_sim,
         |    y.vec_id AS dst
         |  FROM b x JOIN b y
         |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |nn AS (
         |  SELECT label, nn_label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src
         |      ORDER BY cos_sim DESC, dst ASC) AS rk FROM p)
         |  WHERE rk = 1)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_eval,
         |  CAST(sum(CASE WHEN label = nn_label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST(sum(CASE WHEN label = nn_label THEN 1 ELSE 0 END) * 1000000 //
         |    count(*) AS BIGINT) AS acc_ppm
         |FROM nn GROUP BY label ORDER BY label""".stripMargin,

    "llm_embed_sq8" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $normSql AS norm,
         |    ${sq8Sql("embedding")}
         |      AS qv
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn, qv AS qqv
         |  FROM b WHERE vec_id < $NumQueries),
         |c AS (
         |  SELECT q.query_id, q.qe, q.qn, b.vec_id, b.embedding, b.norm,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, ${Dim + 1}), k -> q.qqv[k] * b.qv[k])),
         |      (acc, x) -> acc + x) AS qdot
         |  FROM b, q WHERE b.vec_id <> q.query_id),
         |cand AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY qdot DESC, vec_id ASC) AS crk
         |    FROM c) WHERE crk <= $Sq8Candidates),
         |r AS (
         |  SELECT query_id, vec_id AS neighbor_id, qdot,
         |    ${dotSql("qe", "embedding")} / (qn * norm) AS cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY ${dotSql("qe", "embedding")} / (qn * norm) DESC,
         |                                vec_id ASC) AS rk
         |  FROM cand)
         |SELECT query_id, CAST(rk AS INT) AS rank, neighbor_id, qdot, cos_sim
         |FROM r WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin,

    "llm_hybrid_rrf" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $normSql AS norm,
         |    ${sq8Sql("embedding")}
         |      AS qv
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe, norm AS qn, qv AS qqv
         |  FROM b WHERE vec_id < $NumQueries),
         |sc AS (
         |  SELECT q.query_id, b.vec_id,
         |    ${dotSql("q.qe", "b.embedding")} / (q.qn * b.norm) AS cos_sim,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, ${Dim + 1}), k -> q.qqv[k] * b.qv[k])),
         |      (acc, x) -> acc + x) AS qdot
         |  FROM b, q WHERE b.vec_id <> q.query_id),
         |r AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id ASC) AS r_cos,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY qdot DESC, vec_id ASC) AS r_q
         |  FROM sc),
         |tc AS (SELECT query_id, vec_id, CAST(r_cos AS INT) AS r_cos
         |       FROM r WHERE r_cos <= $TopK),
         |tq AS (SELECT query_id, vec_id, CAST(r_q AS INT) AS r_q
         |       FROM r WHERE r_q <= $TopK),
         |f AS (
         |  SELECT coalesce(tc.query_id, tq.query_id) AS query_id,
         |    coalesce(tc.vec_id, tq.vec_id) AS vec_id, tc.r_cos, tq.r_q,
         |    coalesce(CAST(1.0 AS DOUBLE) / CAST($RrfK + tc.r_cos AS DOUBLE),
         |             CAST(0.0 AS DOUBLE)) +
         |    coalesce(CAST(1.0 AS DOUBLE) / CAST($RrfK + tq.r_q AS DOUBLE),
         |             CAST(0.0 AS DOUBLE)) AS rrf
         |  FROM tc FULL OUTER JOIN tq
         |    ON tc.query_id = tq.query_id AND tc.vec_id = tq.vec_id)
         |SELECT query_id, CAST(rk AS INT) AS rank, vec_id AS neighbor_id,
         |  r_cos, r_q, rrf
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY rrf DESC, vec_id ASC) AS rk
         |  FROM f)
         |WHERE rk <= $TopK ORDER BY 1, 2""".stripMargin,

    "llm_semantic_dedup" ->
      s"""WITH cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
         |    embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id % $CentroidStride = $CentroidPhase
         |        ORDER BY vec_id LIMIT $NumCentroids)),
         |e AS (SELECT vec_id, embedding, $normSql AS norm FROM embeddings),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, e.norm, c.centroid_id,
         |    ${dotSql("e.embedding", "c.ce")} - $centHalfNorm2Sql AS score
         |  FROM e CROSS JOIN cent c),
         |b AS (
         |  SELECT vec_id, embedding, norm, centroid_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY score DESC, centroid_id ASC) AS rk
         |    FROM scored) WHERE rk = 1),
         |pr AS (
         |  SELECT DISTINCT y.vec_id AS vec_id
         |  FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  WHERE ${dotSql("x.embedding", "y.embedding")} / (x.norm * y.norm)
         |        >= $SemDedupTau)
         |SELECT b.vec_id, b.cell, (pr.vec_id IS NULL) AS keep
         |FROM b LEFT JOIN pr ON b.vec_id = pr.vec_id
         |ORDER BY b.vec_id""".stripMargin,

    // two unrolled Lloyd iterations; distances use the same
    // d² = v·v − 2·v·c + c·c expansion (each dot an identical
    // sequential fold) as the Spark side, so every assignment,
    // centroid and SSE bit matches
    "llm_embed_kmeans" ->
      s"""WITH $kmeansAssignSql
         |SELECT c AS cell, CAST(count(*) AS BIGINT) AS n_members,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(d2 ORDER BY vec_id)), (acc, x) -> acc + x) AS sse
         |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_cluster_balanced_sample" ->
      s"""WITH $kmeansAssignSql,
         |per AS (
         |  SELECT c AS cell, CAST(count(*) AS BIGINT) AS n_members
         |  FROM a2 GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n_members) AS BIGINT) AS n_total,
         |    CAST(count(*) AS BIGINT) AS n_cells FROM per),
         |rates AS (
         |  SELECT cell, n_members,
         |    (n_total // 2) // n_cells AS quota,
         |    least(CAST(1000000 AS BIGINT),
         |      ((n_total // 2) // n_cells) * 1000000 // n_members) AS rate_ppm
         |  FROM per, tot)
         |SELECT r.cell, r.n_members, r.quota, r.rate_ppm,
         |  CAST(sum(CASE WHEN
         |    ${TextOps.hash32Sql(s"'cbs:' || CAST(a2.vec_id AS VARCHAR)")}
         |      % 1000000 < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM a2 JOIN rates r ON a2.c = r.cell
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    // the CTE chain mirrors the greedy rounds — see [[coresetSql]]
    "llm_coreset_sample" -> coresetSql,

    // same moment identity as the Spark side: Σ_b d²(a,b) =
    // n·(a·a) − 2·a·Σb + Σ(b·b), all exact int64 over SQ8 codes
    "llm_cluster_medoids" ->
      s"""WITH $kmeansAssignSql,
         |qv AS (
         |  SELECT vec_id, ${sq8Sql("embedding")} AS qv
         |  FROM embeddings),
         |mem AS (
         |  SELECT a2.vec_id, a2.c AS cell, qv.qv,
         |    ${dotLongSql("qv.qv", "qv.qv")} AS qq
         |  FROM a2 JOIN qv ON qv.vec_id = a2.vec_id),
         |mom AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
         |    CAST(sum(qq) AS BIGINT) AS sqq,
         |    list_reduce(
         |      list_prepend([CAST(0 AS BIGINT) for i in range(0, $Dim)],
         |        list(qv ORDER BY vec_id)),
         |      (acc, x) -> list_transform(range(1, ${Dim + 1}),
         |                                 i -> acc[i] + x[i])) AS sv
         |  FROM mem GROUP BY cell),
         |scored AS (
         |  SELECT m.cell, o.n_members, m.vec_id,
         |    o.n_members * m.qq - 2 * ${dotLongSql("m.qv", "o.sv")} + o.sqq
         |      AS s_d2
         |  FROM mem m JOIN mom o ON o.cell = m.cell)
         |SELECT cell, n_members, vec_id AS medoid_vec_id,
         |  CAST(s_d2 AS BIGINT) AS sum_d2
         |FROM (SELECT *, row_number() OVER (PARTITION BY cell
         |        ORDER BY s_d2, vec_id) AS rn FROM scored)
         |WHERE rn = 1 ORDER BY cell""".stripMargin
  )

  /** Shared CTE chain of the 2-iteration Lloyd oracle — per-vector
    * final assignment in `a2 (vec_id, c, d2)`; the DuckDB twin of
    * [[kmeansAssigned]]. Keep the pair in lockstep.
    */
  private def kmeansAssignSql: String =
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ev AS (SELECT vec_id, v, ${dotSql("v", "v")} AS dvv FROM e),
       |c0 AS (
       |  SELECT CAST(vec_id AS INT) AS c, v AS cv, ${dotSql("v", "v")} AS cc
       |  FROM e WHERE vec_id < $KmeansK),
       |a1p AS (
       |  SELECT ev.vec_id, ev.v, c0.c,
       |    ev.dvv - 2.0 * ${dotSql("ev.v", "c0.cv")} + c0.cc AS d2
       |  FROM ev CROSS JOIN c0),
       |a1 AS (
       |  SELECT vec_id, v, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d2, c) AS rn
       |    FROM a1p) WHERE rn = 1),
       |c1 AS (
       |  SELECT c, count(*) AS n,
       |    list_reduce(
       |      list_prepend([CAST(0.0 AS DOUBLE) for i in range(0, $Dim)],
       |        list(v ORDER BY vec_id)),
       |      (acc, x) -> list_transform(range(1, ${Dim + 1}),
       |                                 i -> acc[i] + x[i])) AS sv
       |  FROM a1 GROUP BY c),
       |c2 AS (
       |  SELECT c, list_transform(sv, x -> x / CAST(n AS DOUBLE)) AS cv
       |  FROM c1),
       |c2c AS (SELECT c, cv, ${dotSql("cv", "cv")} AS cc FROM c2),
       |a2p AS (
       |  SELECT ev.vec_id, t.c,
       |    ev.dvv - 2.0 * ${dotSql("ev.v", "t.cv")} + t.cc AS d2
       |  FROM ev CROSS JOIN c2c t),
       |a2 AS (
       |  SELECT vec_id, c, d2 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d2, c) AS rn
       |    FROM a2p) WHERE rn = 1)""".stripMargin
}
