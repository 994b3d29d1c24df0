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

  /** LCG seed for IVF centroid component (c, d) — distinct multiplier
    * from the hyperplane LCG so the two structures are independent.
    */
  def centroidSeed(c: Int, d: Int): Long =
    (69069L * (c.toLong * Dim + d + 1) + 12345L) % 2147483648L

  /** Exact dyadic centroid component, identical in Scala and SQL. */
  private def centroidVal(c: Int, d: Int): Double =
    centroidSeed(c, d).toDouble / 2147483648.0 - 0.5

  /** Half squared norm of centroid c, as the sequential left-fold both
    * engines compute (`0.0 + x0² + x1² + …` then / 2).
    */
  private def centroidHalfNorm2(c: Int): Double =
    (0 until Dim).foldLeft(0.0)((a, d) => a + centroidVal(c, d) * centroidVal(c, d)) / 2.0

  /** SQL fragment for hyperplane component (p, d): exact in both
    * engines.
    */
  private def planeComp(p: Int, d: Int): String =
    s"(CAST(${planeSeed(p, d)} AS DOUBLE) / 2147483648.0 - 0.5)"

  private def centroidComp(c: Int, d: Int): String =
    s"(CAST(${centroidSeed(c, d)} AS DOUBLE) / 2147483648.0 - 0.5)"

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

  private def planeDot(p: Int): Column =
    dot(col("embedding"), array((0 until Dim).map(d => lit(planeCompVal(p, d))): _*))

  /** IVF assignment score for centroid c: `e·c − ||c||²/2` — argmax
    * over c is the nearest-centroid (argmin L2) assignment, in one dot
    * per centroid.
    */
  private def centroidScore(c: Int): Column =
    dot(col("embedding"),
      array((0 until Dim).map(d => lit(centroidVal(c, d))): _*)) -
      lit(centroidHalfNorm2(c))

  /** Nearest-centroid cell id over pre-computed score columns cs0..csN
    * with deterministic lowest-index tie-break (same greatest+CASE
    * shape as the oracle).
    */
  private def cellFromScores: Column = {
    val mx = greatest((0 until NumCentroids).map(c => col(s"cs$c")): _*)
    (1 until NumCentroids).foldLeft(
      when(col("cs0") === mx, 0)) { (acc, c) => acc.when(col(s"cs$c") === mx, c) }
  }

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
    // Coarse quantizer: 8 fixed centroids; every vector is assigned to
    // its nearest cell (argmin L2 via one dot per centroid), queries
    // probe their own cell and rank candidates by exact cosine. The
    // 100 TB shape: assignment is an embarrassingly parallel scan, the
    // probe is a cell equi-join (bucketed, never all-pairs), and at
    // scale you raise NumCentroids to keep cells bounded.
    "llm_embed_ivf" -> { (s, dir) =>
      import s.implicits._
      val scored = Tables(s, dir).embeddings
        .select(Seq($"vec_id", $"embedding", norm($"embedding").as("norm")) ++
          (0 until NumCentroids).map(c => centroidScore(c).as(s"cs$c")): _*)
      // persisted: the probe side and the broadcast query side both
      // consume the assignment, which costs 8 centroid dots per vector
      val b = scored.select($"vec_id", $"embedding", $"norm",
        cellFromScores.as("cell")).persist()
      val q = b.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm".as("qn"), $"cell".as("qcell"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"vec_id".asc)
      b.join(broadcast(q), $"cell" === $"qcell" && $"vec_id" =!= $"query_id")
        .withColumn("cos_sim", dot($"qe", $"embedding") / ($"qn" * $"norm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= IvfTopK)
        .select($"query_id", $"rank", $"cell", $"vec_id".as("neighbor_id"),
          $"cos_sim")
        .orderBy($"query_id", $"rank")
    },

    // --- random-hyperplane LSH bucketed ANN -----------------------------
    "llm_embed_lsh_ann" -> { (s, dir) =>
      import s.implicits._
      val bucket = (0 until NumPlanes).map { p =>
        when(planeDot(p) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val b = Tables(s, dir).embeddings
        .select($"vec_id", $"embedding", norm($"embedding").as("norm"),
          bucket.as("bucket"))
        .persist() // both self-join sides re-run the 6 plane dots otherwise
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
  )

  // ------------------------------------------------------------- oracles

  private val normSql =
    """sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |  list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
      |  (acc, x) -> acc + x))""".stripMargin

  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${Dim + 1}), k -> $a[k]::DOUBLE * $b[k]::DOUBLE)),
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

  private def centroidScoreSql(c: Int): String = {
    val arr = (0 until Dim).map(centroidComp(c, _)).mkString(", ")
    s"""(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${Dim + 1}), k -> embedding[k]::DOUBLE * ([$arr])[k])),
       |  (acc, v) -> acc + v)
       | - (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform([$arr], x -> x * x)), (a, b) -> a + b) / 2.0))""".stripMargin
  }

  private val ivfScoresSql = (0 until NumCentroids)
    .map(c => s"${centroidScoreSql(c)} AS cs$c").mkString(",\n    ")

  private val ivfMaxSql =
    "greatest(" + (0 until NumCentroids).map(c => s"cs$c").mkString(", ") + ")"

  private val ivfCellSql = "CASE " + (0 until NumCentroids).map { c =>
    s"WHEN cs$c = mx THEN $c"
  }.mkString(" ") + " END"

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
      s"""WITH scored AS (
         |  SELECT vec_id, embedding, $normSql AS norm,
         |    $ivfScoresSql
         |  FROM embeddings),
         |b AS (
         |  SELECT vec_id, embedding, norm, $ivfCellSql AS cell
         |  FROM (SELECT *, $ivfMaxSql AS mx FROM scored)),
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
         |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin
  )
}
