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

  private def planeDot(p: Int): Column =
    dot(col("embedding"), array((0 until Dim).map(d => lit(planeCompVal(p, d))): _*))

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

    // --- random-hyperplane LSH bucketed ANN -----------------------------
    "llm_embed_lsh_ann" -> { (s, dir) =>
      import s.implicits._
      val bucket = (0 until NumPlanes).map { p =>
        when(planeDot(p) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val b = Tables(s, dir).embeddings
        .select($"vec_id", $"embedding", norm($"embedding").as("norm"),
          bucket.as("bucket"))
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
