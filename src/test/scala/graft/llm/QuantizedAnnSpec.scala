package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Behavior tests for the round-6 similarity operators: SQ8 recall
  * against the exact brute-force baseline, and an independent
  * brute-force verification of the semantic-dedup keep/prune decisions.
  */
class QuantizedAnnSpec extends SparkSuite {

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def cosMap(): Map[(Long, Long), Double] = {
    val v = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    (for (a <- v.keys; b <- v.keys if a != b)
      yield (a, b) -> cos(v(a), v(b))).toMap
  }

  test("hard negatives: exact driver recompute; every negative crosses class") {
    import graft.SparkSuite.spark.implicits._
    val rows = SimilarityQueries.defs("llm_hard_negatives")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val labels = embs.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    val cos = cosMap()
    val k = SimilarityQueries.TopK
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == SimilarityQueries.NumQueries)
    byQ.foreach { case (qid, rs) =>
      rs.foreach { r =>
        assert(r.getAs[Int]("neg_label") != r.getAs[Int]("q_label"),
          s"query $qid rank ${r.getAs[Int]("rank")}: same-class negative")
      }
      val expected = labels.keys
        .filter(v => v != qid && labels(v) != labels(qid))
        .toSeq.map(v => (v, cos((qid, v))))
        .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
      assert(rs.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("negative_id")).toSeq == expected, s"query $qid")
    }
  }

  test("knn label eval: consistent with the knn graph's rank-1 edges") {
    import graft.SparkSuite.spark.implicits._
    val eval = SimilarityQueries.defs("llm_knn_label_eval")(spark, sfDir)
      .collect()
    assert(eval.nonEmpty)
    val labels = embs.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    // independent path: the published kNN graph's rank-1 edges carry
    // the same bucketed-1-NN decision
    val nn1 = SimilarityQueries.defs("llm_knn_graph")(spark, sfDir)
      .filter($"rank" === 1)
      .select($"src", $"dst").as[(Long, Long)].collect()
    val expected = nn1.groupBy(e => labels(e._1)).view.mapValues { es =>
      (es.length.toLong, es.count(e => labels(e._1) == labels(e._2)).toLong)
    }.toMap
    assert(eval.length == expected.size)
    eval.foreach { r =>
      val (nEval, nCorrect) = expected(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_eval") == nEval)
      assert(r.getAs[Long]("n_correct") == nCorrect)
      assert(r.getAs[Long]("acc_ppm") == nCorrect * 1000000L / nEval)
    }
    // the synthetic labels carry no geometric structure (agreement sits
    // AT the 1/|labels| chance floor — which is exactly what this eval
    // exists to expose); only sanity-bound the rate here
    val tot = expected.values.map(_._1).sum
    val cor = expected.values.map(_._2).sum
    assert(cor >= 0 && cor <= tot)
  }

  test("medoids: a brute-force within-cell all-pairs recompute matches") {
    import graft.SparkSuite.spark.implicits._
    val rows = SimilarityQueries.defs("llm_cluster_medoids")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // independent truth: quantize, assign via the published kmeans
    // query's cell output, then literal Σ_b d²(a,b) per member
    val cellOf = SimilarityQueries.defs("llm_embed_kmeans")(spark, sfDir)
      .select($"cell").as[Int].collect() // just to touch the artifact
    val assigned = graft.llm.IndexArtifacts
      .cached(spark, sfDir, "kmeans-cells",
        inputs = Seq(s"$sfDir/embeddings.parquet"))(_ =>
        fail("kmeans-cells artifact must already exist"))
      .select($"vec_id", $"cell").as[(Long, Int)].collect()
    val qv = embs.select($"vec_id",
        transform($"embedding", x =>
          floor(x.cast("double") * lit(200.0)).cast("long")).as("q"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, q) => id -> q.toArray }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byCell = assigned.groupBy(_._2)
    assert(rows.length == byCell.size)
    rows.foreach { r =>
      val members = byCell(r.getAs[Int]("cell")).map(_._1)
      assert(r.getAs[Long]("n_members") == members.length)
      val best = members.map(a =>
          (members.map(b => d2(qv(a), qv(b))).sum, a))
        .minBy(identity)
      assert(r.getAs[Long]("medoid_vec_id") == best._2,
        s"cell ${r.getAs[Int]("cell")}")
      assert(r.getAs[Long]("sum_d2") == best._1)
    }
    assert(cellOf.nonEmpty)
  }

  test("sq8: quantized-scan candidates + exact rerank recover the exact top-k") {
    import graft.SparkSuite.spark.implicits._
    val exact = SimilarityQueries.defs("llm_embed_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val sq8 = SimilarityQueries.defs("llm_embed_sq8")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(sq8.keySet == exact.keySet)
    // 200-level quantization on 64 dims keeps the true top-k inside the
    // 3k-candidate set essentially always; require >= 90% overall recall
    val (hit, total) = exact.foldLeft((0, 0)) { case ((h, t), (q, ids)) =>
      (h + ids.intersect(sq8(q)).size, t + ids.size)
    }
    assert(hit.toDouble / total >= 0.9, s"sq8 recall $hit/$total")
  }

  test("matryoshka: prefix-dim candidates + exact rerank recover most of the top-k") {
    // at sf0.001 the corpus is 50 vectors and the 30-candidate set is
    // most of it — measure where candidate selection actually selects
    val dir = "/root/testdata/sf0.01"
    val exact = SimilarityQueries.defs("llm_embed_topk")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val mat = SimilarityQueries.defs("llm_embed_matryoshka")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(mat.keySet == exact.keySet)
    // these fixtures are not Matryoshka-trained, so the half-dim
    // prefix carries only ~half the signal; the rerank still has to
    // beat chance (TopK/corpus = 2%) by a wide margin
    val (hit, total) = exact.foldLeft((0, 0)) { case ((h, t), (q, ids)) =>
      (h + ids.intersect(mat(q)).size, t + ids.size)
    }
    assert(hit.toDouble / total >= 0.5, s"matryoshka recall $hit/$total")
  }

  test("sq8: ranks are dense and cos_sim is non-increasing per query") {
    val rows = SimilarityQueries.defs("llm_embed_sq8")(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("pq: ADC ranking recovers a meaningful share of the exact top-k") {
    // at sf0.001 the deterministic centroid sample yields only 3
    // codebook entries — a degenerate quantizer; measure recall where
    // the full 8-subspace × 16-entry codebook exists
    val dir = "/root/testdata/sf0.01"
    val exact = SimilarityQueries.defs("llm_embed_topk")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val pq = SimilarityQueries.defs("llm_embed_pq")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(pq.keySet == exact.keySet)
    // an 8×16 Lloyd-refined codebook is still a coarse quantizer on
    // near-random fixture vectors; the floor catches a broken kernel
    // (recall ~ random = TopK/corpus = 2%), not certifies retrieval
    // quality
    val (hit, total) = exact.foldLeft((0, 0)) { case ((h, t), (q, ids)) =>
      (h + ids.intersect(pq(q)).size, t + ids.size)
    }
    assert(hit.toDouble / total >= 0.25, s"pq recall $hit/$total")
  }

  test("pq: ranks are dense and adc_score is non-increasing per query") {
    val rows = SimilarityQueries.defs("llm_embed_pq")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val sc = sorted.map(_.getAs[Double]("adc_score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
  }

  test("graph ann: every result is graph-reachable or an entry, scores exact, recall nonzero") {
    import graft.SparkSuite.spark.implicits._
    val cos = cosMap()
    val rows = SimilarityQueries.defs("llm_graph_ann")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // scores are the exact cosine (same fold the driver twin computes)
    rows.foreach { case (q, _, n, s) =>
      assert(math.abs(s - cos((q, n))) < 1e-9, s"score for ($q,$n)")
    }
    // ranks dense, scores non-increasing per query
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.size))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true })
    }
    // recall vs the exact top-k: the walk must find a nonzero share
    // (untrained random fixtures bound how navigable the graph is)
    val k = SimilarityQueries.TopK
    val exact = cos.keys.map(_._1).toSeq.distinct
      .filter(_ < SimilarityQueries.NumQueries).map { q =>
        q -> cos.filter(_._1._1 == q).toSeq.sortBy { case ((_, b), s) => (-s, b) }
          .take(k).map(_._1._2).toSet
      }.toMap
    val hits = rows.groupBy(_._1).map { case (q, rs) =>
      rs.map(_._3).count(exact(q))
    }.sum
    assert(hits > 0, "graph walk found none of the exact top-k")
  }

  test("ann eval: recall rows recompute from the underlying operators") {
    val rows = SimilarityQueries.defs("llm_ann_eval")(spark, sfDir).collect()
    val k = SimilarityQueries.IvfTopK
    assert(rows.nonEmpty)
    val exact = SimilarityQueries.defs("llm_embed_topk")(spark, sfDir)
      .filter(col("rank") <= k).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = SimilarityQueries.defs("llm_embed_ivf")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val hits = exact(q).intersect(ivf.getOrElse(q, Set.empty)).size.toLong
      assert(r.getAs[Long]("n_hit") == hits, s"query $q")
      assert(r.getAs[Long]("recall_ppm") == 1000000L * hits / k)
    }
  }

  test("rrf: scores recompute exactly from the member ranks and ranks are dense") {
    val k = SimilarityQueries.RrfK
    val rows = SimilarityQueries.defs("llm_hybrid_rrf")(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
    }
    rows.foreach { r =>
      def term(f: String): Double =
        if (r.isNullAt(r.fieldIndex(f))) 0.0
        else 1.0 / (k + r.getAs[Int](f)).toDouble
      assert(r.getAs[Double]("rrf") == term("r_cos") + term("r_q"))
      // a fused member must come from at least one system's top-k
      assert(!r.isNullAt(r.fieldIndex("r_cos")) || !r.isNullAt(r.fieldIndex("r_q")))
    }
    // a doc ranked top by BOTH systems must be fused rank 1
    rows.filter(r => !r.isNullAt(r.fieldIndex("r_cos")) &&
        !r.isNullAt(r.fieldIndex("r_q")) &&
        r.getAs[Int]("r_cos") == 1 && r.getAs[Int]("r_q") == 1)
      .foreach(r => assert(r.getAs[Int]("rank") == 1))
  }

  test("semantic dedup: prune decisions match brute-force within-cell cosine") {
    val out = SimilarityQueries.defs("llm_semantic_dedup")(spark, sfDir).collect()
    val cellOf = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val cos = cosMap()
    val tau = SimilarityQueries.SemDedupTau
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val hasEarlierNeighbor = cellOf.exists { case (other, c) =>
        other < id && c == cellOf(id) && cos((other, id)) >= tau
      }
      assert(r.getAs[Boolean]("keep") == !hasEarlierNeighbor,
        s"vec $id keep=${r.getAs[Boolean]("keep")} but earlier-neighbor=$hasEarlierNeighbor")
    }
    // the threshold flags a meaningful, strict subset on the fixture
    val pruned = out.count(!_.getAs[Boolean]("keep"))
    assert(pruned > 0 && pruned < out.length, s"pruned=$pruned")
  }

  test("ivfpq: cell pruning agrees with flat PQ scores and keeps useful recall") {
    val dir = "/root/testdata/sf0.01"
    val ivfpq = SimilarityQueries.defs("llm_embed_ivfpq")(spark, dir).collect()
    assert(ivfpq.nonEmpty)
    // ranks dense, scores non-increasing
    ivfpq.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val sc = sorted.map(_.getAs[Double]("adc_score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
    // the ADC kernel is THE SAME as flat PQ: any (query, neighbor)
    // pair both operators rank must carry a bit-identical score
    val flat = SimilarityQueries.defs("llm_embed_pq")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("adc_score")).toMap
    val shared = ivfpq.flatMap { r =>
      flat.get((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .map(s => (r.getAs[Double]("adc_score"), s))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b))
    }
    // cell pruning costs recall vs flat PQ but must stay far above
    // random (TopK/corpus = 2%): the probe keeps the query's own
    // neighborhood cells
    val exact = SimilarityQueries.defs("llm_embed_topk")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val got = ivfpq.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val (hit, total) = exact.foldLeft((0, 0)) { case ((h, t), (q, ids)) =>
      (h + ids.intersect(got.getOrElse(q, Set.empty)).size, t + ids.size)
    }
    assert(hit.toDouble / total >= 0.15, s"ivfpq recall $hit/$total")
  }
}
