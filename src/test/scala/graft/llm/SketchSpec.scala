package graft.llm

import graft.SparkSuite

/** Behavior specs for the frequency-sketch and weighted-sampling
  * operators ([[SketchQueries]]).
  */
class SketchSpec extends SparkSuite {

  test("heavy hitters: CMS one-sided error holds and the audit is complete") {
    val rows = SketchQueries.defs("llm_heavy_hitters")(spark, sfDir).collect()
    assert(rows.length == SketchQueries.CmsTopK)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      // the defining CMS guarantee: never an underestimate
      assert(est >= exact, s"${r.getAs[String]("term")}: est $est < exact $exact")
      assert(r.getAs[Long]("overest") == est - exact)
    }
    // D=4, W=256 must resolve the fixture's heavy hitters with small
    // relative error — the sizing the audit exists to validate
    val maxErr = rows.map(_.getAs[Double]("err_frac")).max
    assert(maxErr < 0.5, s"max err_frac $maxErr — sketch too small")
  }

  test("heavy hitters: a wider sketch never increases the estimate") {
    import graft.SparkSuite.spark.implicits._
    import org.apache.spark.sql.functions._
    import TextOps._
    // rebuild the estimate at W and 4W for one known-heavy term; CMS
    // estimates are monotone non-increasing in width (fewer collisions)
    val posts = graft.Tables(spark, sfDir).documents
      .select(explode(tokens($"text")).as("term"))
    val heavy = posts.groupBy($"term").count()
      .orderBy($"count".desc, $"term").limit(1)
      .collect().head.getString(0)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    def est(width: Int): Long =
      (0 until SketchQueries.CmsDepth).map { r =>
        posts.filter(
          hash32(concat(lit(s"cms$r:"), $"term")) % width ===
            lit(h32(s"cms$r:$heavy") % width))
          .count()
      }.min
    assert(est(4 * SketchQueries.CmsWidth) <= est(SketchQueries.CmsWidth))
  }

  test("join-size estimate: one-sided and within CMS error of the exact count") {
    val r = SketchQueries.defs("llm_join_size_est")(spark, sfDir)
      .collect().head
    val exact = r.getAs[Long]("exact_n")
    val est = r.getAs[Long]("cms_est")
    assert(exact > 0)
    // the CMS inner product never underestimates (all cross terms ≥ 0)
    assert(est >= exact, s"est $est < exact $exact")
    assert(r.getAs[Long]("overest") == est - exact)
    // W=256 must resolve the fixture's join size usefully: the whole
    // point is a planning statistic, not an order-of-magnitude guess
    assert(est < 2 * exact, s"est $est vs exact $exact — sketch too small")
  }

  test("kmv overlap: a driver-side sketch recompute matches every pair") {
    import graft.SparkSuite.spark.implicits._
    import org.apache.spark.sql.functions._
    import TextOps._
    val rows = SketchQueries.defs("llm_kmv_overlap")(spark, sfDir).collect()
    val K = SketchQueries.KmvK
    // per-source hashed vocabularies, recomputed independently
    val vocab: Map[String, Set[Long]] = graft.Tables(spark, sfDir).documents
      .select($"source", explode(tokens($"text")).as("tok"))
      .select($"source", hash32($"tok").as("h")).distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sketches = vocab.view.mapValues(_.toSeq.sorted.take(K)).toMap
    val nPairs = vocab.size * (vocab.size - 1) / 2
    assert(rows.length == nPairs, s"${rows.length} of $nPairs pairs")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b)
      val (va, vb) = (vocab(a), vocab(b))
      val nCommon = (va intersect vb).size.toLong
      assert(r.getAs[Long]("n_a") == va.size && r.getAs[Long]("n_b") == vb.size)
      assert(r.getAs[Long]("n_common") == nCommon, s"($a,$b)")
      assert(r.getAs[Long]("jacc_exact_ppm") ==
        nCommon * 1000000L / (va.size + vb.size - nCommon))
      // the estimator, replayed from the two bottom-k sketches
      val (sa, sb) = (sketches(a).toSet, sketches(b).toSet)
      val merged = (sa union sb).toSeq.sorted.take(K)
      val shared = merged.count(h => sa.contains(h) && sb.contains(h)).toLong
      assert(r.getAs[Long]("jacc_est_ppm") ==
        shared * 1000000L / merged.size, s"($a,$b) estimator")
      assert(r.getAs[Long]("err_ppm") ==
        math.abs(r.getAs[Long]("jacc_est_ppm") -
          r.getAs[Long]("jacc_exact_ppm")))
    }
    // K=64 must actually resolve the fixture's overlap structure: the
    // estimator is useful, not noise — every pair within ~3σ ≈ 19%
    val maxErr = rows.map(_.getAs[Long]("err_ppm")).max
    assert(maxErr <= 190000L, s"max estimator error $maxErr ppm")
  }

  test("kmv sketch: order-free and mergeable (bottom-k of union of sketches)") {
    import graft.SparkSuite.spark.implicits._
    import org.apache.spark.sql.functions._
    import TextOps._
    val K = SketchQueries.KmvK
    // one source's vocab, split arbitrarily: merging the halves'
    // sketches gives the whole's sketch — the property that makes KMV
    // partition-safe AND streaming-mergeable
    val hs = graft.Tables(spark, sfDir).documents
      .select($"source", explode(tokens($"text")).as("tok"))
      .select($"source", hash32($"tok").as("h")).distinct()
      .as[(String, Long)].collect()
    val src = hs.head._1
    val all = hs.filter(_._1 == src).map(_._2).toSet
    val (h1, h2) = all.partition(_ % 3 == 0)
    def bottomK(s: Set[Long]) = s.toSeq.sorted.take(K)
    val merged = bottomK((bottomK(h1) ++ bottomK(h2)).toSet)
    assert(merged == bottomK(all))
  }

  test("weighted sample: exact size, deterministic, and weight-biased") {
    val df = SketchQueries.defs("llm_weighted_sample")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == SketchQueries.WrsK)
    // deterministic: a second evaluation is identical
    val again = SketchQueries.defs("llm_weighted_sample")(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // keys are valid probabilities
    rows.foreach { r =>
      val k = r.getAs[Double]("sample_key")
      assert(k > 0.0 && k <= 1.0)
      assert(Set(1L, 2L, 4L, 8L).contains(r.getAs[Long]("weight")))
    }
    // A-ES must over-represent heavy rows relative to their corpus
    // share: mean sampled weight strictly exceeds mean corpus weight
    import graft.SparkSuite.spark.implicits._
    import org.apache.spark.sql.functions._
    import TextOps._
    val corpus = graft.Tables(spark, sfDir).documents
      .select(when(size(tokens($"text")) >= 200, 8L)
        .when(size(tokens($"text")) >= 100, 4L)
        .when(size(tokens($"text")) >= 50, 2L).otherwise(1L).as("w"))
      .agg(avg($"w")).head.getDouble(0)
    val sampled = rows.map(_.getAs[Long]("weight")).sum.toDouble / rows.length
    assert(sampled > corpus,
      s"sampled mean weight $sampled not above corpus mean $corpus")
  }
}
