package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Independent driver-side twins for the mining/mixing/clustering
  * operators — each test recomputes the operator's full result with
  * plain Scala over the collected sf0.001 fixture (a different code
  * path from both the Spark query and its DuckDB oracle) and demands
  * bit-exact agreement. Feasible only because the test fixture is
  * small; the operators themselves never collect data rows.
  */
class MiningOpsSpec extends SparkSuite {

  /** Driver-side twin of TextOps.hash32(md5) % 1e6 — the deterministic
    * keep decision shared by the sampling operators under test.
    */
  private def md5mod(sv: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(8), 16) % 1000000L
  }

  test("collocations: counts and lift match a driver-side recount; top-k is honest") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val toks = t.toLowerCase.split(" ", -1)
      toks.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1L)
      if (toks.length >= 2) toks.sliding(2).foreach { p =>
        val k = (p(0), p(1)); big(k) = big.getOrElse(k, 0L) + 1L
      }
    }
    val nTotal = big.values.sum
    val got = RetrievalQueries.defs("llm_collocations")(spark, sfDir).collect()
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == big((a, b)), s"n_pair($a,$b)")
      assert(r.getLong(3) == uni(a) && r.getLong(4) == uni(b), s"unigrams($a,$b)")
      assert(r.getDouble(5) ==
        (nTotal * big((a, b))).toDouble / (uni(a) * uni(b)).toDouble,
        s"lift($a,$b)")
    }
    // ORDER BY n_pair DESC LIMIT 50 honesty: every eligible pair
    // strictly above the smallest returned count must be in the result
    val minReturned = got.map(_.getLong(2)).min
    assert(big.values.count(c => c >= 5 && c > minReturned) ==
      got.count(_.getLong(2) > minReturned))
  }

  test("mix_sample: quotas, rates, and sampled counts match a driver-side recomputation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = docs.groupBy(_._2)
    val nTotal = docs.length.toLong
    val per = bySource.map { case (src, ds) =>
      (src, ds.length.toLong,
        math.floor(math.sqrt(ds.length.toDouble)).toLong)
    }
    val sumW = per.map(_._3).sum
    val expected = per.map { case (src, n, w) =>
      val quota = (nTotal / 2L) * w / sumW
      val rate = math.min(1000000L, quota * 1000000L / n)
      val sampled =
        bySource(src).count { case (id, _) => md5mod(s"mix:$id") < rate }
      (src, n, quota, rate, sampled.toLong)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysisQueries.defs("llm_mix_sample")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the mix is a genuine subsample: strictly below every source's size
    assert(got.forall { case (_, n, quota, _, sampled) =>
      sampled <= n && quota <= n })
  }

  /** Driver-side 2-iteration Lloyd twin: `(vec_id, v, cell, d2)` with
    * the query's exact expansion and tie-break — shared by the kmeans
    * and cluster-balanced-sample tests.
    */
  private lazy val lloydAssigned: Seq[(Long, Array[Double], Int, Double)] = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def assign(cents: Seq[(Int, Array[Double])]) = emb.map { case (id, v) =>
      // same expansion and tie-break as the query: d² = v·v − 2 v·c + c·c,
      // first centroid (ascending cell id) attaining the min wins
      val dvv = dot(v, v)
      val ds = cents.map { case (_, c) => dvv - 2.0 * dot(v, c) + dot(c, c) }
      val mn = ds.min
      val pos = ds.indexWhere(_ == mn)
      (id, v, cents(pos)._1, ds(pos))
    }
    val seeds = emb.filter(_._1 < SimilarityQueries.KmeansK)
      .map { case (id, v) => (id.toInt, v) }.toSeq
    val cents2 = assign(seeds).groupBy(_._3).toSeq.map { case (cell, ms) =>
      val sorted = ms.sortBy(_._1)
      val sum = new Array[Double](SimilarityQueries.Dim)
      sorted.foreach { m =>
        var i = 0; while (i < sum.length) { sum(i) += m._2(i); i += 1 }
      }
      (cell, sum.map(_ / sorted.size.toDouble))
    }.sortBy(_._1)
    assign(cents2).toSeq
  }

  test("winnowing: a driver-side twin reproduces fingerprint counts, sums, and bounds") {
    def h32(sv: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(8), 16)
    }
    val K = TextAnalysisQueries.WinnowK
    val W = TextAnalysisQueries.WinnowW
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1)
        val ph = toks.sliding(K).filter(_.length == K)
          .map(g => h32(g.mkString(" "))).toVector
        val wins =
          if (ph.size >= W) ph.sliding(W).map(_.min).toVector
          else if (ph.nonEmpty) Vector(ph.min)
          else Vector.empty[Long]
        val fps = wins.distinct
        (r.getLong(0), fps.size.toLong, fps.sum,
          fps.minOption, fps.maxOption)
      }.sortBy(_._1).toSeq
    val got = TextAnalysisQueries.defs("llm_winnow_fingerprint")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == expected)
    // density: winnowing keeps roughly 1/W of the grams but at least one
    assert(got.forall { case (_, n, _, _, _) => n >= 1 })
  }

  test("kmeans: a driver-side Lloyd twin reproduces members and sse bit-exactly") {
    val expected = lloydAssigned.groupBy(_._3).map { case (cell, ms) =>
      (cell, ms.size.toLong,
        ms.sortBy(_._1).foldLeft(0.0)((acc, m) => acc + m._4))
    }.toSeq.sortBy(_._1)
    val got = SimilarityQueries.defs("llm_embed_kmeans")(spark, sfDir)
      .orderBy(col("cell")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == lloydAssigned.size.toLong)
  }

  test("cluster-balanced sample: quotas and kept counts match the Lloyd twin") {
    val byCell = lloydAssigned.groupBy(_._3)
    val nTotal = lloydAssigned.size.toLong
    val nCells = byCell.size.toLong
    val quota = (nTotal / 2L) / nCells
    val expected = byCell.toSeq.map { case (cell, ms) =>
      val n = ms.size.toLong
      val rate = math.min(1000000L, quota * 1000000L / n)
      val kept = ms.count { case (id, _, _, _) => md5mod(s"cbs:$id") < rate }
      (cell, n, quota, rate, kept.toLong)
    }.sortBy(_._1)
    val got = SimilarityQueries.defs("llm_cluster_balanced_sample")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // every cell contributes, none exceeds its population
    assert(got.forall { case (_, n, _, _, kept) => kept <= n })
  }

  test("dup pagerank: a driver-side integer power-iteration twin matches exactly") {
    import graft.SparkSuite.spark.implicits._
    val rows = DedupQueries.defs("llm_dup_pagerank")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent recompute from the verified pair list (bounded at
    // test SF): the SAME exact-integer recurrence, driver-side
    val pairs = DedupQueries.defs("llm_minhash_lsh")(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSeq
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val S = DedupQueries.PrScale
    var score = deg.keys.map(_ -> S).toMap
    for (_ <- 1 to DedupQueries.PrIters) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => score(u) / deg(u) }.sum
      }
      score = contrib.map { case (v, c) => v -> (15 * S + 85 * c) / 100 }
    }
    assert(rows.length == score.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("deg") == deg(id), s"deg($id)")
      assert(r.getAs[Long]("pagerank") == score(id), s"pr($id)")
    }
    // rank mass is conserved up to integer-floor loss: never above the
    // uniform total, never below the damping floor
    val total = rows.map(_.getAs[Long]("pagerank")).sum
    assert(total <= S * rows.length)
    assert(total >= 15 * S / 100 * rows.length)
  }

  test("dup triangles: a driver-side brute-force recount matches exactly") {
    import graft.SparkSuite.spark.implicits._
    val rows = DedupQueries.defs("llm_dup_triangles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent recompute from the verified pair list (bounded at
    // test SF): canonical a<b<c enumeration, orientation-free
    val pairs = DedupQueries.defs("llm_minhash_lsh")(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val nbrs = (pairs ++ pairs.map(_.swap)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerDoc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var nTri = 0L
    for ((a, b) <- pairs; c <- nbrs(b) if c > b && pairs.contains((a, c))) {
      nTri += 1
      Seq(a, b, c).foreach(v => triPerDoc(v) += 1)
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val deg = r.getAs[Long]("deg")
      val cc = r.getAs[Long]("cc_ppm")
      assert(r.getAs[Long]("deg") == nbrs(id).size.toLong, s"deg($id)")
      assert(r.getAs[Long]("n_tri") == triPerDoc(id), s"tri($id)")
      assert(cc >= 0 && cc <= 1000000L)
      if (deg >= 2)
        assert(cc == 2 * triPerDoc(id) * 1000000L / (deg * (deg - 1)))
      else assert(cc == 0L)
    }
    // every triangle contributes to exactly three vertices
    assert(rows.map(_.getAs[Long]("n_tri")).sum == 3 * nTri)
  }

  test("dup weights: a family contributes one document's worth of ppm mass") {
    import graft.SparkSuite.spark.implicits._
    val rows = DedupQueries.defs("llm_dup_weights")(spark, sfDir).collect()
    val nDocs = graft.Tables(spark, sfDir).documents.count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val fs = r.getAs[Long]("family_size")
      val w = r.getAs[Long]("weight_ppm")
      assert(fs >= 1 && w == 1000000L / fs)
    }
    // singletons carry full weight; every family's total weight is 1e6
    // up to the integer-floor loss (< family_size ppm)
    assert(rows.filter(_.getAs[Long]("family_size") == 1L)
      .forall(_.getAs[Long]("weight_ppm") == 1000000L))
    val clustered = DedupQueries.defs("llm_dedup_clusters")(spark, sfDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(clustered.nonEmpty)
    rows.filter(r => clustered.contains(r.getAs[Long]("doc_id")))
      .groupBy(r => clustered(r.getAs[Long]("doc_id")))
      .foreach { case (_, fam) =>
        val fs = fam.head.getAs[Long]("family_size")
        assert(fam.length == fs)
        val tot = fam.map(_.getAs[Long]("weight_ppm")).sum
        assert(tot <= 1000000L && tot > 1000000L - fs)
      }
  }

  /** Driver-side twin of TextOps.hash32 (full 32-bit value, no mod). */
  private def h32(sv: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(8), 16)
  }

  test("dsir_weights: per-doc weights match a driver recount; en docs select more") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = TextAnalysisQueries.DsirBuckets
    val feats = docs.flatMap { case (id, lang, text) =>
      text.toLowerCase.split(" ", -1).map(t => (id, lang, h32(t) % B)) }
    val rc = feats.groupBy(_._3).map { case (f, xs) => f -> xs.length.toLong }
    val tc = feats.filter(_._2 == "en").groupBy(_._3)
      .map { case (f, xs) => f -> xs.length.toLong }
    val ratio = rc.map { case (f, r) =>
      f -> (tc.getOrElse(f, 0L) + 1L) * 1000000L / (r + 1L) }
    val nTot = rc.values.sum
    val wTot = rc.map { case (f, r) => r * ratio(f) }.sum
    val expected = feats.groupBy(_._1).map { case (id, xs) =>
      val ws = xs.map(x => ratio(x._3)).sum
      (id, xs.length.toLong, ws, ws * nTot > wTot * xs.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysisQueries.defs("llm_dsir_weights")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == expected)
    // the importance model must actually discriminate: the selection
    // rate among en (target) docs exceeds the rate among the rest
    val byLang = docs.map { case (id, lang, _) => id -> lang }.toMap
    val (en, other) = got.partition(g => byLang(g._1) == "en")
    def rate(xs: Seq[(Long, Long, Long, Boolean)]) =
      xs.count(_._4).toDouble / xs.length
    assert(en.nonEmpty && other.nonEmpty && rate(en) > rate(other))
  }

  test("shard_balance: shards match a driver recount and token sums are balanced") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ", -1).length.toLong))
    val N = TextAnalysisQueries.NumShards
    val assigned = docs
      .map { case (id, n) => (id, n, java.lang.Long.toBinaryString(n).length) }
      .groupBy(_._3).toSeq.flatMap { case (_, bin) =>
        bin.sortBy { case (id, n, _) => (-n, id) }.zipWithIndex
          .map { case ((id, n, _), i) => (id, n, (i % N).toLong) }
      }
    val expected = assigned.groupBy(_._3).map { case (sh, xs) =>
      (sh, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysisQueries.defs("llm_shard_balance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // balance: every shard populated; per-shard token sums within the
    // theoretical bound (one max-size doc per populated size class)
    assert(got.size === N)
    val sums = got.map(_._3)
    val bound = assigned.groupBy(x =>
      java.lang.Long.toBinaryString(x._2).length)
      .map(_._2.map(_._2).max).sum
    assert(sums.max - sums.min <= bound,
      s"spread ${sums.max - sums.min} > bound $bound")
  }

  test("token_budget_fill: kept set is the top-scored prefix within each source's budget") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase.split(" ", -1)
        (r.getLong(0), r.getString(1), toks.length.toLong,
          toks.distinct.length.toLong)
      }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val budget = ds.map(_._3).sum / 2L
      val scored = ds.map { case (id, _, n, nd) =>
        (id, n, nd * 1000000L / n) }
      var cum = 0L
      scored.sortBy { case (id, _, score) => (-score, id) }.map {
        case (id, n, score) =>
          cum += n
          (id, src, n, score, cum, cum <= budget)
      }
    }.toSeq.sortBy(_._1)
    val got = TextAnalysisQueries.defs("llm_token_budget_fill")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    // budget honesty: every source keeps at least one doc and never
    // overspends; adding the first excluded doc would overspend
    got.groupBy(_._2).foreach { case (src, rows) =>
      val kept = rows.filter(_._6)
      val budget = rows.map(_._3).sum / 2L
      assert(kept.nonEmpty, src)
      assert(kept.map(_._3).sum <= budget, src)
      val excluded = rows.filterNot(_._6)
      if (excluded.nonEmpty)
        assert(kept.map(_._3).sum + excluded.minBy(_._5)._3 > budget, src)
    }
  }
}
