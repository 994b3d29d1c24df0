package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Behavior tests for the retrieval operators — the properties the
  * DuckDB oracle (which only re-computes the same definition) cannot
  * vouch for: ranking invariants, and an independent string-path
  * recomputation of the boilerplate counts.
  */
class RetrievalSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("bm25: ranks are dense, scores positive and non-increasing") {
    val rows = RetrievalQueries.defs("llm_bm25_topk")(spark, sfDir)
      .orderBy(col("rank")).collect()
    assert(rows.length == RetrievalQueries.Bm25TopK)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall { r =>
      val n = r.getAs[Int]("n_terms")
      n >= 1 && n <= RetrievalQueries.QueryTerms.size
    })
  }

  test("bigram lm: a driver-side model rebuild scores every doc identically") {
    import graft.SparkSuite.spark.implicits._
    val rows = RetrievalQueries.defs("llm_bigram_lm")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val toks = docs.select($"doc_id", lower($"text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val pairs = toks.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map(p => (id, p))
    }
    val cBg = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cPref = pairs.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val pPpm = cBg.map { case (p, c) => p -> c * 1000000L / cPref(p._1) }
    val expected = pairs.groupBy(_._1).view.mapValues { ps =>
      val vs = ps.map(p => pPpm(p._2))
      (vs.size.toLong, vs.sum / vs.size, vs.min)
    }.toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, mean, mn) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") == n)
      assert(r.getAs[Long]("mean_p_ppm") == mean,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("min_p_ppm") == mn)
      assert(mn <= mean && mean <= 1000000L)
    }
  }

  test("bm25: every returned doc actually contains a query term") {
    import graft.SparkSuite.spark.implicits._
    val top = RetrievalQueries.defs("llm_bm25_topk")(spark, sfDir)
      .select($"doc_id")
    val without = top.join(docs, "doc_id")
      .filter(!RetrievalQueries.QueryTerms
        .map(t => array_contains(split(lower($"text"), " "), t))
        .reduce(_ || _))
    assert(without.count() == 0)
  }

  test("bm25: more query-term occurrences outrank fewer at comparable length") {
    import graft.SparkSuite.spark.implicits._
    // the top-1 doc must be within the top docs by raw query-term count
    // per token (BM25 with near-uniform df is tf/dl-driven)
    val top1 = RetrievalQueries.defs("llm_bm25_topk")(spark, sfDir)
      .orderBy($"rank").limit(1).collect().head.getAs[Long]("doc_id")
    val byDensity = docs.select($"doc_id",
        (aggregate(transform(split(lower($"text"), " "),
          t => when(t.isin(RetrievalQueries.QueryTerms: _*), 1).otherwise(0)),
          lit(0), (a, x) => a + x).cast("double") /
          size(split(lower($"text"), " "))).as("density"))
      .orderBy($"density".desc).limit(5)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(byDensity.contains(top1),
      s"top-1 doc $top1 not among top-5 by term density ${byDensity.toSeq}")
  }

  test("boilerplate: counts match an independent string-path recomputation") {
    import graft.SparkSuite.spark.implicits._
    val out = RetrievalQueries.defs("llm_boilerplate")(spark, sfDir)
    // independent path: STRING shingles (not the native hashed-long
    // expression), same df threshold
    val sh = docs.select($"doc_id", TextOps.bigramShingles($"text").as("sh"))
    val n = sh.count()
    val ex = sh.select($"doc_id", explode(array_distinct($"sh")).as("g"))
    val boiler = ex.groupBy($"g").count()
      .filter($"count" * RetrievalQueries.BoilerDfDen >=
        lit(RetrievalQueries.BoilerDfNum) * lit(n))
    val expect = ex.join(boiler.select($"g"), "g")
      .groupBy($"doc_id").agg(count(lit(1)).as("exp_boiler"))
    val joined = out.join(expect, Seq("doc_id"), "left")
      .select($"doc_id", $"n_boiler", coalesce($"exp_boiler", lit(0L)).as("e"))
    assert(joined.filter($"n_boiler" =!= $"e").count() == 0)
    // threshold is meaningful on the fixture: some but not all flagged
    val flagged = out.filter($"n_boiler" > 0).count()
    assert(flagged > 0 && flagged < out.count())
  }

  test("rarity: values match an exact driver-side recomputation") {
    import graft.SparkSuite.spark.implicits._
    val texts = docs.select($"doc_id", lower($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val freq = texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val t = freq.values.sum
    val out = RetrievalQueries.defs("llm_rarity_score")(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"rarity_mean").collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val toks = texts(r.getLong(0))
      assert(r.getLong(1) == toks.size)
      // same term-sorted sequential fold → bit-identical double
      val sum = toks.sorted.foldLeft(0.0)((acc, w) =>
        acc + t.toDouble / freq(w).toDouble)
      assert(r.getDouble(2) == sum / toks.size.toDouble,
        s"doc ${r.getLong(0)}: ${r.getDouble(2)} vs ${sum / toks.size}")
    }
  }

  test("boilerplate: ratio stays in [0,1] and respects n_boiler <= n_shingles") {
    import graft.SparkSuite.spark.implicits._
    val out = RetrievalQueries.defs("llm_boilerplate")(spark, sfDir)
    assert(out.filter($"n_boiler" > $"n_shingles").count() == 0)
    assert(out.filter($"boiler_ratio" < 0.0 || $"boiler_ratio" > 1.0).count() == 0)
  }

  test("tfidf keywords: a driver-side recomputation reproduces ranks and scores") {
    val rows = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tf = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.foreach { case (src, t) =>
      t.toLowerCase.split(" ", -1).foreach { w =>
        tf((src, w)) = tf.getOrElse((src, w), 0L) + 1L
      }
    }
    val n = tf.keys.map(_._1).toSet.size.toLong
    val df = tf.keys.toSeq.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val expected = tf.toSeq.groupBy(_._1._1).toSeq.flatMap { case (src, ts) =>
      ts.map { case ((_, w), c) =>
          (w, c, df(w),
            c.toDouble * (((n - df(w)).toDouble + 0.5) / (df(w).toDouble + 0.5)))
        }
        .sortWith((a, b) => a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
        .take(RetrievalQueries.TfidfTopK)
        .zipWithIndex.map { case ((w, c, d, s), i) => (src, i + 1, w, c, d, s) }
    }.sortBy(x => (x._1, x._2))
    val got = RetrievalQueries.defs("llm_tfidf_keywords")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("novelty: each distinct shingle is novel exactly once; the first doc scores 1.0") {
    import graft.SparkSuite.spark.implicits._
    val out = RetrievalQueries.defs("llm_ngram_novelty")(spark, sfDir)
      .orderBy($"doc_id").collect()
    assert(out.length == docs.count())
    // every corpus-distinct shingle is counted novel in exactly one doc
    val distinctShingles = docs
      .select(explode(graft.llm.TextOps.hashedShingles($"text")).as("h"))
      .distinct().count()
    assert(out.map(_.getAs[Long]("n_novel")).sum == distinctShingles)
    // the earliest doc with any shingles saw all of them first
    val first = out.find(_.getAs[Long]("n_shingles") > 0).get
    assert(first.getAs[Double]("novelty") == 1.0)
    out.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      val nv = r.getAs[Double]("novelty")
      assert(nv >= 0.0 && nv <= 1.0)
    }
  }
}
