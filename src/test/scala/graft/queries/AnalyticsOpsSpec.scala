package graft.queries

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior invariants for the distribution/run-analysis additions:
  * exact continuous percentiles, the log2 histogram, gaps-and-islands,
  * the correlated LATERAL top-k join, and the kNN graph.
  */
class AnalyticsOpsSpec extends SparkSuite {

  test("q33: percentiles are ordered, bracketed by min/max, and median-checked") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q33_percentiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p75, p90) =
        Seq("p25", "p50", "p75", "p90").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90,
        s"${r.getAs[String]("grp")}: $p25 $p50 $p75 $p90")
    }
    // independent exact median for one group (driver-side sort of the
    // raw values — small by construction at test SF)
    val grp = rows.head.getAs[String]("grp")
    val vs = Tables(spark, sfDir).orders
      .filter($"o_orderpriority" === grp)
      .select(Q.cents($"o_totalprice").as("v")).as[Long].collect().sorted
    val pos = 0.5 * (vs.length - 1)
    val lo = vs(math.floor(pos).toInt).toDouble
    val hi = vs(math.ceil(pos).toInt).toDouble
    val expected = lo + (hi - lo) * (pos - math.floor(pos))
    assert(rows.find(_.getAs[String]("grp") == grp).get
      .getAs[Double]("p50") == expected)
  }

  test("q42: a driver-side median/MAD recompute matches every group exactly") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q42_mad_outliers")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byGrp = Tables(spark, sfDir).orders
      .select($"o_orderpriority".as("grp"), Q.cents($"o_totalprice").as("v"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(rows.length == byGrp.size)
    rows.foreach { r =>
      val vs = byGrp(r.getAs[String]("grp")).map(_._2).sorted
      val n = vs.length
      val med = vs(((n + 1) / 2 - 1).toInt)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs(((n + 1) / 2 - 1).toInt)
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("med_cents") == med)
      assert(r.getAs[Long]("mad_cents") == mad)
      assert(r.getAs[Long]("n_outliers") == devs.count(_ > 3 * mad))
      assert(r.getAs[Long]("max_dev_cents") == devs.last)
    }
  }

  test("q43: a driver-side funnel replay matches counts and strict ordering") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q43_funnel")(spark, sfDir).collect()
      .map(r => r.getAs[Int]("step") ->
        (r.getAs[String]("event_type"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_ppm"))).toMap
    assert(rows.keySet == Set(1, 2, 3))
    // independent per-user replay of the strict view→click→purchase chain
    val evs = Tables(spark, sfDir).events
      .select($"user_id", unix_micros($"ts").as("t"), $"event_type")
      .as[(Long, Long, String)].collect().groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    evs.values.foreach { es =>
      val t1 = es.collect { case (_, t, "view") => t }.minOption
      val t2 = t1.flatMap(a =>
        es.collect { case (_, t, "click") if t > a => t }.minOption)
      val t3 = t2.flatMap(b =>
        es.collect { case (_, t, "purchase") if t > b => t }.minOption)
      if (t1.isDefined) n1 += 1
      if (t2.isDefined) n2 += 1
      if (t3.isDefined) n3 += 1
    }
    assert(rows(1) == (("view", n1, 1000000L)))
    assert(rows(2) == (("click", n2, n2 * 1000000L / n1)))
    assert(rows(3) == (("purchase", n3, n3 * 1000000L / n2)))
    // the funnel is monotone by construction
    assert(n1 >= n2 && n2 >= n3 && n3 > 0)
  }

  test("q44: a driver-side cohort replay matches the retention matrix") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q44_cohort_retention")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val uw = Tables(spark, sfDir).events
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("wk"))
      .distinct().as[(Long, java.sql.Date)].collect()
    val cohort = uw.groupBy(_._1).view.mapValues(_.map(_._2).minBy(_.getTime))
    val cells = uw.groupBy { case (u, w) =>
      (cohort(u).toString, (w.getTime - cohort(u).getTime) / (7 * 86400000L))
    }.view.mapValues(_.length.toLong).toMap
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("cohort_week"), r.getAs[Long]("week_offset"))
      val nCohort = cells((key._1, 0L))
      assert(r.getAs[Long]("n_active") == cells(key), s"$key")
      assert(r.getAs[Long]("n_cohort") == nCohort, s"$key")
      assert(r.getAs[Long]("retention_ppm") == cells(key) * 1000000L / nCohort)
      // retention can never exceed the diagonal
      assert(cells(key) <= nCohort)
    }
  }

  test("q34: buckets partition the rows and bound their values by powers of two") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q34_histogram")(spark, sfDir).collect()
    val total = Tables(spark, sfDir).orders.count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    rows.foreach { r =>
      val bits = r.getAs[Int]("bits")
      val lo = 1L << (bits - 1)
      assert(r.getAs[Long]("bucket_lo") == lo)
      assert(r.getAs[Long]("min_cents") >= lo)
      assert(r.getAs[Long]("max_cents") < lo * 2)
    }
  }

  test("q35: islands cover every event, alternate types, and never overlap") {
    val rows = SparkEntry.queries("q35_islands")(spark, sfDir).collect()
    val total = Tables(spark, sfDir).events.count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("island"))
      // island ids are consecutive from 1 (a running sum of break flags)
      assert(sorted.map(_.getAs[Long]("island")).toSeq ==
        (1L to sorted.length).toSeq, s"user $u")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u: adjacent islands share a type")
          assert(a.getAs[Long]("end_ms") <= b.getAs[Long]("start_ms"),
            s"user $u: islands overlap")
        case _ =>
      }
    }
  }

  test("q36: the LATERAL result equals the explicit window top-2") {
    import graft.SparkSuite.spark.implicits._
    val lateral = SparkEntry.queries("q36_lateral_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val t = Tables(spark, sfDir)
    val w = Window.partitionBy($"o_custkey")
      .orderBy(Q.cents($"o_totalprice").desc, $"o_orderkey".asc)
    val windowed = t.orders
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"o_orderkey",
        Q.cents($"o_totalprice").as("totalprice_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(lateral.toSet == windowed.toSet)
    assert(lateral.size == windowed.size)
  }

  test("q37: trailing-hour counts match a brute-force recompute for one user") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q37_trailing_hour")(spark, sfDir).collect()
    val total = Tables(spark, sfDir).events.count()
    assert(rows.length == total)
    assert(rows.forall(_.getAs[Long]("n_trailing") >= 1L))
    val user = rows.head.getAs[Long]("user_id")
    val evs = rows.filter(_.getAs[Long]("user_id") == user)
      .map(r => (r.getAs[Long]("sec"), r.getAs[Long]("n_trailing")))
    val secs = Tables(spark, sfDir).events
      .filter($"user_id" === user)
      .select(expr("unix_millis(ts) div 1000")).as[Long].collect()
    evs.foreach { case (sec, n) =>
      val expected = secs.count(s2 => s2 >= sec - 3600 && s2 <= sec)
      assert(n == expected, s"user $user sec $sec: $n != $expected")
    }
  }

  test("minhash est: banded pairs agree on >= one band's components; estimate is n_eq/16") {
    val rows = SparkEntry.queries("llm_minhash_est")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nEq = r.getAs[Int]("n_eq")
      // a shared band means that band's RowsPerBand components all match
      assert(nEq >= graft.llm.TextOps.RowsPerBand && nEq <= graft.llm.TextOps.NumHashes,
        s"${r.getAs[Long]("doc_a")}-${r.getAs[Long]("doc_b")}: n_eq=$nEq")
      assert(r.getAs[Double]("est_jaccard") ==
        nEq.toDouble / graft.llm.TextOps.NumHashes)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("containment: ratios reproduce from shingle sizes and dominate Jaccard") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("llm_containment")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sizes = graft.Tables(spark, sfDir).documents
      .select($"doc_id", size(graft.llm.TextOps.hashedShingles($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val nc = r.getAs[Int]("n_common")
      assert(r.getAs[Double]("cont_a") == nc.toDouble / sizes(a))
      assert(r.getAs[Double]("cont_b") == nc.toDouble / sizes(b))
      assert(math.max(r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b")) >= 0.3)
      // containment >= jaccard for every pair, by definition
      val jac = nc.toDouble / (sizes(a) + sizes(b) - nc)
      assert(r.getAs[Double]("cont_a") >= jac && r.getAs[Double]("cont_b") >= jac)
    }
  }

  test("q38: the forward as-of matches a brute-force next-purchase scan") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q38_asof_next_purchase")(spark, sfDir).collect()
    val ev = Tables(spark, sfDir).events
      .select($"user_id", $"event_id", $"ts".cast("long").as("t"), $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicks = ev.count(_._4 == "click")
    assert(rows.length == clicks)
    val byUser = ev.groupBy(_._1)
    rows.foreach { r =>
      val (u, id) = (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))
      val me = byUser(u).find(_._2 == id).get
      val expected = byUser(u)
        .filter(e => e._4 == "purchase" &&
          (e._3 > me._3 || (e._3 == me._3 && e._2 >= me._2)))
        .sortBy(e => (e._3, e._2)).headOption.map(_._2)
      assert(Option(r.getAs[java.lang.Long]("next_purchase_id"))
        .map(_.toLong) == expected, s"user $u click $id")
    }
  }

  test("knn graph: ranks are dense, scores descend, and mutual means reverse edge") {
    val rows = SparkEntry.queries("llm_knn_graph")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val edges = rows.map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    rows.groupBy(_.getAs[Long]("src")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length <= graft.llm.SimilarityQueries.KnnK)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length).toSeq, s"src $src: ranks not dense")
      assert(sorted.map(_.getAs[Double]("cos_sim")).toSeq
        .sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
        s"src $src: scores not descending")
    }
    rows.foreach { r =>
      val expected = edges.contains(
        (r.getAs[Long]("dst"), r.getAs[Long]("src")))
      assert(r.getAs[Int]("mutual") == (if (expected) 1 else 0),
        s"edge ${r.getAs[Long]("src")}→${r.getAs[Long]("dst")}")
    }
  }

  test("q39: the bloom-pruned join returns exactly the unpruned result") {
    import graft.SparkSuite.spark.implicits._
    val pruned = SparkEntry.queries("q39_bloom_join")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    // same relation in the parent session with runtime filters off —
    // might_contain's false positives only ever pass EXTRA rows to the
    // join, which drops them, so the results must be identical
    val t = Tables(spark, sfDir)
    val plain = t.lineitem
      .join(t.orders.filter($"o_orderpriority" === "1-URGENT" &&
        $"o_totalprice" > 150000.0).select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(Q.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("revenue_cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned == plain)
  }

  test("cdc_temporal_lookup: a driver replay matches, incl. tombstones") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("cdc_temporal_lookup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = Tables(spark, sfDir).events
      .select($"user_id", unix_millis($"ts"), $"event_id", $"event_type",
        Q.cents($"value"))
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    var sawTombstone = false
    var sawFirstEvent = false
    rows.foreach { r =>
      val (id, user) = (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"))
      val tl = byUser(user)
      val i = tl.indexWhere(_._3 == id)
      assert(tl(i)._4 == "purchase")
      if (i == 0) {
        sawFirstEvent = true
        assert(!r.getAs[Boolean]("had_record"), s"event $id: no prior change")
        assert(r.isNullAt(r.fieldIndex("version_event_id")))
      } else {
        val prev = tl(i - 1)
        if (prev._4 == "error") { // delete op — record absent at probe time
          sawTombstone = true
          assert(!r.getAs[Boolean]("had_record"), s"event $id: tombstoned")
          assert(r.isNullAt(r.fieldIndex("value_cents_at_ts")))
        } else {
          assert(r.getAs[Boolean]("had_record"), s"event $id")
          assert(r.getAs[Long]("version_event_id") == prev._3)
          assert(r.getAs[Long]("value_cents_at_ts") == prev._5)
        }
      }
    }
    assert(sawTombstone, "fixture never exercised the delete tombstone path")
    assert(sawFirstEvent || rows.forall(_.getAs[Boolean]("had_record")))
  }

  test("q45: a driver recount of adjacent transitions matches counts and ppm") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q45_transitions")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pairs = Tables(spark, sfDir).events
      .select($"user_id", unix_millis($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).values
      .flatMap { tl =>
        val s = tl.sortBy(e => (e._2, e._3))
        s.zip(s.drop(1)).map { case (a, b) => (a._4, b._4) }
      }
      .groupBy(p => p).view.mapValues(_.size.toLong).toMap
    val outTotals = pairs.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    assert(rows.map(_.getAs[Long]("n_trans")).sum == pairs.values.sum)
    rows.foreach { r =>
      val k = (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
      assert(r.getAs[Long]("n_trans") == pairs(k), s"$k")
      assert(r.getAs[Long]("p_ppm") ==
        pairs(k) * 1000000L / outTotals(k._1), s"$k ppm")
    }
  }

  test("q40: a driver-side sequential EWMA twin matches bit-for-bit") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q40_ewma")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = Tables(spark, sfDir).events
      .select($"user_id", unix_millis($"ts"), $"event_id",
        Q.cents($"value").cast("double"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    rows.foreach { r =>
      val id = r.getAs[Long]("user_id")
      val xs = byUser(id).sortBy(e => (e._2, e._3)).map(_._4)
      val expected = xs.foldLeft(0.0)((acc, x) => acc / 2 + x / 2)
      assert(r.getAs[Long]("n_events") == xs.length)
      // bit-for-bit: same op sequence, same IEEE rounding
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("ewma_cents")) ==
        java.lang.Double.doubleToLongBits(expected), s"user $id")
    }
  }
}
