package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native as-of join ([[graft.plans.AsOfJoinExec]]): semantics on
  * a hand-built fixture, equivalence with the window-composed
  * formulation over the events table, and the physical contract (one
  * merge operator, sort-merge-join-shaped children).
  */
class AsOfJoinNativeSpec extends SparkSuite {
  private lazy val sp = spark
  import sp.implicits._

  test("backward as-of: latest at-or-before per key; no match is NULL; equal time visible") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"),
      (3L, 9L, "t4")).toDF("k", "t", "trade")
    val quotes = Seq((1L, 8L, 100L), (1L, 10L, 101L), (1L, 15L, 102L),
      (2L, 6L, 200L)).toDF("k", "t", "px")
    val got = AsOfJoin.joinNative(trades, quotes, Seq("k"),
        col("t"), col("t"), Seq("px" -> "px"))
      .select($"trade", $"px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // t1@10: quote@10 visible (equal time) -> 101; t2@20 -> 102;
    // t3@5: only quote@6 is later -> null; t4: key 3 has no quotes
    assert(got === Map("t1" -> 101L, "t2" -> 102L, "t3" -> -1L, "t4" -> -1L))
  }

  test("native as-of equals the window-composed formulation on events") {
    val ev = graft.Tables(spark, sfDir).events
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val native = AsOfJoin.joinNative(purchases, clicks, Seq("user_id"),
        struct($"ts", $"event_id"), struct($"ts", $"click_id"),
        Seq("click_id" -> "last_click_id"))
      .select($"event_id", $"last_click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val composed = AsOfJoin.lastAtOrBefore(ev,
        key = $"user_id", time = $"ts", tiebreak = $"event_id",
        leftPred = $"event_type" === "purchase",
        rightPred = $"event_type" === "click",
        valueCol = $"event_id", asName = "last_click_id")
      .select($"event_id", $"last_click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native.nonEmpty && native === composed)
  }

  test("forward as-of: earliest at-or-after per key; peek-not-consume merge") {
    val clicks = Seq((1L, 10L, "c1"), (1L, 12L, "c2"), (1L, 30L, "c3"),
      (2L, 5L, "c4")).toDF("k", "t", "click")
    val buys = Seq((1L, 12L, 900L), (1L, 25L, 901L)).toDF("k", "t", "buy")
    val got = AsOfJoin.joinNative(clicks, buys, Seq("k"),
        col("t"), col("t"), Seq("buy" -> "buy"), forward = true)
      .select($"click", $"buy").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // c1@10 -> buy@12; c2@12 -> buy@12 (equal visible, and it must
    // still serve c1 before it); c3@30 -> none; c4 key 2 -> none
    assert(got === Map("c1" -> 900L, "c2" -> 900L, "c3" -> -1L, "c4" -> -1L))
  }

  test("native forward as-of equals firstAtOrAfter on events") {
    val ev = graft.Tables(spark, sfDir).events
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val native = AsOfJoin.joinNative(clicks, purchases, Seq("user_id"),
        struct($"ts", $"event_id"), struct($"ts", $"purchase_id"),
        Seq("purchase_id" -> "next_purchase_id"), forward = true)
      .select($"event_id", $"next_purchase_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val composed = AsOfJoin.firstAtOrAfter(ev,
        key = $"user_id", time = $"ts", tiebreak = $"event_id",
        leftPred = $"event_type" === "click",
        rightPred = $"event_type" === "purchase",
        valueCol = $"event_id", asName = "next_purchase_id")
      .select($"event_id", $"next_purchase_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native.nonEmpty && native === composed)
  }

  test("randomized: native matches a brute-force reference, both directions") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 0 until 5) {
      // duplicate (k, t) pairs on purpose: the struct(t, id) time makes
      // the order total, and the brute force uses the same rule
      def rows(n: Int, idBase: Long) = (0 until n).map { i =>
        (idBase + i, rnd.nextInt(6).toLong, rnd.nextInt(20).toLong)
      }
      val lRows = rows(60, 1000L)
      val rRows = rows(60, 2000L)
      val l = lRows.toDF("lid", "k", "t")
      val r = rRows.toDF("rid", "k", "t")
      val ord = Ordering.Tuple2[Long, Long]
      def brute(forward: Boolean): Map[Long, Long] = lRows.map {
        case (lid, k, t) =>
          val cands = rRows.filter { case (rid, rk, rt) =>
            rk == k && (if (forward) ord.gteq((rt, rid), (t, lid)) // ids never equal
              else ord.lteq((rt, rid), (t, lid)))
          }
          val pick =
            if (cands.isEmpty) -1L
            else if (forward) cands.minBy { case (rid, _, rt) => (rt, rid) }._1
            else cands.maxBy { case (rid, _, rt) => (rt, rid) }._1
          lid -> pick
      }.toMap
      for (fwd <- Seq(false, true)) {
        val got = AsOfJoin.joinNative(l, r, Seq("k"),
            struct(col("t"), col("lid")), struct(col("t"), col("rid")),
            Seq("rid" -> "match_id"), forward = fwd)
          .select($"lid", $"match_id").collect()
          .map(x => x.getLong(0) ->
            (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
        assert(got === brute(fwd), s"round=$round forward=$fwd")
      }
    }
  }

  test("physical plan: one AsOfJoinExec over sort-merge-shaped children") {
    val ev = graft.Tables(spark, sfDir).events
    val l = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val p = AsOfJoin.joinNative(l, r, Seq("user_id"),
        struct($"ts", $"event_id"), struct($"ts", $"click_id"),
        Seq("click_id" -> "last_click_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(2000))
    // both children hash-cluster on the key and sort — the SMJ contract
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }
}
