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
