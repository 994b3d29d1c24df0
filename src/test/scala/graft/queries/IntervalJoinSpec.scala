package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Brute-force twin for the bucketed interval join: the time-bucket
  * equi-join + exact-bound recheck must return the identical relation
  * to the naive per-pair range scan (which the operator exists to
  * avoid planning).
  */
class IntervalJoinSpec extends SparkSuite {

  test("q24: bucketed interval join equals the brute-force range join") {
    val W = 600000L
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val errorsByUser = ev.filter(_._3 == "error").groupBy(_._2)
    val expected = ev.filter(_._3 == "click").map { case (id, u, _, t0) =>
      val n = errorsByUser.getOrElse(u, Array.empty)
        .count(e => e._4 > t0 && e._4 <= t0 + W)
      (id, u, n.toLong)
    }.sortBy(_._1).toSeq
    val got = EventQueries.defs("q24_interval_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // sanity: some clicks do have in-window errors, so the recheck and
    // the left join are both exercised
    assert(expected.exists(_._3 > 0) && expected.exists(_._3 == 0))
  }
}
