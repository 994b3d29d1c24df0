package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Behavior invariants for the round-7 relational additions: SCD2
  * history intervals, explicit grouping sets, and quantile windows.
  */
class HistoryWindowSpec extends SparkSuite {

  test("scd2: per-key intervals chain gaplessly and close only at a delete or the open end") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("cdc_scd2_history")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // raw parquet ts is the epoch long; only its ORDER matters here
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"user_id", $"ts".cast("long").as("ms"), $"event_id",
        $"event_type")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("valid_from_ms"), r.getAs[Long]("event_id")))
      // every interval is well-formed (ties at equal-ms changes allowed)
      sorted.foreach { r =>
        Option(r.getAs[java.lang.Long]("valid_to_ms")).foreach(to =>
          assert(r.getAs[Long]("valid_from_ms") <= to))
      }
      // at most one OPEN (current) version per key, and it is the last
      val open = sorted.filter(_.getAs[Boolean]("is_current"))
      assert(open.length <= 1)
      open.foreach(o => assert(o == sorted.last))
    }
    // a key whose LAST change is a delete has NO current version; any
    // other key with history has exactly one
    val lastOp = events.groupBy(_._1).map { case (u, es) =>
      u -> es.maxBy(_._2)._3
    }
    val currentUsers = rows.filter(_.getAs[Boolean]("is_current"))
      .map(_.getAs[Long]("user_id")).toSet
    byUser.keys.foreach { u =>
      val deletedLast = graft.cdc.OpMapping.op(lastOp(u)) == "delete"
      assert(currentUsers.contains(u) != deletedLast,
        s"user $u: deletedLast=$deletedLast current=${currentUsers.contains(u)}")
    }
  }

  test("ivm: the incrementally maintained view equals a from-scratch rebuild") {
    // the oracle already pins this against DuckDB; this pins the
    // WITHIN-SPARK equivalence at a different scale factor, so the
    // retraction-delta algebra can't overfit one fixture
    import graft.SparkSuite.spark.implicits._
    val maintained = SparkEntry.queries("cdc_ivm_agg")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ev = graft.Tables(spark, sfDir).events
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val rebuilt = ev
      .withColumn("op", graft.cdc.OpMapping.col($"event_type"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "delete")
      .select(pmod($"user_id", lit(8L)).as("segment"),
        Q.cents($"value").as("cents"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
      .orderBy($"segment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(maintained == rebuilt, s"$maintained vs $rebuilt")
  }

  test("q28: grouping sets emit exactly the two requested margins, nothing more") {
    import graft.SparkSuite.spark.implicits._
    val rows = SparkEntry.queries("q28_grouping_sets")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // every row is a one-dimension margin: exactly one side is ALL
    assert(rows.forall { case (f, s) => (f == "ALL") != (s == "ALL") })
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val nFlags = li.select($"l_returnflag").distinct().count()
    val nStatus = li.select($"l_linestatus").distinct().count()
    assert(rows.length == nFlags + nStatus)
  }

  test("q32: every z-order file is a 32x32 tile — BOTH dims bounded, unlike a 1-D sort") {
    val rows = SparkEntry.queries("q32_zorder")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // 1024 consecutive z-values = a 2^5 × 2^5 tile: both dimension
      // spans are ≤ 31 in every file — the pruning guarantee
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") <= 31, r.toString)
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") <= 31, r.toString)
    }
    // contrast: bucketing the SAME rows by dim a alone leaves dim b
    // unbounded (full 0..255 span) in the very first bucket
    import graft.SparkSuite.spark.implicits._
    val naive = graft.Tables(spark, sfDir).lineitem
      .select(pmod($"l_partkey", lit(256L)).as("a"),
        pmod($"l_orderkey", lit(256L)).as("b"))
      .withColumn("file_id", expr("a div 4"))
      .groupBy($"file_id")
      .agg((max($"b") - min($"b")).as("b_span"))
      .agg(max($"b_span")).head().getLong(0)
    assert(naive > 200, s"fixture too sparse to demonstrate: $naive")
  }

  test("q29: quartiles are balanced within each priority and pct_rank spans [0,1]") {
    val rows = SparkEntry.queries("q29_ntile")(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getAs[Int]("quartile")).view.mapValues(_.length)
      assert(sizes.keySet == Set(1, 2, 3, 4))
      // ntile balance: bucket sizes differ by at most one
      assert(sizes.values.max - sizes.values.min <= 1, sizes.toMap.toString)
      val pr = rs.map(_.getAs[Double]("pct_rank"))
      assert(pr.min == 0.0 && pr.max <= 1.0)
    }
  }
}
