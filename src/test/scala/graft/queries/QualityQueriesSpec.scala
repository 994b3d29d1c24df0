package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Value-level checks for the data-quality family (q46-q48): the
  * profiler against directly-computed stats, the FK audit against
  * injected violations, and the blocked fuzzy join against an
  * unblocked brute-force ground truth (the blocking must lose NO pair).
  */
class QualityQueriesSpec extends SparkSuite {

  private def idSchema(name: String) = StructType(Seq(StructField(name, LongType)))

  test("q46_profile matches directly computed column stats") {
    val rows = QualityQueries.defs("q46_profile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    assert(rows.keySet.contains("l_quantity"))
    rows.values.foreach(r => assert(r.getLong(4) === n))
    val q = li.agg(min(col("l_quantity").cast("double")),
      max(col("l_quantity").cast("double"))).head()
    assert(rows("l_quantity").getDouble(2) === q.getDouble(0))
    assert(rows("l_quantity").getDouble(3) === q.getDouble(1))
    assert(rows("l_quantity").getLong(1) === 0L) // fixtures have no nulls
  }

  test("q47_fk_check reports zero violations on consistent fixtures") {
    val out = QualityQueries.defs("q47_fk_check")(spark, sfDir).collect()
    assert(out.length === 7)
    out.foreach(r => assert(r.getLong(2) === 0L,
      s"${r.getString(0)} reported violations on consistent data"))
  }

  test("FK audit catches injected orphans and duplicate keys") {
    val parent = spark.createDataFrame(java.util.List.of(Row(1L), Row(2L), Row(3L)), idSchema("p_id"))
    val child = spark.createDataFrame(java.util.List.of(Row(1L), Row(1L), Row(2L), Row(99L), Row(98L)), idSchema("c_fk"))
    val orphans = child.join(broadcast(parent), col("c_fk") === col("p_id"), "left_anti").count()
    assert(orphans === 2L)
    val dupParent = spark.createDataFrame(java.util.List.of(Row(1L), Row(1L), Row(2L)), idSchema("p_id"))
    val dups = dupParent.agg((count(lit(1)) - count_distinct(col("p_id"))).as("v"))
      .head().getLong(0)
    assert(dups === 1L)
  }

  test("q48 blocked candidates lose no pair vs brute force") {
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"))
    // brute force within the same first-token block (the block is part
    // of the linkage definition; the LENGTH replication is the part
    // that must provably lose nothing)
    val tok = split(col("p_name"), " ").getItem(0)
    val a = p.select(col("p_partkey").as("ak"), col("p_name").as("an"), tok.as("at"))
    val b = p.select(col("p_partkey").as("bk"), col("p_name").as("bn"), tok.as("bt"))
    val brute = a.join(b, col("at") === col("bt") && col("ak") < col("bk"))
      .where(levenshtein(col("an"), col("bn")) <= 2)
      .agg(count(lit(1))).head().getLong(0)
    val blocked = QualityQueries.defs("q48_fuzzy_join")(spark, sfDir)
      .agg(sum(col("n_pairs"))).head().getLong(0)
    assert(blocked === brute, "length-blocked join dropped candidate pairs")
    assert(blocked > 0L)
  }

  test("q48 distance histogram is consistent") {
    val out = QualityQueries.defs("q48_fuzzy_join")(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"block ${r.getString(0)}: pair count != distance histogram sum")
    }
  }
}
