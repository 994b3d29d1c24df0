package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers for the correctness-query surface.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle,
  * so every numeric output must be bit-identical across engines. Money
  * columns in the fixtures are arbitrary doubles; a double SUM is
  * order-dependent and therefore NOT reproducible across engines (or
  * even across Spark runs with AQE). The fix: round each row to integer
  * cents first (a single deterministic IEEE op sequence, identical in
  * Spark and DuckDB), then sum as BIGINT — exact, associative,
  * order-independent.
  */
object Q {
  /** `round(expr * 100)::bigint` — exact integer cents from a double. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** DuckDB-side equivalent of [[cents]]; keep in lockstep. */
  def centsSql(expr: String): String = s"CAST(round(($expr) * 100) AS BIGINT)"
}
