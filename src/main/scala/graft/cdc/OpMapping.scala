package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE event_type → CDC-op mapping used by the fixture generator, the
  * batch CDC queries, and their DuckDB oracles — one constant so the
  * three can never drift (signup→insert, error→delete, else update).
  */
object OpMapping {
  def op(eventType: String): String = eventType match {
    case "signup" => "insert"
    case "error"  => "delete"
    case _        => "update"
  }

  def col(eventType: Column): Column =
    when(eventType === "signup", "insert")
      .when(eventType === "error", "delete")
      .otherwise("update")

  val sql: String =
    "CASE WHEN event_type = 'signup' THEN 'insert' " +
      "WHEN event_type = 'error' THEN 'delete' ELSE 'update' END"
}
