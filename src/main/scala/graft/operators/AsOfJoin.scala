package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join.
  *
  * Spark has no built-in as-of join; the scalable formulation is NOT a
  * pairwise theta-join (which explodes to |L|×|R| before filtering) but
  * union + carry-forward: tag both sides, sort each key's rows by time,
  * and carry the most recent right-side value forward with
  * `last(_, ignoreNulls = true)`. Cost: ONE shuffle by key + a
  * per-partition sort — linear in |L|+|R|, skew-bounded by the window
  * partitioning; survives a 100×-scale-up where a range-join would not.
  */
object AsOfJoin {

  /** Self as-of: within `df`, for each row matching `leftPred`, attach
    * the value of `valueCol` from the most recent row matching
    * `rightPred` with the same `key`, at-or-before it in
    * `(time, tiebreak)` order. `tiebreak` must make the ordering total
    * (unique per key) or results are nondeterministic.
    */
  def lastAtOrBefore(
      df: DataFrame,
      key: Column,
      time: Column,
      tiebreak: Column,
      leftPred: Column,
      rightPred: Column,
      valueCol: Column,
      asName: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time, tiebreak)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(asName,
        last(when(rightPred, valueCol), ignoreNulls = true).over(w))
      .filter(leftPred)
  }

  /** Forward self as-of: the mirror of [[lastAtOrBefore]] — for each
    * row matching `leftPred`, attach `valueCol` from the EARLIEST row
    * matching `rightPred` with the same `key` at-or-after it. Same
    * one-shuffle carry-forward plan, frame reversed; the standard
    * "time-to-next-event" / label-attribution lookup.
    */
  def firstAtOrAfter(
      df: DataFrame,
      key: Column,
      time: Column,
      tiebreak: Column,
      leftPred: Column,
      rightPred: Column,
      valueCol: Column,
      asName: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time, tiebreak)
      .rowsBetween(0, Window.unboundedFollowing)
    df.withColumn(asName,
        first(when(rightPred, valueCol), ignoreNulls = true).over(w))
      .filter(leftPred)
  }

  /** Two-table as-of through graft's NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]] — the LogicalPlan → Strategy →
    * SparkPlan chain, SURVEY §2.9 path (c)): for each left row, attach
    * `rightVals` from the latest right row sharing `keyCols` with
    * rightTime <= leftTime (equal visible; pass `struct(ts, tiebreak)`
    * columns for lexicographic tie rules). One hash-cluster + sort per
    * side — the sort-merge-join contract — then a single O(|L|+|R|)
    * merge per partition, no window buffering, no union re-sort.
    * Registers the planner strategy on the session on first use.
    *
    * @param rightVals (rightColumn, outputAlias) pairs to carry over.
    */
  def joinNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: Column,
      rightTime: Column,
      rightVals: Seq[(String, String)],
      forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        graft.plans.AsOfJoinStrategy +: spark.experimental.extraStrategies
    val lPlan = left.queryExecution.analyzed
    val rBase = right.queryExecution.analyzed
    def baseAttr(n: String) = rBase.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"asof: no right column '$n'"))
    // one Project under the right child does double duty: FRESH
    // expression ids (a SELF as-of would otherwise have both children
    // sharing attribute ids, which breaks binding in any binary node)
    // and the payload RENAMES (aliases must live in the Project — the
    // analyzer's CleanupAliases strips aliases from the expressions of
    // non-projection operators, so the node itself only ever references
    // bare attributes)
    val rFresh = rBase.output.map(a => Alias(a, a.name)())
    val rPayload = rightVals.map { case (src, as) => Alias(baseAttr(src), as)() }
    val rPlan: LogicalPlan = Project(rFresh ++ rPayload, rBase)
    val remap = rBase.output.zip(rFresh.map(_.toAttribute))
      .map { case (o, n) => o.exprId -> n }.toMap
    def remapped(e: Expression): Expression = e.transform {
      case a: AttributeReference => remap.getOrElse(a.exprId, a)
    }
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asof: no column '$n'"))
    // time expressions resolve against the child plans via a transient
    // select (so callers can pass struct(ts, event_id) etc.)
    def timeExpr(df: DataFrame, c: Column) =
      df.select(c).queryExecution.analyzed
        .asInstanceOf[Project]
        .projectList.head match {
        case a: Alias => a.child
        case e => e
      }
    val rKeyAttrs = keyCols.map(n =>
      rFresh.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asof: no right column '$n'"))
        .toAttribute)
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)), rKeyAttrs,
      timeExpr(left, leftTime), remapped(timeExpr(right, rightTime)),
      rPayload.map(_.toAttribute), forward)
    GraftColumnBridge.ofRows(spark, node)
  }

  /** Two-table as-of: for each left row, attach the chosen right-side
    * columns from the latest right row sharing `keyCols` with
    * rightTime <= leftTime. On equal times the right row is visible to
    * the left row (right sorts first).
    *
    * @param rightVals (rightColumn, outputAlias) pairs to carry over.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[(String, String)]): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val valTypes = rightVals.map { case (src, _) => right.select(src).schema.head.dataType }

    val lProj = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"), leftStruct.as("__l")) ++
        rightVals.zip(valTypes).map { case ((_, as), dt) => lit(null).cast(dt).as(as) }: _*)
    val rProj = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"), lit(null).cast(leftType).as("__l")) ++
        rightVals.map { case (src, as) => col(src).as(as) }: _*)

    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightVals.foldLeft(lProj.unionByName(rProj)) { case (d, (_, as)) =>
      d.withColumn(as, last(col(as), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(col("__l.*") +: rightVals.map { case (_, as) => col(as) }: _*)
  }
}
