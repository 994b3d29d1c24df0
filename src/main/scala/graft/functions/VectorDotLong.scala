package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vector_dot_long(a, b)`: Σ a_i · b_i over two long arrays with
  * EXACT 64-bit integer accumulation — the quantized-dot kernel of the
  * int8 scalar-quantized ANN scan ([[graft.llm.SimilarityQueries]]
  * `llm_embed_sq8` / `llm_hybrid_rrf`). Integer sums are associative,
  * so unlike [[VectorDot]] there is no op-order subtlety; the value is
  * identical to the fold formulation
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)`)
  * and its DuckDB `list_reduce` twin, bit-for-bit.
  *
  * Why a native expression: Spark evaluates higher-order lambdas
  * interpreted per element, and the quantized scan computes one
  * 64-element dot per (query, vector) pair — the hot inner loop of
  * the whole candidate stage. This compiles to a primitive loop
  * inside whole-stage codegen.
  *
  * Ragged inputs and NULL elements return NULL (same as the fold
  * formulation, where `zip_with` null-pads — or a null element's
  * product — poisons the sum) so malformed code vectors surface
  * instead of silently truncating.
  */
case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "vector_dot_long"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      // a null element poisons the sum, exactly like the fold's
      // null product (getLong on a null slot would silently read 0)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}
