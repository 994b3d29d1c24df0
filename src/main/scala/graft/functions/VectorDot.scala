package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vector_dot(a, b)`: Σ (double)a_i · (double)b_i over float or
  * double arrays, accumulated SEQUENTIALLY left-to-right — the exact
  * IEEE op sequence of the portable fold formulation
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0.0D, (acc,v) -> acc+v)`)
  * and of its DuckDB `list_reduce(list_prepend(0.0, …))` twin, so
  * swapping it into an oracle-checked query changes NOTHING about the
  * result bits.
  *
  * Why: Spark evaluates higher-order lambdas interpreted per element;
  * the similarity queries fold 64-dim vectors several times per row.
  * This is a primitive loop with whole-stage codegen.
  *
  * Ragged inputs and NULL elements return NULL — the same result as
  * the fold formulation (`zip_with` null-pads the shorter array, and a
  * null element's product poisons the sum to NULL), so malformed
  * embeddings surface instead of silently truncating.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val at = elemType(left).get
    val bt = elemType(right).get
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the sum, exactly like the fold's null
      // product (getFloat/getDouble on a null slot would read 0)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, at, i) * get(b, bt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(dt: DataType, arr: String, i: String) = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _         => s"$arr.getDouble($i)"
      }
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getter(elemType(left).get, a, i)} * ${getter(elemType(right).get, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
