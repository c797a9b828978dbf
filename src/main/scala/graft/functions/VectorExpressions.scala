package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-vector kernels for the embedding operators. Spark's
  * `zip_with`/`aggregate` higher-order functions evaluate their lambda
  * interpreted per element — a tight primitive loop is ~10x faster on
  * 64-dim embeddings and keeps the whole stage in codegen.
  *
  * Summation is sequential in index order (double accumulator), matching
  * the DuckDB oracle formulation exactly.
  */
object VectorEval {
  /** dot(a, b) over float arrays, double accumulation, sequential. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

object VectorExpressions {
  private val E = "graft.functions.VectorEval"

  case class DotProductFloat(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    // declared input types matter: getFloat over a double-backed array
    // would silently read garbage — the analyzer must cast or reject
    // (covariant narrowing: AbstractDataType is private[sql])
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorEval.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$E.dotFF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Column API: dot product of two float-array columns (double result). */
  def dot_f(a: Column, b: Column): Column =
    GraftBridge.column(DotProductFloat(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
