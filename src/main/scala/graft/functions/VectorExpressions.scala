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
  // NULL-ELEMENT SEMANTIC (applies to every array kernel here and in
  // SketchExpressions): a null element reads as 0.0f — both UnsafeArrayData
  // and GenericArrayData zero the value slot — i.e. standard zero
  // imputation for a missing component. A per-element isNullAt branch in
  // these hot loops would cost more than the (already-pinned) NaN/zero
  // similarity guards justify; callers that must distinguish should
  // filter array_contains(transform(v, isnull...)) upstream.

  /** dot(a, b) over float arrays, double accumulation, sequential.
    * Dimension mismatch is LOUD (the sq8Cosine rule): a shorter vector
    * would silently compute a plausible-looking PREFIX dot.
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** cosine(a[0..d), b[0..d)) for each prefix length d in `dims`
    * (ascending) — ONE pass over the elements, snapshotting the three
    * accumulators at each boundary. Bit-identical to cosine(slice(a,
    * 1, d), slice(b, 1, d)) per tier (same sequential double sums in
    * the same order), at 1/4 the element reads and zero slice
    * allocations — the matryoshka (MRL) tier-scoring kernel.
    */
  def prefixCosines(a: ArrayData, b: ArrayData, dims: Array[Int]): ArrayData = {
    // DELIBERATE divergence from dotFF's loud-dims rule: prefix tiers
    // legitimately compare a truncated (matryoshka head) vector against
    // a full one — cosine over the COMMON prefix is the semantics, and
    // OpsSpec pins it ("ragged input: cosine over the common prefix").
    // Don't "fix" this to throw; tier clamping below uses the same min.
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](dims.length)
    var acc = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    var d = 0
    while (d < dims.length) {
      val lim = math.min(dims(d), n)
      while (i < lim) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        acc += x * y; na += x * x; nb += y * y
        i += 1
      }
      out(d) = acc / (math.sqrt(na) * math.sqrt(nb))
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

  /** Per-prefix cosines in one element pass (see [[VectorEval.prefixCosines]]). */
  case class PrefixCosines(left: Expression, right: Expression,
      dims: Array[Int])
      extends BinaryExpression with ImplicitCastInputTypes {
    require(dims.nonEmpty && dims.sameElements(dims.sorted),
      "prefix_cosines dims must be ascending")
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorEval.prefixCosines(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], dims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ds = ctx.addReferenceObj("prefixDims", dims, "int[]")
      defineCodeGen(ctx, ev, (a, b) => s"$E.prefixCosines($a, $b, $ds)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def prefix_cosines(a: Column, b: Column, dims: Seq[Int]): Column =
    GraftBridge.column(PrefixCosines(GraftBridge.expression(a),
      GraftBridge.expression(b), dims.toArray))
}
