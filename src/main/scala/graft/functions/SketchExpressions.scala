package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd sketch kernels for the dedup/ANN hot paths (round-3 verdict
  * item: the per-document minhash/simhash/LSH signatures were Scala UDFs
  * — each row paid serialization in and out of the whole-stage-codegen
  * pipeline). These expressions keep the stage fused: the generated code
  * calls a static eval kernel directly on Catalyst's internal types
  * (UTF8String / ArrayData), no Row boxing, no UDF bridge.
  *
  * Hash math is delegated to the single implementation in
  * `graft.ops.{Dedup, Ann, Hashing}` so batch, streaming, and SQL oracle
  * derivations stay bit-identical.
  */
object SketchEval {
  def minhash(s: UTF8String, n: Int, k: Int): ArrayData =
    new GenericArrayData(graft.ops.Dedup.minhashSignature(s.toString, n, k))

  def simhash64(s: UTF8String): Long =
    graft.ops.Dedup.simhash64(s.toString)

  def jaccard(a: UTF8String, b: UTF8String, k: Int): Double =
    graft.ops.Dedup.jaccard(a.toString, b.toString, k)

  def lsh(v: ArrayData, bits: Int): Int =
    graft.ops.Ann.lshSignatureAD(v, bits)

  def ivfAssign(v: ArrayData, cents: Array[Array[Float]]): Int = {
    var best = -1; var bestSim = Double.MinValue
    val n = v.numElements()
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val vi = v.getFloat(i).toDouble; val ci = cents(c)(i).toDouble
        dot += vi * ci; na += vi * vi; nb += ci * ci; i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  def kmeansAssign(v: ArrayData, labels: Array[Int],
      cents: Array[Array[Double]]): Int = {
    var best = -1; var bestSim = Double.MinValue
    val n = v.numElements()
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val vi = v.getFloat(i).toDouble; val ci = cents(c)(i)
        dot += vi * ci; na += vi * vi; nb += ci * ci; i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > bestSim) { bestSim = sim; best = labels(c) }
      c += 1
    }
    best
  }

  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (str.length < n) return new GenericArrayData(Array.empty[Any])
    // insertion-ordered distinct grams — one pass, one allocation per
    // distinct gram (the interpreted transform-lambda + array_distinct
    // formulation cost ~4s per 5k docs at sf0.1; this is the hot loop)
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= str.length) { set.add(str.substring(i, i + n)); i += 1 }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def lshProbes(sig: Int, bits: Int): ArrayData = {
    val out = new Array[Int](bits + 1)
    out(0) = sig
    var b = 0
    while (b < bits) { out(b + 1) = sig ^ (1 << b); b += 1 }
    new GenericArrayData(out)
  }
}

object SketchExpressions {
  private val E = "graft.functions.SketchEval"

  /** n-permutation MinHash signature of a (normalized) text column. */
  case class MinhashSignature(child: Expression, numHashes: Int, shingleK: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(s: Any): Any =
      SketchEval.minhash(s.asInstanceOf[UTF8String], numHashes, shingleK)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$E.minhash($c, $numHashes, $shingleK)")
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** 64-bit SimHash fingerprint of a (normalized) text column. */
  case class Simhash64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override protected def nullSafeEval(s: Any): Any =
      SketchEval.simhash64(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$E.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Exact word-shingle Jaccard similarity (candidate verification). */
  case class JaccardSim(left: Expression, right: Expression, shingleK: Int)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      SketchEval.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
        shingleK)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$E.jaccard($a, $b, $shingleK)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** b-bit sign-random-projection LSH signature of a float-array column. */
  case class LshSignature(child: Expression, bits: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(v: Any): Any =
      SketchEval.lsh(v.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$E.lsh($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Nearest-centroid IVF list assignment (argmax cosine, lowest index
    * wins ties via strict >). The centroid table rides into generated
    * code as a reference object — broadcast-by-closure, no UDF bridge.
    */
  case class IvfAssign(child: Expression, cents: Array[Array[Float]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(v: Any): Any =
      SketchEval.ivfAssign(v.asInstanceOf[ArrayData], cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "float[][]")
      defineCodeGen(ctx, ev, c => s"$E.ivfAssign($c, $ref)")
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Nearest-centroid k-means assignment over (label, centroid) pairs —
    * like [[IvfAssign]] but with double centroids (fixed-point Lloyd
    * updates) and explicit labels so empty clusters drop out without
    * renumbering the survivors. `labels` must be ascending: the strict
    * `>` argmax then resolves ties to the lowest label.
    */
  case class KmeansAssign(child: Expression, labels: Array[Int],
      cents: Array[Array[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(v: Any): Any =
      SketchEval.kmeansAssign(v.asInstanceOf[ArrayData], labels, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lref = ctx.addReferenceObj("labels", labels, "int[]")
      val cref = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev, c => s"$E.kmeansAssign($c, $lref, $cref)")
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  def kmeans_assign(vec: Column, labels: Array[Int],
      cents: Array[Array[Double]]): Column =
    GraftBridge.column(KmeansAssign(GraftBridge.expression(vec), labels, cents))

  /** Distinct character n-grams of a string, insertion order. */
  case class CharNgrams(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(s: Any): Any =
      SketchEval.charNgrams(s.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$E.charNgrams($c, $n)")
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  def char_ngrams(text: Column, n: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(text), n))

  /** Multi-probe set for an LSH signature: the bucket plus every 1-bit
    * flip (bits + 1 ints).
    */
  case class LshProbes(child: Expression, bits: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(IntegerType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(s: Any): Any =
      SketchEval.lshProbes(s.asInstanceOf[Int], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$E.lshProbes($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  def ivf_assign(vec: Column, cents: Array[Array[Float]]): Column =
    GraftBridge.column(IvfAssign(GraftBridge.expression(vec), cents))

  def lsh_probes(sig: Column, bits: Int): Column =
    GraftBridge.column(LshProbes(GraftBridge.expression(sig), bits))

  def minhash_sig(text: Column, numHashes: Int, shingleK: Int): Column =
    GraftBridge.column(MinhashSignature(GraftBridge.expression(text),
      numHashes, shingleK))

  def simhash64(text: Column): Column =
    GraftBridge.column(Simhash64(GraftBridge.expression(text)))

  def jaccard_sim(a: Column, b: Column, shingleK: Int): Column =
    GraftBridge.column(JaccardSim(GraftBridge.expression(a),
      GraftBridge.expression(b), shingleK))

  def lsh_sig(vec: Column, bits: Int): Column =
    GraftBridge.column(LshSignature(GraftBridge.expression(vec), bits))
}
