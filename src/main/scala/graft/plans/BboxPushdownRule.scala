package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType
import graft.functions.GeoExpressions.StIntersects
import graft.geom.Wkb
import graft.meta.GeoMeta

/** Catalyst optimizer rule: when a filter contains
  * `st_intersects(geometryCol, <literal geometry>)` and the relation also
  * carries a bbox covering struct (xmin/ymin/xmax/ymax), AND in the
  * equivalent bbox-overlap conjuncts on the struct fields.
  *
  * `bboxOverlap` is implied by `intersects`, so semantics are unchanged —
  * but the added conjuncts are plain comparisons on scalar struct fields,
  * which Spark pushes into the Parquet scan (`PushedFilters`) for
  * row-group min/max pruning. This systematizes the reference's manual
  * bbox fast path (`core/extract.py:568-579`, the documented 10-100x
  * win) as a plan rewrite: users write the precise predicate, the
  * optimizer gets the pruning.
  */
object BboxPushdownRule extends Rule[LogicalPlan] {

  private def isBboxStruct(a: Attribute): Boolean = a.dataType match {
    case s: StructType =>
      Seq("xmin", "ymin", "xmax", "ymax").forall(f => s.fieldNames.contains(f))
    case _ => false
  }

  private def pairOf(a: Attribute): Option[String] =
    if (a.metadata.contains(GeoMeta.GeoPairKey))
      Some(a.metadata.getString(GeoMeta.GeoPairKey))
    else None

  /** The bbox covering attribute for the FILTERED geometry `g`, or None
    * when no covering can soundly be tied to it.
    *
    *  - Pair-metadata path (GeoTable-produced plans): the covering is the
    *    unique bbox-shaped attribute sharing `g`'s pair id — BUT only in
    *    join-free subplans. The pair id identifies (table, column), not
    *    row alignment: joining two reads of the same file where one side
    *    projected its bbox away leaves ONE same-id covering in scope that
    *    describes the OTHER side's rows, and pruning with it silently
    *    drops rows. Below a join, Project/Filter/Aggregate/Generate/Union
    *    all preserve within-row alignment, so the unique-id match is
    *    sound there — and Catalyst pushes eligible filters below inner
    *    joins before this rule runs, so the join-free restriction costs
    *    nothing (a filter stranded ABOVE an outer join couldn't feed
    *    PushedFilters anyway).
    *  - Fallback (plain spark.read plans with no metadata): the old
    *    one-binary-column heuristic — `g` must be the plan's only
    *    BinaryType attribute, covering found by conventional name.
    */
  private def bboxFor(child: LogicalPlan, g: Attribute): Option[Attribute] = {
    // the name-based fallback is exposed to the same cross-side hazard
    // (join one side's lone geometry with the other side's "bbox"), so
    // the join-free restriction applies to BOTH paths
    if (child.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]))
      return None
    pairOf(g) match {
      case Some(id) =>
        child.output.filter(a => isBboxStruct(a) && pairOf(a).contains(id)) match {
          case Seq(one) => Some(one)
          case _ => None
        }
      case None =>
        val binaryAttrs = child.output.filter(_.dataType ==
          org.apache.spark.sql.types.BinaryType)
        if (binaryAttrs.length == 1 && binaryAttrs.head.semanticEquals(g))
          child.output.find(a =>
            GeoMeta.BboxNameCandidates.contains(a.name) && isBboxStruct(a))
        else None
    }
  }

  /** envelope of the literal geometry, if it parses */
  private def literalEnvelope(e: Expression): Option[(Double, Double, Double, Double)] =
    e match {
      case Literal(bytes: Array[Byte], org.apache.spark.sql.types.BinaryType) =>
        Wkb.readOpt(bytes).map(_.envelope).filterNot(_._1.isNaN)
      case _ => None
    }

  private def field(b: Attribute, name: String): Expression =
    GetStructField(b, b.dataType.asInstanceOf[StructType].fieldIndex(name), Some(name))

  /** already has a bbox conjunct? (idempotence guard) */
  private def touchesBbox(cond: Expression, b: Attribute): Boolean =
    cond.exists {
      case g: GetStructField => g.child.semanticEquals(b)
      case _ => false
    }

  /** top-level AND conjuncts of a predicate */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      var added: Seq[Expression] = Nil
      // ONLY top-level conjuncts: an st_intersects nested under OR/NOT
      // does not imply the bbox overlap for every surviving row — ANDing
      // it on there silently dropped rows. st_intersects is symmetric:
      // the literal may sit in either argument position (the reference
      // emits both orders). Each conjunct resolves its OWN covering via
      // bboxFor, so a post-join filter touching both sides' geometries
      // prunes both coverings.
      conjuncts(cond).foreach {
        case StIntersects(a, c) =>
          val geomAttr = Seq(a, c).collectFirst {
            case at: Attribute
                if at.dataType == org.apache.spark.sql.types.BinaryType => at
          }
          for {
            g <- geomAttr
            b <- bboxFor(child, g)
            if !touchesBbox(cond, b) && !added.exists(_.exists {
              case gs: GetStructField => gs.child.semanticEquals(b)
              case _ => false
            })
            (x0, y0, x1, y1) <- literalEnvelope(c).orElse(literalEnvelope(a))
          } added ++= Seq(
            GreaterThanOrEqual(field(b, "xmax"), Literal(x0)),
            LessThanOrEqual(field(b, "xmin"), Literal(x1)),
            GreaterThanOrEqual(field(b, "ymax"), Literal(y0)),
            LessThanOrEqual(field(b, "ymin"), Literal(y1)))
        case _ => ()
      }
      if (added.isEmpty) f
      else Filter(added.foldLeft(cond)((acc, c) => And(acc, c)), child)
  }
}

/** Session extension registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BboxPushdownRule)
  }
}

object GraftExtensions {
  /** Attach to an existing session (experimental-methods hook). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(BboxPushdownRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BboxPushdownRule
  }
}
