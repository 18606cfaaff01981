package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expression for the similarity hot path.
  *
  * Spark's array higher-order functions (`zip_with` + `aggregate`) evaluate
  * their lambdas through an interpreted-closure boundary per element, which
  * dominates the n² pair loops of the near-dup/top-k operators. The exact
  * integer dot product over floor-quantized vectors is a tight primitive
  * loop, so this is the one place the built-ins genuinely can't express the
  * performance (SURVEY.md §7.4): a BinaryExpression whose `doGenCode`
  * emits a plain Java for-loop over the two long arrays, staying fully
  * inside whole-stage codegen.
  *
  * Semantics are identical to `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`
  * — exact 64-bit sums, so DuckDB-oracle hashes are unchanged (asserted by
  * OperatorsSpec).
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity over two quantized (long) vectors: ONE loop
  * accumulates the dot product and both squared norms, where the composed
  * form (three [[DotProductLong]] calls) walks each array twice more. The
  * division/sqrt at the end is the same single IEEE expression the
  * composed form produces, so oracle hashes are unchanged (asserted by
  * OperatorsSpec). Used by the pairwise similarity operators, where this
  * loop IS the n·pairs hot path. */
case class CosineSimLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "cosine_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xv = x.getLong(i); val yv = y.getLong(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    (dot.toDouble) / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ((double) $dot)
         |  / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): CosineSimLong =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API for [[DotProductLong]]. */
  def dotLong(a: Column, b: Column): Column =
    GraftBridge.column(DotProductLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for [[CosineSimLong]]. */
  def cosineLong(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Optimizer rule: rewrite the hand-composed cosine pattern
  * `dot(a,b)/ (sqrt(dot(a,a)) * sqrt(dot(b,b)))` (all via
  * [[DotProductLong]], cast to double) into the fused single-loop
  * [[CosineSimLong]]. A user who writes the natural three-dot form gets
  * the fused loop automatically — the extend-Catalyst counterpart of
  * "let Catalyst optimize". Registered in [[graft.plans.GraftExtensions]]
  * (config-time) or via GraftBridge.addOptimization (live session).
  * Bit-parity of the rewrite is asserted by OperatorsSpec. */
object CosineFusionRule
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Multiply, Sqrt}
  import org.apache.spark.sql.types.DoubleType

  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            Cast(DotProductLong(a, b), DoubleType, _, _),
            Multiply(
              Sqrt(Cast(DotProductLong(a2, a3), DoubleType, _, _)),
              Sqrt(Cast(DotProductLong(b2, b3), DoubleType, _, _)), _),
            _)
          if a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) =>
        CosineSimLong(a, b)
    }
}
