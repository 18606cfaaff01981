package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, ExprId, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** A whole-operator as-of join, built the Catalyst way (SURVEY.md §2.4 J4:
  * the reference SPECIFIES interval/as-of semantics for player plus-minus
  * but never implements them; Spark has no native as-of join).
  *
  * Semantics: for every left row, attach the single most recent right row
  * of the same key with rightTime <= leftTime (backward as-of, left
  * outer — null when no earlier right row exists).
  *
  * Why a custom operator instead of the window/last-ignoreNulls rewrite
  * (q17): the rewrite unions both tables through ONE window sort, so the
  * whole combined stream shuffles and sorts together, and the right
  * table's payload columns ride along for the entire window pass. This
  * exec keeps the two sides separate — each shuffles only on its key and
  * sorts only (key, time) — then streams a per-partition merge with O(1)
  * state (the last matching right row). At 100 TB that is the difference
  * between sorting (L + R) wide rows together and sorting each side
  * narrow, and the merge itself never buffers a partition.
  *
  * Columns are referenced BY NAME, not by Attribute: when both sides
  * derive from the same table, analysis rewrites the right child's
  * expression ids (DeduplicateRelations), which would orphan any captured
  * references. Names are resolved against the CURRENT child outputs at
  * planning/execution time; output value attributes are pre-allocated in
  * the constructor so their ids survive tree copies. Key/time columns
  * must be LongType and names must be unambiguous on each side.
  *
  * Plumbing: logical [[AsOfJoin]] → [[AsOfJoinStrategy]] (planner) →
  * [[AsOfJoinExec]] (physical merge). Registered at session start via
  * spark.sql.extensions=graft.plans.GraftExtensions, or on a live
  * session through GraftBridge.addStrategy.
  */
/** An output value column: plain data, NOT Expression-typed, so tree
  * transforms and plan canonicalization leave it alone; the attribute is
  * re-materialized on demand with its stable ExprId. */
case class AsOfValue(src: String, out: String,
    dataType: org.apache.spark.sql.types.DataType, exprId: ExprId) {
  def toAttribute: AttributeReference =
    AttributeReference(out, dataType, nullable = true)(exprId = exprId)
}

case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keyName: String,
    leftTimeName: String,
    rightTimeName: String,
    values: Seq[AsOfValue]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ values.map(_.toAttribute)
  override def producedAttributes: AttributeSet =
    AttributeSet(values.map(_.toAttribute))
  // Name-based resolution is invisible to the optimizer, so declare every
  // child column as referenced — otherwise ColumnPruning would strip the
  // key/time/value columns out from under the exec. Callers pre-project
  // both sides narrow, so nothing is lost at scale.
  override def references: AttributeSet = AttributeSet(children.flatMap(_.output))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, k, lt, rt, vs) =>
      AsOfJoinExec(planLater(l), planLater(r), k, lt, rt, vs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    keyName: String,
    leftTimeName: String,
    rightTimeName: String,
    values: Seq[AsOfValue]) extends BinaryExecNode {

  private def byName(atts: Seq[Attribute], n: String): Attribute =
    atts.find(_.name == n).getOrElse(
      throw new IllegalStateException(s"as-of join: no column '$n' in $atts"))
  private def lKey = byName(left.output, keyName)
  private def rKey = byName(right.output, keyName)
  private def lTime = byName(left.output, leftTimeName)
  private def rTime = byName(right.output, rightTimeName)

  override def output: Seq[Attribute] = left.output ++ values.map(_.toAttribute)
  override def producedAttributes: AttributeSet =
    AttributeSet(values.map(_.toAttribute))

  // Co-partition both sides on the key; sort each side by (key, time).
  // EnsureRequirements inserts the exchanges/sorts — the same contract
  // sort-merge join uses, so AQE and exchange reuse apply unchanged.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(lKey :: Nil) :: ClusteredDistribution(rKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey, Ascending), SortOrder(lTime, Ascending)),
    Seq(SortOrder(rKey, Ascending), SortOrder(rTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    // bindReference is generic in the expression type: binding an
    // Attribute would cast the BoundReference back to Attribute and
    // throw, so widen to Expression explicitly.
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lk = BindReferences.bindReference[Expression](lKey, left.output)
    val lt = BindReferences.bindReference[Expression](lTime, left.output)
    val rk = BindReferences.bindReference[Expression](rKey, right.output)
    val rt = BindReferences.bindReference[Expression](rTime, right.output)
    // Right side relaxed to nullable IN THE INPUT SCHEMA: BoundReference
    // nullability comes from the bind-time schema, and the left-outer
    // null row must project as NULL even when the right column is
    // statically non-nullable.
    val rightNullable = right.output.map(_.withNullability(true))
    val projExprs = left.output ++
      values.map(v => byName(rightNullable, v.src))
    val inputSchema = left.output ++ rightNullable
    val rightWidth = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(projExprs, inputSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      // One-row lookahead over the sorted right side. Rows coming out of
      // a sort are reused buffers: anything retained across next() calls
      // must be copied. NULL handling: a naive asInstanceOf[Long] would
      // silently unbox NULL to 0 and match rows as key/time 0 — instead a
      // right row with null key or time is skipped (it can participate in
      // no as-of ordering), and a left row with null key or time emits the
      // null-extended row, preserving left-outer semantics. The required
      // sort orders NULLS FIRST, so skipped rows are a prefix and the
      // merge invariant holds.
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTime = 0L
      var rHas = false
      def advanceRight(): Unit = {
        rHas = false
        while (!rHas && rIter.hasNext) {
          rHead = rIter.next()
          val k = rk.eval(rHead)
          val t = rt.eval(rHead)
          if (k != null && t != null) {
            rHeadKey = k.asInstanceOf[Long]
            rHeadTime = t.asInstanceOf[Long]
            rHas = true
          }
        }
      }
      advanceRight()

      var lastKey = Long.MinValue
      var lastMatch: InternalRow = null

      lIter.map { l =>
        val keyAny = lk.eval(l)
        val timeAny = lt.eval(l)
        if (keyAny == null || timeAny == null) proj(joined(l, nullRight))
        else {
          val key = keyAny.asInstanceOf[Long]
          val time = timeAny.asInstanceOf[Long]
          while (rHas && (rHeadKey < key || (rHeadKey == key && rHeadTime <= time))) {
            if (rHeadKey == key) { lastKey = key; lastMatch = rHead.copy() }
            advanceRight()
          }
          val r = if (lastKey == key && lastMatch != null) lastMatch else nullRight
          proj(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Session-extension registration (spark.sql.extensions=graft.plans.GraftExtensions):
  * the as-of planner strategy plus the custom dot_long expression as a
  * SQL-callable function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.functions.CosineFusionRule)
    ext.injectOptimizerRule(session => MvRewriteRule(session))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProductLong].getName, "dot_long"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProductLong(children.head, children(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.CosineSimLong].getName, "cosine_long"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimLong(children.head, children(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NfcNormalize(children.head)))
  }
}

/** User-facing API: backward as-of join on LongType key/time columns. */
object AsOf {
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[(String, String)]): DataFrame = {
    val spark = left.sparkSession
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    val lplan = GraftBridge.analyzed(left)
    val rplan = GraftBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output}"))
    require(attr(lplan, key).dataType == LongType &&
      attr(rplan, key).dataType == LongType &&
      attr(lplan, leftTime).dataType == LongType &&
      attr(rplan, rightTime).dataType == LongType,
      "as-of join requires LongType key/time columns")
    val values = valueCols.map { case (src, out) =>
      AsOfValue(src, out, attr(rplan, src).dataType, NamedExpression.newExprId)
    }
    GraftBridge.ofRows(spark,
      AsOfJoin(lplan, rplan, key, leftTime, rightTime, values))
  }
}
