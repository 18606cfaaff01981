package graft.plans

import java.nio.file.{Files, Path, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.optimizer.ConstantFolding
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.{GraftFilesScan, GraftMv, GraftTableMeta, GraftVersions}

/** MATERIALIZED-VIEW QUERY REWRITE: an aggregate a registered view
  * already maintains is answered from the view, never from the corpus.
  *
  *   SELECT <key>, SUM(<sum>), COUNT(*) FROM src GROUP BY <key>
  *
  * becomes a projection over the |groups|-row view table — at 100 TB
  * the difference between a full corpus scan + shuffle and a
  * metadata-sized read. This is the classic Calcite/Databricks MV
  * rewrite, scoped to what [[GraftMv]] maintains exactly.
  *
  * Soundness gates, every one mandatory:
  *
  *  - the aggregate's child is a scan of the source that is bare up
  *    to RESIDUAL predicates ([[GraftFilesScan.residualSnapshotPin]]):
  *    a WHERE whose every conjunct is a deterministic function of the
  *    view KEY is re-applied over view rows (a key-only predicate
  *    admits or rejects each group wholesale — the reference's own
  *    filter-then-aggregate shape, Assignment-python.py:312→:314);
  *    any predicate touching a non-key column, a change-feed read, or
  *    a file whitelist disqualifies. A bare TIME-TRAVEL pin
  *    `VERSION AS OF v` is admitted: it substitutes the MV's OWN
  *    historical snapshot whose refresh watermark is exactly v
  *    (replace-all refresh semantics make that commit the complete
  *    aggregate of the source at v);
  *  - the grouping expression and every aggregate expression match the
  *    view's declared key/sum CANONICALLY (the view's persisted SQL is
  *    re-analyzed against the query's own relation, so type coercion
  *    and constant folding land on both sides before comparison);
  *    recognized shapes: the key itself (or, in ROLL-UP form, any
  *    deterministic function of it, including the global aggregate),
  *    `SUM(<sum>)` (non-distinct, unfiltered), `COUNT(*)`/`COUNT(1)`,
  *    `AVG(<sum>)` (= SUM(fp)/SUM(n_words)),
  *    `COUNT(DISTINCT <key>)` (= the view's group count), and —
  *    against a matching `agg='min'/'max'` view over an INTEGRAL
  *    value — `MIN/MAX(<sum>)` (fp at the view grain,
  *    extremum-of-extrema under roll-up);
  *  - the view is FRESH for live scans: its refresh ledger holds
  *    exactly the source's current version. Auto-registered views
  *    (`create_mv(..., auto = true)`) maintain this on every source
  *    commit, but the rule re-checks the ledger rather than trusting
  *    the registration — a stale view silently answering is the one
  *    unacceptable failure. (Freshness is read at PLAN time; a source
  *    commit racing query execution lands after this query's snapshot
  *    either way.)
  *
  * Registered per session via [[org.apache.spark.sql.GraftBridge
  * .addOptimization]] (runtime) or `spark.sql.extensions =
  * graft.plans.GraftExtensions` (config-time); `spark.graft.mv.rewrite
  * = false` disables it. The rule runs in the user-rule batch AFTER
  * DSv2 pushdown, so the substituted view subtree is pre-optimized
  * through its own mini-pipeline (yielding a ready
  * [[DataSourceV2ScanRelation]], which the planner accepts directly).
  */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.mv.rewrite", "true").toBoolean)
      return plan
    plan.transformUp {
      // any GROUP BY arity: single- and composite-key views answer
      // their own grain exactly and any coarser grain by roll-up; the
      // global aggregate (no GROUP BY) is the coarsest roll-up
      case agg @ Aggregate(groupEs, aggExprs, child, _) =>
        tryRewrite(agg, groupEs, aggExprs, child)
          .orElse(tryRewriteJoin(groupEs, aggExprs, child))
          .getOrElse(agg)
    }
  }

  /** The aggregate's child as (scan relation, source table dir,
    * alias-inliner, time-travel pin, residual predicates) — only when
    * it is a graft scan (live, or version-pinned; pushed FILE-pruning
    * state is admitted because this source keeps every pushed filter
    * residual, see [[GraftFilesScan.residualSnapshotPin]]) under
    * projections that merely prune columns or name expressions (the
    * optimizer's PullOutGroupingExpressions puts the grouping
    * expression in exactly such a Project; the inliner folds those
    * aliases back so the comparison sees the original expression over
    * the relation's own attributes) and Filters whose predicates are
    * collected — already inlined to scan attributes — for the caller
    * to prove key-only and re-apply over view rows. */
  private def bareSource(plan: LogicalPlan): Option[
      (DataSourceV2ScanRelation, Path, Expression => Expression,
        Option[Long], Seq[Expression])] =
    plan match {
      case Project(ps, inner) if ps.forall(pe =>
          pe.isInstanceOf[AttributeReference] || pe.isInstanceOf[Alias]) =>
        bareSource(inner).map { case (rel, dir, inlineInner, pin, preds) =>
          val aliasMap: Map[ExprId, Expression] =
            ps.collect { case a: Alias => a.exprId -> a.child }.toMap
          val inline: Expression => Expression = e =>
            inlineInner(e.transformUp {
              case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
                aliasMap(ar.exprId)
            })
          (rel, dir, inline, pin, preds)
        }
      case Filter(cond, inner) =>
        bareSource(inner).map { case (rel, dir, inlineInner, pin, preds) =>
          (rel, dir, inlineInner, pin, preds :+ inlineInner(cond))
        }
      case r: DataSourceV2ScanRelation => r.scan match {
        case s: GraftFilesScan =>
          s.residualSnapshotPin.map(pin =>
            (r, Paths.get(s.tablePath), identity[Expression] _, pin,
              Seq.empty[Expression]))
        case _ => None
      }
      case _ => None
    }

  /** Re-analyze a persisted view expression against the QUERY's own
    * relation (same attribute ids), apply coercion + folding — the two
    * sides are then canonically comparable. The probe can come back
    * PARTIALLY UNRESOLVED without throwing (analyzer.execute runs no
    * checkAnalysis) when the query's scan pruned away a column the
    * view expression needs — that is NOT a refusal in itself (a query
    * that never touches the sum column, like a global COUNT(*), still
    * answers from the view), but every comparison against a probe
    * expression must go through [[canonEq]], which refuses unresolved
    * operands instead of letting `.canonicalized` explode on them. */
  private def resolveAgainst(sql: String, rel: LogicalPlan)
      : Option[Expression] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer.execute(
        Project(Seq(Alias(parsed, "__mv_probe")()), rel))
      ConstantFolding(analyzed).collectFirst {
        case Project(Seq(a: Alias), _) => a.child
      }
    } catch { case NonFatal(_) => None }

  /** Canonical equality that tolerates (by refusing) partially
    * unresolved probe expressions — `.canonicalized` on those throws. */
  private def canonEq(a: Expression, b: Expression): Boolean =
    a.resolved && b.resolved && a.canonicalized == b.canonicalized

  private sealed trait MvCol
  // i-th key column (exact branch: index into the view's key list;
  // roll-up branch: index into the query's grouping-expression list)
  private case class KeyCol(idx: Int) extends MvCol
  private case object SumCol extends MvCol
  private case object CntCol extends MvCol
  // AVG(<sum>) = SUM(fp) / SUM(n_words) — one IEEE division of two
  // EXACT integer sums. Spark's Average over integral input instead
  // accumulates its numerator in DOUBLE (per-addition rounding), so
  // once a group's sum exceeds 2^53 the rewritten value can differ
  // from the unrewritten plan in the last ulp — in that regime the
  // exact-sum division is the MORE accurate of the two. The rewrite
  // contract accepts that ulp-level divergence explicitly (identical
  // below 2^53, ≤1 ulp above); a caller needing bit-replay of
  // Average's rounding must disable the rule.
  private case object AvgCol extends MvCol
  // COUNT(DISTINCT <key...>) over the FULL key set = the number of
  // view GROUPS (each view row is one distinct key tuple) — COUNT(*)
  // over view rows
  private case object DistinctKeyCol extends MvCol
  // MIN/MAX views: the query's MIN(<sum>)/MAX(<sum>) maps to fp at
  // the view grain and to extremum-of-extrema under roll-up. Gated on
  // an INTEGRAL <sum> type: the view stores the value cast to BIGINT,
  // and only integral casts preserve ordering (and invert losslessly
  // back to the query's own output type)
  private case object ExtCol extends MvCol

  private def integral(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType => true
      case _ => false
    }

  /** Does `e` canonically match a member of key class `cls`? */
  private def inClass(cls: Seq[Expression], e: Expression): Boolean =
    cls.exists(canonEq(_, e))

  /** `es` covers the key classes exactly: every expression is a key,
    * every key column is named (the COUNT(DISTINCT k1, k2) /
    * GROUP-BY-all-keys shape, order-insensitive). */
  private def coversAllKeys(es: Seq[Expression],
      keyClasses: Seq[Seq[Expression]]): Boolean =
    es.forall(e => keyClasses.exists(inClass(_, e))) &&
      keyClasses.forall(cls => es.exists(inClass(cls, _)))

  /** Map one aggregate-list expression onto a view column, or refuse.
    * `aggKind` is the view's maintained aggregate: SUM/AVG shapes
    * match only a sum view, MIN/MAX only the matching extremum view;
    * COUNT shapes match every kind (n_words is always the live
    * count). `keyClasses` has one entry per view KEY COLUMN (composite
    * views have several); each entry is that key's EQUIVALENCE CLASS:
    * just the key expression for single-table views; for join views,
    * when the key IS one of the equi-join sides, all transitively
    * join-equal expressions (they are equal on every joined row, hence
    * on every row the view aggregates). `decimalSum` marks a view
    * whose sum column stores unscaled DECIMAL values: SUM still
    * matches (the substitution re-scales exactly); AVG refuses —
    * Spark's decimal Average has its own output scale and HALF_UP
    * rounding this rewrite does not replicate. */
  private def classify(e: Expression, keyClasses: Seq[Seq[Expression]],
      sumE: Expression, aggKind: String, decimalSum: Boolean)
      : Option[MvCol] = e match {
    case ae: AggregateExpression if ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case s: Sum if aggKind == "sum" && !ae.isDistinct &&
            canonEq(s.child, sumE) =>
          Some(SumCol)
        case c: Count if !ae.isDistinct && c.children.length == 1 &&
            c.children.head.foldable && !c.children.head.nullable =>
          Some(CntCol)
        case a: Average if aggKind == "sum" && !decimalSum &&
            !ae.isDistinct && canonEq(a.child, sumE) =>
          Some(AvgCol)
        case m: Min if aggKind == "min" && !ae.isDistinct &&
            canonEq(m.child, sumE) && integral(sumE.dataType) =>
          Some(ExtCol)
        case m: Max if aggKind == "max" && !ae.isDistinct &&
            canonEq(m.child, sumE) && integral(sumE.dataType) =>
          Some(ExtCol)
        case c: Count if ae.isDistinct &&
            c.children.length == keyClasses.length &&
            coversAllKeys(c.children, keyClasses) =>
          Some(DistinctKeyCol)
        case _ => None
      }
    case _ =>
      keyClasses.zipWithIndex.collectFirst {
        case (cls, i) if inClass(cls, e) => KeyCol(i)
      }
  }

  private def tryRewrite(agg: Aggregate, groupRaw: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan)
      : Option[LogicalPlan] = {
    val (rel, srcDir, inline, srcPin, preds) =
      bareSource(child).getOrElse(return None)
    // pushed pruning state with NO retained predicate collected means
    // the optimizer removed a (therefore semantically-true) filter —
    // harmless in principle, but refuse conservatively: a bare scan is
    // the only no-predicate shape this rule vouches for
    if (preds.isEmpty && rel.scan.asInstanceOf[GraftFilesScan]
        .bareSnapshotPin.isEmpty) return None
    val groupEs = groupRaw.map(inline)
    val srcName = srcDir.getFileName.toString
    val srcVersion = GraftVersions.latest(srcDir).map(_.version)
      .getOrElse(return None)
    val candidates = GraftTableMeta.read(srcDir).get("mv.dependents")
      .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).distinct
    val rewrites = candidates.map(srcDir.resolveSibling(_)).flatMap { mvDir =>
      if (!Files.isDirectory(mvDir)) None
      else {
        val props = GraftTableMeta.read(mvDir)
        for {
          _ <- props.get("mv.name")
          // join views never serve the single-table path: their
          // f./d.-qualified expressions fail resolveAgainst anyway,
          // but a degenerate view (constant key/sum) WOULD resolve —
          // and would then answer with no dim-freshness check
          _ <- if (props.contains("mv.dim") ||
              props.contains("mv.dims")) None else Some(())
          src <- props.get("mv.source") if src == srcName
          keyE <- resolveAgainst(props("mv.key"), rel)
          // composite views carry a second key column (mv.key2)
          key2E <- props.get("mv.key2") match {
            case None => Some(None)
            case Some(k2) => resolveAgainst(k2, rel).map(Some(_))
          }
          sumE <- resolveAgainst(props("mv.sum"), rel)
          aggKind = props.getOrElse("mv.agg", "sum")
          // DECIMAL-sum views store unscaled values; the substitution
          // re-scales exactly (MakeDecimal) at the query's own type
          sumScale = props.get("mv.sum.scale").map(_.toInt)
          keyClasses = Seq(Seq(keyE)) ++ key2E.toSeq.map(Seq(_))
          // Which MV snapshot answers this scan's row set?
          //  - live scan: the view must be FRESH (ledger exactly at
          //    the source's current version) and is read live;
          //  - time-travel scan `VERSION AS OF v`: the MV commit whose
          //    refresh watermark is EXACTLY v folded precisely the
          //    source state at v (replace-all refresh semantics), so
          //    the view's own history answers the historical
          //    aggregate at |groups| cost — no match, no rewrite
          //    (vacuumed MV history falls back to the corpus scan).
          mvPin <- srcPin match {
            case None =>
              GraftVersions.lastTxnEpoch(mvDir, GraftMv.AppId)
                .filter(_ == srcVersion).map(_ => Option.empty[Long])
            case Some(v) =>
              GraftVersions.listVersions(mvDir)
                .find(_.txn.contains((GraftMv.AppId, v)))
                .map(m => Some(m.version))
          }
          rewritten <- {
            // exact match: the query groups at PRECISELY the view's
            // grain — every grouping expression is a key, every key
            // column is named (any order) — so the view's rows ARE
            // the answer: pure projection, no aggregate at all
            val exact = groupEs.nonEmpty &&
              groupEs.forall(_.dataType == LongType) &&
              coversAllKeys(groupEs, keyClasses)
            if (exact)
              traverse(aggExprs.map { ne =>
                classify(inline(stripAlias(ne)), keyClasses, sumE,
                  aggKind, sumScale.isDefined).map(ne -> _)
              }).flatMap(substitute(
                mvDir, mvPin, _, preds, keyClasses, sumScale))
            // roll-up: the query groups COARSER than the view (each
            // grouping expression is a function of the view's keys,
            // incl. the global "no group" case) — re-aggregate the
            // |groups|-row view
            else
              traverse(aggExprs.map { ne =>
                classifyRollup(inline(stripAlias(ne)), groupEs,
                  keyClasses, sumE, aggKind, sumScale.isDefined)
                  .map(ne -> _)
              }).flatMap(substituteRollup(mvDir, mvPin, groupEs,
                keyClasses, _, preds, aggKind, sumScale))
          }
        } yield (rewritten, viewRows(mvDir, mvPin))
      }
    }
    // COST CHOICE among matching views: with roll-ups several
    // registered views can answer the same query (a finer view always
    // also matches what its own roll-up matches) — pick the one with
    // the fewest live rows, read off its manifest row counters (the
    // same numbers SupportsReportStatistics serves the CBO), i.e. the
    // cheapest scan-and-reaggregate. Ties keep registration order.
    rewrites.minByOption(_._2).map(_._1)
  }

  /** A view snapshot's live row count from its manifest counters —
    * zero data files opened; Long.MaxValue (never preferred) when the
    * manifest is unreadable. */
  private def viewRows(mvDir: Path, pin: Option[Long]): Long =
    try pin.map(m => Some(GraftVersions.manifest(mvDir, m)))
      .getOrElse(GraftVersions.latest(mvDir))
      .map(_.entries.flatMap(_.liveRows).sum)
      .getOrElse(Long.MaxValue)
    catch { case NonFatal(_) => Long.MaxValue }

  /** Roll-up classification: aggregates map exactly like [[classify]]
    * (the distinct-key count stays legal — per coarse group it is the
    * number of VIEW rows in that group; MIN/MAX roll up as
    * extremum-of-extrema), and any non-aggregate output must BE one
    * of the (coarse) grouping expressions. */
  private def classifyRollup(e: Expression, groupEs: Seq[Expression],
      keyClasses: Seq[Seq[Expression]], sumE: Expression,
      aggKind: String, decimalSum: Boolean): Option[MvCol] = e match {
    case _: AggregateExpression =>
      classify(e, keyClasses, sumE, aggKind, decimalSum)
    case _ =>
      groupEs.zipWithIndex.collectFirst {
        case (g, i) if g.canonicalized == e.canonicalized => KeyCol(i)
      }
  }

  private def stripAlias(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case other => other
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None

  /** Pre-optimized scan of the view's value columns, keyed by name —
    * the building block both substitution shapes share. Composite
    * views additionally read `title` (their second key column lives
    * there as a canonical decimal string); single-key views prune it.
    * `pin = Some(m)` reads the MV's OWN snapshot m (the historical
    * substitution); None reads it live. */
  private def viewScan(mvDir: Path, pin: Option[Long],
      withTitle: Boolean)
      : Option[(DataSourceV2ScanRelation, Map[String, Attribute])] = {
    val cols = if (withTitle) Seq("doc_id", "title", "fp", "n_words")
      else Seq("doc_id", "fp", "n_words")
    val reader = spark.read.format("graft.sources.GraftDocsSource")
      .option("path", mvDir.toString)
    val mvPlan = pin.fold(reader)(m =>
        reader.option("versionAsOf", m.toString)).load()
      .select(cols.head, cols.tail: _*)
      .queryExecution.optimizedPlan
    val scanRel = mvPlan.collectFirst {
      case s: DataSourceV2ScanRelation => s
    }.getOrElse(return None)
    val byName: Map[String, Attribute] =
      scanRel.output.map(a => a.name -> (a: Attribute)).toMap
    if (!cols.forall(byName.contains)) None
    else Some((scanRel, byName))
  }

  /** One view-side replacement expression per key column: key 1 IS
    * `doc_id`; a composite view's key 2 is `title` decoded back to
    * BIGINT (the stored string is the canonical decimal rendering of
    * a guarded-non-null long, so the cast inverts it exactly). */
  private def viewKeyExprs(byName: Map[String, Attribute], n: Int)
      : Seq[Expression] =
    if (n == 1) Seq(byName("doc_id"))
    else Seq(byName("doc_id"), Cast(byName("title"), LongType, None))

  /** The attribute ids a key-rewritten expression may reference. */
  private def keyAttrIds(byName: Map[String, Attribute], n: Int)
      : Set[ExprId] =
    (Seq(byName("doc_id")) ++
      (if (n > 1) Seq(byName("title")) else Nil)).map(_.exprId).toSet

  /** The query's residual predicates re-applied over VIEW rows: each
    * predicate must rewrite through [[overKeys]] (a deterministic
    * function of the view keys alone), which is exactly the soundness
    * condition — a key-only predicate passes or fails each GROUP
    * wholesale, so filtering the \|groups\|-row view selects precisely
    * the groups whose source rows all survived the original WHERE.
    * Any predicate referencing a non-key column refuses (per-row
    * filters change group contents; the corpus plan stands). */
  private def filtered(scanRel: DataSourceV2ScanRelation,
      reps: Seq[(Seq[Expression], Expression)], allowed: Set[ExprId],
      preds: Seq[Expression]): Option[LogicalPlan] =
    if (preds.isEmpty) Some(scanRel)
    else {
      val rewritten = preds.map(p => overKeys(p, reps, allowed))
      if (rewritten.exists(_.isEmpty)) None
      else Some(Filter(rewritten.flatten.reduce(And), scanRel))
    }

  /** The SUM replacement at the view's own grain: `fp` directly for
    * integral sums; DECIMAL sums re-scale the stored unscaled value at
    * the query's own output type (MakeDecimal — the exact inverse of
    * the unscaled store, refusing on a scale mismatch). */
  private def sumReplacement(fpE: Expression, ne: NamedExpression,
      sumScale: Option[Int]): Option[Expression] = sumScale match {
    case None => Some(fpE)
    case Some(s) => ne.dataType match {
      case d: org.apache.spark.sql.types.DecimalType if d.scale == s =>
        Some(MakeDecimal(fpE, d.precision, d.scale,
          nullOnOverflow = !org.apache.spark.sql.internal.SQLConf.get
            .ansiEnabled))
      case _ => None
    }
  }

  /** Build the replacement: a pre-optimized scan of the view (behind
    * the query's own key-predicate when one was present) plus a
    * projection that re-binds every original output attribute id —
    * consumers above the aggregate never notice the swap. */
  private def substitute(mvDir: Path, pin: Option[Long],
      cols: Seq[(NamedExpression, MvCol)], preds: Seq[Expression],
      keyClasses: Seq[Seq[Expression]], sumScale: Option[Int])
      : Option[LogicalPlan] = {
    val (scanRel, byName) = viewScan(mvDir, pin, keyClasses.size > 1)
      .getOrElse(return None)
    val keyReps = viewKeyExprs(byName, keyClasses.size)
    val allowed = keyAttrIds(byName, keyClasses.size)
    val base = filtered(scanRel, keyClasses.zip(keyReps), allowed, preds)
      .getOrElse(return None)
    val projections = cols.map { case (ne, col) =>
      val replacement: Expression = col match {
        case KeyCol(i) => keyReps(i)
        case SumCol =>
          sumReplacement(byName("fp"), ne, sumScale)
            .getOrElse(return None)
        case CntCol => Cast(byName("n_words"), LongType, None)
        // AVG at the view's own grain is the per-row ratio of the
        // exact integer sums (see AvgCol for the ulp contract)
        case AvgCol => Divide(
          Cast(byName("fp"), DoubleType, None),
          Cast(byName("n_words"), DoubleType, None))
        // MIN/MAX at the view grain IS fp; the cast back to the
        // query's own (integral, hence lossless) output type inverts
        // the view's cast-to-BIGINT exactly
        case ExtCol =>
          if (ne.dataType == LongType) byName("fp")
          else Cast(byName("fp"), ne.dataType, None)
        // COUNT(DISTINCT key...) grouped at the view grain is 1
        case DistinctKeyCol => Literal(1L)
      }
      if (replacement.dataType != ne.dataType) return None
      Alias(replacement, ne.name)(exprId = ne.exprId)
    }
    Some(Project(projections, base))
  }

  /** Rewrite `e` as an expression over the view's key columns: every
    * maximal subtree canonically equal to a view key expression
    * becomes that key's view-side replacement; valid only when NO
    * source attribute survives outside such a subtree (then the
    * query's group is a pure function of the view's group — each query
    * group is a disjoint union of view groups, so SUM re-aggregates
    * and COUNT(*) sums the view's counts). The substitution is only
    * type-preserving when every key expression already IS BIGINT (the
    * view's stored key type): a narrower key nested inside wider
    * arithmetic (`CAST(int_key * 2 AS STRING)`) would change
    * evaluation semantics even though the final output type check
    * still passes — so a non-BIGINT key refuses here, same gate as the
    * exact-match branch. Each entry of `reps` pairs one key column's
    * EQUIVALENCE CLASS (see [[classify]]) with its replacement — any
    * member substitutes. */
  private def overKeys(e: Expression,
      reps: Seq[(Seq[Expression], Expression)], allowed: Set[ExprId])
      : Option[Expression] = {
    if (!reps.forall(_._1.forall(m =>
        m.resolved && m.dataType == LongType))) return None
    val rewritten = e.transformDown {
      case sub if reps.exists(r => inClass(r._1, sub)) =>
        reps.find(r => inClass(r._1, sub)).get._2
    }
    if (rewritten.deterministic &&
        rewritten.references.forall(a => allowed.contains(a.exprId)))
      Some(rewritten)
    else None
  }

  /** Build the ROLL-UP replacement: re-aggregate the \|groups\|-row
    * view at the query's coarser grain —
    *
    *   SELECT f(doc_id), SUM(fp), SUM(n_words)
    *   FROM view GROUP BY f(doc_id)
    *
    * (sum-of-sums / sum-of-counts; `groupE = None` is the global
    * aggregate). Emitted in the planner-normal shape (grouping key
    * pulled into a Project below the Aggregate), so no later
    * normalization pass is needed. COUNT(*) is non-nullable while
    * SUM is nullable — the coalesce restores the exact type; its 0
    * branch is reached when a residual key predicate filters out
    * every view row (COUNT over an empty global selection is 0 while
    * SUM is NULL — exactly the source plan's semantics). */
  private def substituteRollup(mvDir: Path, pin: Option[Long],
      groupEs: Seq[Expression], keyClasses: Seq[Seq[Expression]],
      cols: Seq[(NamedExpression, MvCol)], preds: Seq[Expression],
      aggKind: String, sumScale: Option[Int]): Option[LogicalPlan] = {
    val (scanRel, byName) = viewScan(mvDir, pin, keyClasses.size > 1)
      .getOrElse(return None)
    val keyReps = viewKeyExprs(byName, keyClasses.size)
    val allowed = keyAttrIds(byName, keyClasses.size)
    val reps = keyClasses.zip(keyReps)
    val fp = byName("fp"); val nw = byName("n_words")
    val base = filtered(scanRel, reps, allowed, preds)
      .getOrElse(return None)
    val coarseAliases = groupEs.map { g =>
      val coarse = overKeys(g, reps, allowed).getOrElse(return None)
      Alias(coarse, "_mv_rollup_key")()
    }
    val pre = Project(coarseAliases ++ Seq(fp, nw), base)
    val cks = coarseAliases.map(_.toAttribute)
    def agg(f: Expression): Expression =
      AggregateExpression(Sum(f), Complete, isDistinct = false)
    val projections = cols.map { case (ne, col) =>
      val replacement: Expression = col match {
        case KeyCol(i) => cks(i)
        case SumCol =>
          sumReplacement(agg(fp), ne, sumScale).getOrElse(return None)
        case CntCol =>
          Coalesce(Seq(agg(Cast(nw, LongType, None)), Literal(0L)))
        // AVG over source rows = total/count from the view's exact
        // integer sums — one IEEE division (NULL/NULL on an empty
        // global aggregate, exactly like Average on zero rows; see
        // AvgCol for the >2^53 ulp contract)
        case AvgCol => Divide(
          Cast(agg(fp), DoubleType, None),
          Cast(agg(Cast(nw, LongType, None)), DoubleType, None))
        // MIN/MAX roll up as extremum-of-extrema over view rows (a
        // coarse group's extremum is attained in one of its view
        // groups); NULL on an empty global aggregate, like the source
        case ExtCol =>
          val ext = AggregateExpression(
            if (aggKind == "min") Min(fp) else Max(fp), Complete,
            isDistinct = false)
          if (ne.dataType == LongType) ext
          else Cast(ext, ne.dataType, None)
        // COUNT(DISTINCT key...) per coarse group = #view rows in it
        case DistinctKeyCol =>
          Coalesce(Seq(
            AggregateExpression(Count(Seq(Literal(1))), Complete,
              isDistinct = false), Literal(0L)))
      }
      if (replacement.dataType != ne.dataType) return None
      Alias(replacement, ne.name)(exprId = ne.exprId)
    }
    Some(Aggregate(cks, projections, pre))
  }

  // ------------------------------------------------------------------
  // JOIN-VIEW (SPJG) rewrite: aggregate over fact ⋈ dim answered from
  // a registered join view — the Calcite class the league table
  // exercises (aggregate over orders⋈customer⋈nation,
  // Assignment-python.py:183-185 → :257).
  // ------------------------------------------------------------------

  /** The aggregate's child as an INNER equi-join of two graft scans,
    * with the alias-inliner for expressions above the join and any
    * Filter predicates collected between the Aggregate and the Join
    * (already inlined) — the caller proves them key-only and
    * re-applies them over view rows, exactly like the single-table
    * filtered substitution. */
  private def joinedSource(plan: LogicalPlan)
      : Option[(Join, Expression => Expression, Seq[Expression])] =
    plan match {
      case Project(ps, inner) if ps.forall(pe =>
          pe.isInstanceOf[AttributeReference] || pe.isInstanceOf[Alias]) =>
        joinedSource(inner).map { case (j, inlineInner, preds) =>
          val aliasMap: Map[ExprId, Expression] =
            ps.collect { case a: Alias => a.exprId -> a.child }.toMap
          val inline: Expression => Expression = e =>
            inlineInner(e.transformUp {
              case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
                aliasMap(ar.exprId)
            })
          (j, inline, preds)
        }
      case Filter(cond, inner) =>
        joinedSource(inner).map { case (j, inlineInner, preds) =>
          (j, inlineInner, preds :+ inlineInner(cond))
        }
      case j: Join => Some((j, identity[Expression] _,
        Seq.empty[Expression]))
      case _ => None
    }

  /** Flatten a LEFT-DEEP chain of INNER equi-joins below the top
    * wrappers: returns the base side plans (fact/dims, each possibly
    * behind its own Filter/Project, which [[bareSource]] handles),
    * every join condition, and any predicates sitting BETWEEN joins
    * (a multi-side WHERE the optimizer could push no further).
    * Attribute-only Projects between joins pass through (column
    * pruning); an alias-bearing one refuses — its remapping is not
    * tracked here. */
  private def flattenJoinTree(plan: LogicalPlan)
      : Option[(Seq[LogicalPlan], Seq[Expression], Seq[Expression])] =
    plan match {
      case Project(ps, inner)
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        flattenJoinTree(inner)
      case Filter(cond, inner) =>
        flattenJoinTree(inner).map { case (b, cs, fs) =>
          (b, cs, fs :+ cond)
        }
      case Join(l, r, Inner, Some(c), _) =>
        flattenJoinTree(l) match {
          case Some((bases, conds, fs)) =>
            Some((bases :+ r, conds :+ c, fs))
          case None => Some((Seq(l, r), Seq(c), Nil))
        }
      case _ => None
    }

  /** Split an expression on AND into conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** Match the query's equi-join conjuncts against the view's
    * conditions: a BIJECTION (either orientation per condition) must
    * exist; leftover conjuncts are returned for the caller to prove
    * key-only (a key-only extra conjunct inside a join condition is
    * semantically a WHERE over joined rows). */
  private def matchConds(qconds: Seq[Expression],
      viewConds: Seq[(Expression, Expression)])
      : Option[Seq[Expression]] = {
    val all = qconds.flatMap(conjuncts)
    val used = Array.fill(viewConds.length)(false)
    val leftovers = scala.collection.mutable.Buffer.empty[Expression]
    def matches(a: Expression, b: Expression,
        c: (Expression, Expression)): Boolean =
      (canonEq(a, c._1) && canonEq(b, c._2)) ||
        (canonEq(b, c._1) && canonEq(a, c._2))
    all.foreach {
      case eq @ EqualTo(a, b) =>
        val i = viewConds.indexWhere(c => matches(a, b, c))
        val j = if (i >= 0 && used(i))
          viewConds.indexWhere(c => matches(a, b, c), i + 1)
        else i
        if (j >= 0 && !used(j)) used(j) = true
        else leftovers += eq
      case other => leftovers += other
    }
    if (used.forall(identity)) Some(leftovers.toSeq) else None
  }

  /** The transitive join-equality closure of `seed`: every expression
    * provably equal to it on joined rows through the chain's
    * equi-join conditions. This is the key's EQUIVALENCE CLASS — a
    * grouping or predicate over ANY member rewrites over view rows
    * (covers the optimizer pushing a dim-key WHERE onto one side and
    * InferFiltersFromConstraints mirroring it onto another). */
  private def closure(seed: Expression,
      pairs: Seq[(Expression, Expression)]): Seq[Expression] = {
    var cls = Seq(seed)
    var changed = true
    while (changed) {
      changed = false
      pairs.foreach { case (a, b) =>
        val hasA = cls.exists(canonEq(_, a))
        val hasB = cls.exists(canonEq(_, b))
        if (hasA && !hasB) { cls = cls :+ b; changed = true }
        else if (hasB && !hasA) { cls = cls :+ a; changed = true }
      }
    }
    cls
  }

  /** A side's join-inferred `IsNotNull(<join-condition member>)`
    * predicates are dropped — semantically implied by the inner joins
    * themselves (null keys never join), so the view already accounts
    * for them. Everything else is a REAL predicate the caller must
    * prove key-only. */
  private def realSidePreds(preds: Seq[Expression],
      condEs: Seq[(Expression, Expression)]): Seq[Expression] =
    preds.filterNot {
      case IsNotNull(c) => condEs.exists { case (l, r) =>
        canonEq(c, l) || canonEq(c, r)
      }
      case _ => false
    }

  /** The analysis probe for a view's persisted alias-qualified
    * expressions: the query's OWN relations (same attribute ids)
    * under the view's aliases, joined condition-free (the probe only
    * scopes name resolution). */
  private def probeRelation(factRel: LogicalPlan,
      dims: Seq[(String, LogicalPlan)]): LogicalPlan =
    dims.foldLeft(SubqueryAlias("f", factRel): LogicalPlan) {
      case (acc, (alias, rel)) =>
        Join(acc, SubqueryAlias(alias, rel), Inner, None, JoinHint.NONE)
    }

  private def tryRewriteJoin(groupRaw: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan)
      : Option[LogicalPlan] = {
    val (join, inline, abovePreds) =
      joinedSource(child).getOrElse(return None)
    val (bases, qconds, midPreds) =
      flattenJoinTree(join).getOrElse(return None)
    val srcs = bases.map(b => bareSource(b).getOrElse(return None))
    // LIVE scans only: the historical substitution needs a watermark
    // tuple match this path does not maintain per-version
    if (srcs.exists(_._4.isDefined)) return None
    // same conservative no-predicate gate as the single-table path:
    // pushed pruning state must come WITH its retained predicate
    if (!srcs.forall(s => s._5.nonEmpty ||
        s._1.scan.asInstanceOf[GraftFilesScan].bareSnapshotPin.isDefined))
      return None
    // distinct tables only — name-keyed side matching cannot
    // disambiguate role-playing dims (mirrors the create-side refusal)
    val names = srcs.map(_._2.getFileName.toString)
    if (names.distinct.size != names.size) return None
    val groupEs = groupRaw.map(inline)
    // candidate join views from EVERY side's dependent registry
    val candidates = srcs.map(_._2).flatMap { dir =>
      GraftTableMeta.read(dir).get("mv.dependents").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        .map(dir.resolveSibling(_))
    }.distinct
    val rewrites = candidates.flatMap { mvDir =>
      if (!Files.isDirectory(mvDir)) None
      else {
        val props = GraftTableMeta.read(mvDir)
        for {
          _ <- props.get("mv.name")
          spec <- GraftMv.joinViewSpec(props)
          // every view side maps to exactly one query side by name,
          // and the query has no EXTRA side the view does not cover
          factSrc <- srcs.find(_._2.getFileName.toString == spec.factName)
          dimSrcs <- traverse(spec.dims.map(d =>
            srcs.find(_._2.getFileName.toString == d)))
          _ <- if (dimSrcs.size + 1 == srcs.size) Some(()) else None
          probe = probeRelation(factSrc._1,
            spec.aliases.zip(dimSrcs.map(_._1)))
          condEs <- traverse(spec.conds.map { case (l, r) =>
            for {
              le <- resolveAgainst(l, probe)
              re <- resolveAgainst(r, probe)
            } yield (le, re)
          })
          // the query's equi-join conjuncts must biject with the
          // view's conditions; leftover conjuncts join the predicate
          // set and must prove key-only below
          leftoverConds <- matchConds(qconds, condEs)
          // FRESH on every axis: fact ledger == fact current version,
          // each dim watermark property == that dim's current version
          factVersion <- GraftVersions.latest(factSrc._2).map(_.version)
          _ <- GraftVersions.lastTxnEpoch(mvDir, GraftMv.AppId)
            .filter(_ == factVersion)
          _ <- {
            val fresh = spec.watermarkKeys.zip(dimSrcs).forall {
              case (k, d) => props.get(k).exists(w =>
                GraftVersions.latest(d._2).map(_.version)
                  .contains(w.toLong))
            }
            if (fresh) Some(()) else None
          }
          keyE <- resolveAgainst(props("mv.key"), probe)
          sumE <- resolveAgainst(props("mv.sum"), probe)
          keyClasses = Seq(closure(keyE, condEs))
          preds = abovePreds ++ midPreds ++ leftoverConds ++
            srcs.flatMap(s => realSidePreds(s._5, condEs))
          rewritten <- {
            val exact = groupEs.nonEmpty &&
              groupEs.forall(_.dataType == LongType) &&
              coversAllKeys(groupEs, keyClasses)
            if (exact)
              traverse(aggExprs.map { ne =>
                classify(inline(stripAlias(ne)), keyClasses, sumE,
                  "sum", decimalSum = false).map(ne -> _)
              }).flatMap(substitute(
                mvDir, None, _, preds, keyClasses, None))
            else
              traverse(aggExprs.map { ne =>
                classifyRollup(inline(stripAlias(ne)), groupEs,
                  keyClasses, sumE, "sum", decimalSum = false)
                  .map(ne -> _)
              }).flatMap(substituteRollup(
                mvDir, None, groupEs, keyClasses, _, preds, "sum",
                None))
          }
        } yield (rewritten, viewRows(mvDir, None))
      }
    }
    rewrites.minByOption(_._2).map(_._1)
  }
}
