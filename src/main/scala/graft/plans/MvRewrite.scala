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
      case agg @ Aggregate(Seq(groupE), aggExprs, child, _) =>
        tryRewrite(agg, Some(groupE), aggExprs, child)
          .orElse(tryRewriteJoin(Some(groupE), aggExprs, child))
          .getOrElse(agg)
      // global aggregate (no GROUP BY): SUM/COUNT over the whole source
      // roll up to SUM(fp)/SUM(n_words) over the whole view
      case agg @ Aggregate(Seq(), aggExprs, child, _) =>
        tryRewrite(agg, None, aggExprs, child)
          .orElse(tryRewriteJoin(None, aggExprs, child))
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
    * sides are then canonically comparable. */
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

  private sealed trait MvCol
  private case object KeyCol extends MvCol
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
  // COUNT(DISTINCT <key>) = the number of view GROUPS (each view row
  // is one distinct key value) — COUNT(*) over view rows
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

  /** Map one aggregate-list expression onto a view column, or refuse.
    * `aggKind` is the view's maintained aggregate: SUM/AVG shapes
    * match only a sum view, MIN/MAX only the matching extremum view;
    * COUNT shapes match every kind (n_words is always the live
    * count). `keyEs` is the view key's EQUIVALENCE CLASS: just the
    * key expression for single-table views; for join views, when the
    * key IS one of the equi-join sides, both sides (they are equal on
    * every joined row, hence on every row the view aggregates). */
  private def classify(e: Expression, keyEs: Seq[Expression],
      sumE: Expression, aggKind: String): Option[MvCol] = e match {
    case ae: AggregateExpression if ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case s: Sum if aggKind == "sum" && !ae.isDistinct &&
            s.child.canonicalized == sumE.canonicalized =>
          Some(SumCol)
        case c: Count if !ae.isDistinct && c.children.length == 1 &&
            c.children.head.foldable && !c.children.head.nullable =>
          Some(CntCol)
        case a: Average if aggKind == "sum" && !ae.isDistinct &&
            a.child.canonicalized == sumE.canonicalized =>
          Some(AvgCol)
        case m: Min if aggKind == "min" && !ae.isDistinct &&
            m.child.canonicalized == sumE.canonicalized &&
            integral(sumE.dataType) =>
          Some(ExtCol)
        case m: Max if aggKind == "max" && !ae.isDistinct &&
            m.child.canonicalized == sumE.canonicalized &&
            integral(sumE.dataType) =>
          Some(ExtCol)
        case c: Count if ae.isDistinct && c.children.length == 1 &&
            keyEs.exists(_.canonicalized ==
              c.children.head.canonicalized) =>
          Some(DistinctKeyCol)
        case _ => None
      }
    case _ if keyEs.exists(_.canonicalized == e.canonicalized) =>
      Some(KeyCol)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate, groupRaw: Option[Expression],
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
    val groupE = groupRaw.map(inline)
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
          src <- props.get("mv.source") if src == srcName
          keyE <- resolveAgainst(props("mv.key"), rel)
          sumE <- resolveAgainst(props("mv.sum"), rel)
          aggKind = props.getOrElse("mv.agg", "sum")
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
          rewritten <- groupE match {
            // exact match: the view's rows ARE the answer — pure
            // projection, no aggregate at all
            case Some(g) if g.dataType == LongType &&
                keyE.canonicalized == g.canonicalized =>
              traverse(aggExprs.map { ne =>
                classify(inline(stripAlias(ne)), Seq(keyE), sumE,
                  aggKind).map(ne -> _)
              }).flatMap(substitute(mvDir, mvPin, _, preds, Seq(keyE)))
            // roll-up: the query groups COARSER than the view (its key
            // is a function of the view's key, incl. the global "no
            // group" case) — re-aggregate the |groups|-row view
            case _ =>
              traverse(aggExprs.map { ne =>
                classifyRollup(inline(stripAlias(ne)), groupE,
                  Seq(keyE), sumE, aggKind).map(ne -> _)
              }).flatMap(substituteRollup(
                mvDir, mvPin, groupE, Seq(keyE), _, preds, aggKind))
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
    * extremum-of-extrema), and any non-aggregate output must BE the
    * (coarse) grouping expression. */
  private def classifyRollup(e: Expression, groupE: Option[Expression],
      keyEs: Seq[Expression], sumE: Expression, aggKind: String)
      : Option[MvCol] = e match {
    case _: AggregateExpression => classify(e, keyEs, sumE, aggKind)
    case _ if groupE.exists(_.canonicalized == e.canonicalized) =>
      Some(KeyCol)
    case _ => None
  }

  private def stripAlias(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case other => other
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None

  /** Pre-optimized scan of the view's three value columns, keyed by
    * name — the building block both substitution shapes share.
    * `pin = Some(m)` reads the MV's OWN snapshot m (the historical
    * substitution); None reads it live. */
  private def viewScan(mvDir: Path, pin: Option[Long])
      : Option[(DataSourceV2ScanRelation, Map[String, Attribute])] = {
    val reader = spark.read.format("graft.sources.GraftDocsSource")
      .option("path", mvDir.toString)
    val mvPlan = pin.fold(reader)(m =>
        reader.option("versionAsOf", m.toString)).load()
      .select("doc_id", "fp", "n_words")
      .queryExecution.optimizedPlan
    val scanRel = mvPlan.collectFirst {
      case s: DataSourceV2ScanRelation => s
    }.getOrElse(return None)
    val byName: Map[String, Attribute] =
      scanRel.output.map(a => a.name -> (a: Attribute)).toMap
    if (!Seq("doc_id", "fp", "n_words").forall(byName.contains)) None
    else Some((scanRel, byName))
  }

  /** The query's residual predicates re-applied over VIEW rows: each
    * predicate must rewrite through [[overKey]] (a deterministic
    * function of the view key alone), which is exactly the soundness
    * condition — a key-only predicate passes or fails each GROUP
    * wholesale, so filtering the \|groups\|-row view selects precisely
    * the groups whose source rows all survived the original WHERE.
    * Any predicate referencing a non-key column refuses (per-row
    * filters change group contents; the corpus plan stands). */
  private def filtered(scanRel: DataSourceV2ScanRelation,
      keyAttr: Attribute, preds: Seq[Expression],
      keyEs: Seq[Expression]): Option[LogicalPlan] =
    if (preds.isEmpty) Some(scanRel)
    else {
      val rewritten = preds.map(p => overKey(p, keyEs, keyAttr))
      if (rewritten.exists(_.isEmpty)) None
      else Some(Filter(rewritten.flatten.reduce(And), scanRel))
    }

  /** Build the replacement: a pre-optimized scan of the view (behind
    * the query's own key-predicate when one was present) plus a
    * projection that re-binds every original output attribute id —
    * consumers above the aggregate never notice the swap. */
  private def substitute(mvDir: Path, pin: Option[Long],
      cols: Seq[(NamedExpression, MvCol)], preds: Seq[Expression],
      keyEs: Seq[Expression]): Option[LogicalPlan] = {
    val (scanRel, byName) = viewScan(mvDir, pin).getOrElse(return None)
    val base = filtered(scanRel, byName("doc_id"), preds, keyEs)
      .getOrElse(return None)
    val projections = cols.map { case (ne, col) =>
      val replacement: Expression = col match {
        case KeyCol => byName("doc_id")
        case SumCol => byName("fp")
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
        // COUNT(DISTINCT key) grouped by key is identically 1
        case DistinctKeyCol => Literal(1L)
      }
      if (replacement.dataType != ne.dataType) return None
      Alias(replacement, ne.name)(exprId = ne.exprId)
    }
    Some(Project(projections, base))
  }

  /** Rewrite `e` as an expression over the view's key column: every
    * maximal subtree canonically equal to the view's key expression
    * becomes `keyAttr`; valid only when NO source attribute survives
    * outside such a subtree (then the query's group is a pure function
    * of the view's group — each query group is a disjoint union of
    * view groups, so SUM re-aggregates and COUNT(*) sums the view's
    * counts). The substitution is only type-preserving when the key
    * expression already IS BIGINT (the view's doc_id type): a narrower
    * key nested inside wider arithmetic (`CAST(int_key * 2 AS STRING)`)
    * would change evaluation semantics even though the final output
    * type check still passes — so a non-BIGINT key refuses here, same
    * gate as the exact-match branch. `keyEs` is the key's equivalence
    * class (see [[classify]]) — any member substitutes. */
  private def overKey(e: Expression, keyEs: Seq[Expression],
      keyAttr: Attribute): Option[Expression] = {
    if (!keyEs.forall(_.dataType == LongType)) return None
    val rewritten = e.transformDown {
      case sub if keyEs.exists(_.canonicalized == sub.canonicalized) =>
        keyAttr
    }
    if (rewritten.deterministic &&
        rewritten.references.forall(_.exprId == keyAttr.exprId))
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
    * SUM is nullable — the coalesce restores the exact type, and its
    * 0 branch is unreachable (a view group exists only with c > 0). */
  private def substituteRollup(mvDir: Path, pin: Option[Long],
      groupE: Option[Expression], keyEs: Seq[Expression],
      cols: Seq[(NamedExpression, MvCol)], preds: Seq[Expression],
      aggKind: String): Option[LogicalPlan] = {
    val (scanRel, byName) = viewScan(mvDir, pin).getOrElse(return None)
    val keyAttr = byName("doc_id")
    val fp = byName("fp"); val nw = byName("n_words")
    val base = filtered(scanRel, keyAttr, preds, keyEs)
      .getOrElse(return None)
    val coarseAlias = groupE match {
      case Some(g) =>
        val coarse = overKey(g, keyEs, keyAttr).getOrElse(return None)
        Some(Alias(coarse, "_mv_rollup_key")())
      case None => None
    }
    val pre = Project(coarseAlias.toSeq ++ Seq(fp, nw), base)
    val ck = coarseAlias.map(_.toAttribute)
    def agg(f: Expression): Expression =
      AggregateExpression(Sum(f), Complete, isDistinct = false)
    val projections = cols.map { case (ne, col) =>
      val replacement: Expression = col match {
        case KeyCol => ck.getOrElse(return None)
        case SumCol => agg(fp)
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
        // COUNT(DISTINCT key) per coarse group = #view rows in it
        case DistinctKeyCol =>
          Coalesce(Seq(
            AggregateExpression(Count(Seq(Literal(1))), Complete,
              isDistinct = false), Literal(0L)))
      }
      if (replacement.dataType != ne.dataType) return None
      Alias(replacement, ne.name)(exprId = ne.exprId)
    }
    Some(Aggregate(ck.toSeq, projections, pre))
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

  /** Re-analyze a persisted f./d.-qualified view expression against
    * the QUERY's own two relations (same attribute ids) — the probe
    * join only scopes name resolution; the emitted expression is over
    * the original scan attributes. */
  private def resolveAgainstJoin(sql: String, factRel: LogicalPlan,
      dimRel: LogicalPlan): Option[Expression] =
    resolveAgainst(sql, Join(SubqueryAlias("f", factRel),
      SubqueryAlias("d", dimRel), Inner, None, JoinHint.NONE))

  /** A join side's join-inferred `IsNotNull(<that side's join key>)`
    * predicates are dropped — semantically implied by the inner join
    * itself (null keys never join), so the view already accounts for
    * them. Everything else is a REAL predicate the caller must prove
    * key-only (the optimizer pushes a dim-key WHERE below the join
    * onto the dim side, and InferFiltersFromConstraints mirrors it
    * onto the fact side through the equi-join — both shapes rewrite
    * over the view key's equivalence class). */
  private def realSidePreds(preds: Seq[Expression], keyE: Expression)
      : Seq[Expression] =
    preds.filterNot {
      case IsNotNull(c) => c.canonicalized == keyE.canonicalized
      case _ => false
    }

  private def tryRewriteJoin(groupRaw: Option[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan)
      : Option[LogicalPlan] = {
    val (join, inline, abovePreds) =
      joinedSource(child).getOrElse(return None)
    val (l, r, cond) = join match {
      case Join(jl, jr, Inner, Some(c), _) => (jl, jr, c)
      case _ => return None
    }
    val lSrc = bareSource(l).getOrElse(return None)
    val rSrc = bareSource(r).getOrElse(return None)
    // LIVE scans only: the historical substitution needs a watermark
    // pair match this path does not maintain per-version
    if (lSrc._4.isDefined || rSrc._4.isDefined) return None
    // same conservative no-predicate gate as the single-table path:
    // pushed pruning state must come WITH its retained predicate
    if (!Seq(lSrc, rSrc).forall(s => s._5.nonEmpty ||
        s._1.scan.asInstanceOf[GraftFilesScan].bareSnapshotPin.isDefined))
      return None
    val groupE = groupRaw.map(inline)
    // candidate join views from BOTH sides' dependent registries
    val candidates = Seq(lSrc._2, rSrc._2).flatMap { dir =>
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
          dimName <- props.get("mv.dim")
          factName <- props.get("mv.source")
          // which query side is the view's fact / dim?
          sides <- Seq(lSrc, rSrc).permutations.collectFirst {
            case Seq(f, d)
                if f._2.getFileName.toString == factName &&
                  d._2.getFileName.toString == dimName => (f, d)
          }
          (factSrc, dimSrc) = sides
          factKeyE <- resolveAgainst(props("mv.factkey"),
            SubqueryAlias("f", factSrc._1))
          dimKeyE <- resolveAgainst(props("mv.dimkey"),
            SubqueryAlias("d", dimSrc._1))
          // the query's join condition must BE the view's equi-join
          // (either orientation)
          _ <- cond match {
            case EqualTo(a, b)
                if (a.canonicalized == factKeyE.canonicalized &&
                    b.canonicalized == dimKeyE.canonicalized) ||
                  (b.canonicalized == factKeyE.canonicalized &&
                    a.canonicalized == dimKeyE.canonicalized) =>
              Some(())
            case _ => None
          }
          // FRESH on both axes: fact ledger == fact current version,
          // dim property watermark == dim current version
          factVersion <- GraftVersions.latest(factSrc._2).map(_.version)
          dimVersion <- GraftVersions.latest(dimSrc._2).map(_.version)
          _ <- GraftVersions.lastTxnEpoch(mvDir, GraftMv.AppId)
            .filter(_ == factVersion)
          _ <- props.get("mv.dim.watermark")
            .filter(_.toLong == dimVersion)
          keyE <- resolveAgainstJoin(props("mv.key"), factSrc._1,
            dimSrc._1)
          sumE <- resolveAgainstJoin(props("mv.sum"), factSrc._1,
            dimSrc._1)
          // the view key's equivalence class: when the key IS one of
          // the equi-join sides, both sides are equal on every joined
          // row — a predicate or grouping over EITHER rewrites over
          // view rows (covers the optimizer pushing a dim-key WHERE
          // to the dim side and mirroring it onto the fact side)
          keyEs = if (keyE.canonicalized == factKeyE.canonicalized ||
              keyE.canonicalized == dimKeyE.canonicalized)
            Seq(factKeyE, dimKeyE) else Seq(keyE)
          preds = abovePreds ++ realSidePreds(factSrc._5, factKeyE) ++
            realSidePreds(dimSrc._5, dimKeyE)
          rewritten <- groupE match {
            case Some(g) if g.dataType == LongType &&
                keyEs.exists(_.canonicalized == g.canonicalized) =>
              traverse(aggExprs.map { ne =>
                classify(inline(stripAlias(ne)), keyEs, sumE, "sum")
                  .map(ne -> _)
              }).flatMap(substitute(mvDir, None, _, preds, keyEs))
            case _ =>
              traverse(aggExprs.map { ne =>
                classifyRollup(inline(stripAlias(ne)), groupE, keyEs,
                  sumE, "sum").map(ne -> _)
              }).flatMap(substituteRollup(
                mvDir, None, groupE, keyEs, _, preds, "sum"))
          }
        } yield (rewritten, viewRows(mvDir, None))
      }
    }
    rewrites.minByOption(_._2).map(_._1)
  }
}
