package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 operators: widening the materialized-view OPTIMIZER
  * family —
  *
  *  - q286 FILTERED MV REWRITE: `SELECT key, SUM(x) FROM t WHERE
  *    <key-predicate> GROUP BY key` — the single most common
  *    production aggregate, and the reference's own shape (the
  *    notebook filters at /root/reference/Assignment-python.py:312
  *    and aggregates the survivors at :314) — answered from the
  *    \|groups\|-row view with the predicate re-applied over view
  *    rows; a key-only predicate admits or rejects each group
  *    WHOLESALE, which is exactly the soundness condition;
  *  - q289 MULTI-VIEW COST CHOICE: when several registered views can
  *    answer one query (a finer view matches everything its own
  *    roll-up matches), the rule picks the one with the fewest live
  *    rows off its manifest counters — the Calcite "cheapest
  *    satisfying view" policy at metadata cost.
  *
  * Scale shape: every rewrite here replaces a corpus scan + shuffle
  * with a \|groups\|-row view read; the filtered form additionally
  * keeps the predicate (a FilterExec over view rows, never a second
  * corpus pass). At 100 TB the win is the full scan that never runs.
  */
object Round17 {
  type Q = (SparkSession, String) => DataFrame

  private def freshCatalog(spark: SparkSession, tag: String)
      : (String, java.nio.file.Path) = {
    val wh = Files.createTempDirectory(s"graft_r17_$tag")
    val cat = tag + "_" +
      wh.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  private def teardown(spark: SparkSession, cat: String,
      wh: java.nio.file.Path): Unit = {
    spark.conf.unset(s"spark.sql.catalog.$cat")
    spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    org.apache.commons.io.FileUtils.deleteDirectory(wh.toFile)
  }

  /** Insert rows [lo, hi) of the generative corpus as ONE ordered file. */
  private def insertRange(spark: SparkSession, cat: String, lo: Int,
      hi: Int): Unit = {
    spark.read.format("graft.sources.GraftDocsSource")
      .option("rows", hi.toString).load()
      .filter(col("doc_id") >= lo)
      .repartition(1).sortWithinPartitions("doc_id")
      .createOrReplaceTempView(s"${cat}_b")
    spark.sql(
      s"""INSERT INTO $cat.t (doc_id, title, fp, n_words)
         |SELECT doc_id, title, fp, n_words FROM ${cat}_b""".stripMargin)
    spark.catalog.dropTempView(s"${cat}_b")
  }

  /** (scans `dir`?, holds a logical Aggregate?) for a frame's
    * optimized plan. */
  private def planFacts(df: DataFrame)
      : (java.nio.file.Path => Boolean, Boolean) = {
    val plan = df.queryExecution.optimizedPlan
    val scans = (dir: java.nio.file.Path) => plan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation
          if s.scan.description.contains(dir.toString) => s
    }.nonEmpty
    val aggregates = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty
    (scans, aggregates)
  }

  private def requireSameResult(a: DataFrame, b: DataFrame, what: String)
      : Unit =
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"mv rewrite changed the $what result")

  // ---------------------------------------------------------------------
  // q286: FILTERED MV rewrite — WHERE over the view key, view-only plan
  // ---------------------------------------------------------------------

  /** Four faces of the filtered rewrite over one view
    * (key `doc_id % 6`, sum `n_words`, auto-maintained across a
    * DELETE):
    *
    *  - EQUALITY at the view grain (`WHERE doc_id % 6 = 2 GROUP BY
    *    doc_id % 6`): exact-match branch — the plan is a Filter +
    *    Project over view rows with NO aggregate at all;
    *  - COARSER predicate, global aggregate (`WHERE (doc_id % 6) % 2
    *    = 0`): roll-up branch — the predicate prunes view rows, one
    *    re-aggregation over the survivors;
    *  - NON-KEY predicate (`WHERE n_words > 20`): refused — a per-row
    *    filter changes group contents, so the corpus plan must stand
    *    (the negative control that guards the unsound direction);
    *  - TOP-K over the rewritten aggregate (`ORDER BY s DESC LIMIT
    *    2`): plans TakeOrderedAndProject over view rows — the
    *    reference's argmax instinct (Assignment-python.py:65) riding
    *    the rewrite for free.
    *
    * Every rewritten shape is require-checked against its rule-off
    * twin IN the query, and the plan facts ride in the hashed row —
    * a rewrite regression breaks a hash, not a trend. */
  val q286MvFilteredRewrite: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q286")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 36)                                 // v1
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'v', 't', 'doc_id % 6', 'n_words', true)")
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (8, 21)")       // v2
      org.apache.spark.sql.GraftBridge.addOptimization(spark,
        graft.plans.MvRewriteRule(spark))
      def eqQ() = spark.sql(
        s"""SELECT doc_id % 6 AS k, SUM(n_words) AS sum_words,
           |  COUNT(*) AS n_docs
           |FROM $cat.t WHERE doc_id % 6 = 2
           |GROUP BY doc_id % 6""".stripMargin)
      def coarseQ() = spark.sql(
        s"""SELECT SUM(n_words) AS c_sum, COUNT(*) AS c_docs
           |FROM $cat.t WHERE (doc_id % 6) % 2 = 0""".stripMargin)
      def nonkeyQ() = spark.sql(
        s"""SELECT doc_id % 6 AS k, COUNT(*) AS n
           |FROM $cat.t WHERE n_words > 20
           |GROUP BY doc_id % 6""".stripMargin)
      def topkQ() = spark.sql(
        s"""SELECT doc_id % 6 AS k, SUM(n_words) AS s
           |FROM $cat.t WHERE doc_id % 6 <> 1
           |GROUP BY doc_id % 6 ORDER BY s DESC, k LIMIT 2""".stripMargin)
      val v = wh.resolve("v"); val t = wh.resolve("t")
      val eq = eqQ()
      val (eqScans, eqAgg) = planFacts(eq)
      val coarse = coarseQ()
      val (cScans, cAgg) = planFacts(coarse)
      val nonkey = nonkeyQ()
      val (nkScans, _) = planFacts(nonkey)
      val topk = topkQ()
      val (tkScans, _) = planFacts(topk)
      val tkTakeOrdered = topk.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => e
      }.nonEmpty
      spark.conf.set("spark.graft.mv.rewrite", "false")
      requireSameResult(eq, eqQ(), "filtered equality")
      requireSameResult(coarse, coarseQ(), "filtered coarse global")
      requireSameResult(topk, topkQ(), "filtered top-k")
      spark.conf.unset("spark.graft.mv.rewrite")
      val c = coarse.head()
      val out = eq
        .withColumn("eq_scans_view", lit(eqScans(v)))
        .withColumn("eq_scans_source", lit(eqScans(t)))
        .withColumn("eq_no_aggregate", lit(!eqAgg))
        .withColumn("coarse_scans_view", lit(cScans(v)))
        .withColumn("coarse_scans_source", lit(cScans(t)))
        .withColumn("coarse_keeps_aggregate", lit(cAgg))
        .withColumn("coarse_sum_words", lit(c.getLong(0)))
        .withColumn("coarse_n_docs", lit(c.getLong(1)))
        .withColumn("nonkey_scans_view", lit(nkScans(v)))
        .withColumn("nonkey_scans_source", lit(nkScans(t)))
        .withColumn("topk_scans_view", lit(tkScans(v)))
        .withColumn("topk_scans_source", lit(tkScans(t)))
        .withColumn("topk_take_ordered", lit(tkTakeOrdered))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q289: multi-view cost choice — cheapest satisfying view wins
  // ---------------------------------------------------------------------

  /** Two views over one source — `vb` at the FINE grain (key
    * `doc_id`, one row per document) registered FIRST, `va` at the
    * COARSE grain (key `doc_id % 6`, ≤6 rows) second — and two
    * queries both views can answer:
    *
    *  - `GROUP BY (doc_id % 6) % 3`: a roll-up of either view; the
    *    rule must pick va (6 manifest rows) over vb (48) even though
    *    vb registered first;
    *  - `GROUP BY doc_id % 6`: va answers EXACTLY (no aggregate at
    *    all), vb only via re-aggregation — cost picks va, so the plan
    *    has no Aggregate.
    *
    * The choice is read off the views' manifest row counters (the
    * same numbers SupportsReportStatistics serves the CBO) — zero
    * data files opened to decide. Plan facts (scans va / not vb /
    * not t) ride in the hashed row; rule-off parity is require-d. */
  val q289MvCostChoice: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q289")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      insertRange(spark, cat, 0, 48)                                 // v1
      // fine view FIRST: naive first-match would pick it
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'vb', 't', 'doc_id', 'n_words', true)")
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'va', 't', 'doc_id % 6', 'n_words', true)")
      org.apache.spark.sql.GraftBridge.addOptimization(spark,
        graft.plans.MvRewriteRule(spark))
      def rollup() = spark.sql(
        s"""SELECT (doc_id % 6) % 3 AS k3, SUM(n_words) AS sum_words,
           |  COUNT(*) AS n_docs
           |FROM $cat.t GROUP BY (doc_id % 6) % 3""".stripMargin)
      def exact() = spark.sql(
        s"""SELECT doc_id % 6 AS k, SUM(n_words) AS sum_words
           |FROM $cat.t GROUP BY doc_id % 6""".stripMargin)
      val va = wh.resolve("va"); val vb = wh.resolve("vb")
      val t = wh.resolve("t")
      val ru = rollup()
      val (ruScans, ruAgg) = planFacts(ru)
      val ex = exact()
      val (exScans, exAgg) = planFacts(ex)
      spark.conf.set("spark.graft.mv.rewrite", "false")
      requireSameResult(ru, rollup(), "cost-chosen roll-up")
      requireSameResult(ex, exact(), "cost-chosen exact")
      spark.conf.unset("spark.graft.mv.rewrite")
      val exSum = ex.agg(sum("sum_words")).head().getLong(0)
      val out = ru.orderBy("k3")
        .withColumn("rollup_scans_va", lit(ruScans(va)))
        .withColumn("rollup_scans_vb", lit(ruScans(vb)))
        .withColumn("rollup_scans_source", lit(ruScans(t)))
        .withColumn("rollup_keeps_aggregate", lit(ruAgg))
        .withColumn("exact_scans_va", lit(exScans(va)))
        .withColumn("exact_scans_vb", lit(exScans(vb)))
        .withColumn("exact_scans_source", lit(exScans(t)))
        .withColumn("exact_no_aggregate", lit(!exAgg))
        .withColumn("exact_total_words", lit(exSum))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  val queries: Map[String, Q] = Map(
    "q286_mv_filtered_rewrite" -> q286MvFilteredRewrite,
    "q289_mv_cost_choice" -> q289MvCostChoice)

  val oracle: Map[String, String] = Map(
    // corpus [0,36) minus deleted {8,21}; n_words(i) = i%91+9 = i+9
    // here. Key class 2 = {2,14,20,26,32} (8 deleted); coarse classes
    // {0,2,4} = 17 docs. All four rewritten shapes plan view-only;
    // the non-key predicate correctly falls back to the source.
    "q286_mv_filtered_rewrite" ->
      """SELECT i % 6 AS k,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS eq_scans_view, FALSE AS eq_scans_source,
        |  TRUE AS eq_no_aggregate,
        |  TRUE AS coarse_scans_view, FALSE AS coarse_scans_source,
        |  TRUE AS coarse_keeps_aggregate,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 36) t(i)
        |    WHERE i NOT IN (8, 21) AND (i % 6) % 2 = 0)
        |    AS coarse_sum_words,
        |  CAST(17 AS BIGINT) AS coarse_n_docs,
        |  FALSE AS nonkey_scans_view, TRUE AS nonkey_scans_source,
        |  TRUE AS topk_scans_view, FALSE AS topk_scans_source,
        |  TRUE AS topk_take_ordered
        |FROM range(0, 36) t(i)
        |WHERE i NOT IN (8, 21) AND i % 6 = 2
        |GROUP BY i % 6""".stripMargin,
    // corpus [0,48): roll-up classes (i%6)%3 over all 48 docs; the
    // cost choice reads va (6 rows), never vb (48) or the source
    "q289_mv_cost_choice" ->
      """SELECT (i % 6) % 3 AS k3,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS rollup_scans_va, FALSE AS rollup_scans_vb,
        |  FALSE AS rollup_scans_source, TRUE AS rollup_keeps_aggregate,
        |  TRUE AS exact_scans_va, FALSE AS exact_scans_vb,
        |  FALSE AS exact_scans_source, TRUE AS exact_no_aggregate,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT)
        |    FROM range(0, 48) t(i)) AS exact_total_words
        |FROM range(0, 48) t(i)
        |GROUP BY (i % 6) % 3 ORDER BY k3""".stripMargin)
}
