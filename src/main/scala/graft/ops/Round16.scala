package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 operators: the self-maintaining-table quartet on the
  * versioned warehouse —
  *
  *  - q265 AUTO-COMPACTION (`compact.threshold`): Delta autoOptimize's
  *    policy face — a data commit that leaves the live snapshot over
  *    its file bound triggers the bin-packing concat as a follow-on
  *    dataChange=false commit, so small appends can never fragment a
  *    table unboundedly;
  *  - q266 COLUMN NDV STATISTICS (`ndv.columns`): per-file distinct
  *    sketches written once, folded through OPTIMIZE, surfaced as DSv2
  *    column statistics — the cost-based optimizer's join/aggregate
  *    cardinality input;
  *  - q267 CDF ACROSS SCHEMA EVOLUTION: a change-feed range that
  *    crosses ADD/RENAME COLUMN commits presents every change row in
  *    the CURRENT schema (honest NULL backfill for pre-ADD rows), and
  *    the evolution commits themselves are no-row metadata events;
  *  - q268 BRANCH MERGE-BACK (`CALL cat.system.merge_branch`): the
  *    diverged case fast_forward rejects, resolved as a metadata
  *    three-way merge with file-granular conflict detection.
  *
  * Capability extension beyond the reference (the notebook at
  * /root/reference/Assignment-python.py has no storage lifecycle at
  * all — its closest instinct is caching the reused frame at
  * Assignment-python.py:61, the same keep-the-hot-path-fast idea these
  * policies automate at table level).
  *
  * Scale shape: every operator here is metadata-cost — the triggers
  * read one manifest (#files), the concat streams bytes without
  * decoding rows, NDV folds are driver-side sketch unions, and the
  * branch merge moves zero data bytes. Nothing in this file scans a
  * table to maintain it.
  */
object Round16 {
  type Q = (SparkSession, String) => DataFrame

  private def freshCatalog(spark: SparkSession, tag: String)
      : (String, java.nio.file.Path) = {
    val wh = Files.createTempDirectory(s"graft_r16_$tag")
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
      .coalesce(1).sortWithinPartitions("doc_id")
      .createOrReplaceTempView(s"${cat}_b")
    spark.sql(
      s"""INSERT INTO $cat.t (doc_id, title, fp, n_words)
         |SELECT doc_id, title, fp, n_words FROM ${cat}_b""".stripMargin)
    spark.catalog.dropTempView(s"${cat}_b")
  }

  // ---------------------------------------------------------------------
  // q265: auto-compaction — compact.threshold keeps file counts bounded
  // ---------------------------------------------------------------------

  /** Six single-file appends against `compact.threshold = 4`: the
    * fifth append leaves 5 live files, so ITS committing writer pays a
    * follow-on bin-packing concat down to threshold/2 = 2 (dataChange
    * = false — rows identical, the change feed skips it), and the
    * sixth append lands on the compacted base. The closed-form
    * lifecycle the audit pins:
    *
    *   v0 enable · v1..v5 append (files 1,2,3,4,5) · v6 compact (2)
    *   · v7 append (3)
    *
    * The audit row carries both faces of the policy's contract — the
    * table stayed BOUNDED (final file count, compact commits from the
    * history face, the max live count any snapshot ever held) and the
    * rows stayed IDENTICAL (count / sums over the final live view, and
    * the row-lineage ids 0..23 surviving the splice: min/max/distinct
    * of `_row_id` — concat splices its members' segments, so ids ride
    * through compaction byte-identically). */
  val q265AutoCompact: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q265")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true', 'row.tracking' = 'true',
           |  'compact.threshold' = '4')""".stripMargin)
      (0 until 6).foreach(b => insertRange(spark, cat, 4 * b, 4 * b + 4))
      val hist = spark.sql(
        s"""SELECT
           |  SUM(CASE WHEN op = 'compact' THEN 1 ELSE 0 END) AS n_compacts,
           |  MAX(n_files) AS max_live_files
           |FROM $cat.t.history""".stripMargin).head()
      val nFiles = spark.sql(
        s"SELECT COUNT(*) AS c FROM $cat.t.files").head().getLong(0)
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows,
           |  SUM(doc_id) AS sum_doc_id,
           |  SUM(CAST(n_words AS BIGINT)) AS sum_words,
           |  MIN(_row_id) AS min_rid, MAX(_row_id) AS max_rid,
           |  COUNT(DISTINCT _row_id) AS n_rids
           |FROM $cat.t""".stripMargin)
        .withColumn("n_files", lit(nFiles))
        .withColumn("n_compacts", lit(hist.getLong(0)))
        .withColumn("max_live_files", lit(hist.getInt(1).toLong))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q266: column NDV statistics — manifest sketches feed the CBO
  // ---------------------------------------------------------------------

  /** `ndv.columns = doc_id,fp,n_words` on a versioned table: each
    * writer task records one distinct sketch per (file, column) beside
    * the min/max stats it already keeps, and the scan folds the live
    * snapshot's sketches into DSv2 `Statistics.columnStats` — the NDV
    * input Spark's cost-based optimizer feeds join reordering and
    * aggregate cardinality estimates from. Below the per-file cap the
    * sketches are the sorted distinct values themselves, so the fold
    * is EXACT and the DuckDB oracle reproduces it with plain
    * COUNT(DISTINCT):
    *
    *   doc_id → 200, fp → 200 (md5 fingerprints), n_words → 91
    *   (i % 91 + 9 over 200 rows wraps the modulus).
    *
    * Two single-file appends prove the cross-file union; the audit
    * reads the estimates off the OPTIMIZED PLAN's attribute statistics
    * (`plan.stats.attributeStats`) — the numbers the planner actually
    * sees, not a side channel. (The HLL degrade past the cap and the
    * build-side flip it buys the CBO are pinned in Round16Spec.) */
  val q266NdvStats: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q266")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'ndv.columns' = 'doc_id,fp,n_words')""".stripMargin)
      insertRange(spark, cat, 0, 100)
      insertRange(spark, cat, 100, 200)
      val rel = spark.read.format("graft.sources.GraftDocsSource")
        .option("path", wh.resolve("t").toString).load()
        .select("doc_id", "fp", "n_words")
      // read the statistics off the SCAN relation leaf — the exact
      // node whose computeStats feeds the planner (the size-only
      // estimation mode above it would drop column stats at a Project)
      val stats = rel.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => s.stats
      }.getOrElse(throw new IllegalStateException(
        "no DSv2 scan relation in the optimized plan"))
      val byName = stats.attributeStats.toSeq.map { case (a, cs) =>
        a.name -> cs.distinctCount.map(_.toLong)
      }.toMap
      import spark.implicits._
      val rows = Seq("doc_id", "fp", "n_words").map { c =>
        (c, byName.getOrElse(c, None).getOrElse(-1L))
      } :+ (("_rows", stats.rowCount.map(_.toLong).getOrElse(-1L)))
      rows.toDF("col_name", "ndv").orderBy("col_name")
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q267: CDF across a schema-evolution boundary
  // ---------------------------------------------------------------------

  /** A change-feed range crossing ADD COLUMN and RENAME COLUMN commits.
    * The lifecycle:
    *
    *   v1 append [0,12) · v2 ADD COLUMN tag BIGINT · v3 append [12,18)
    *   with tags (doc_id*10) · v4 MOR delete {2, 13} · v5 RENAME tag
    *   → label · v6 append [18,21) with labels
    *
    * Reading `table_changes(0, latest)` must present EVERY change row
    * in the CURRENT schema: pre-ADD insert images carry label = NULL
    * (honest backfill — the cell never existed), post-ADD rows carry
    * their written values under the CURRENT name (rename is metadata
    * over a permanent registry slot), the delete images of pre-ADD
    * rows backfill NULL too (they re-read the original short rows),
    * and the two evolution commits appear as NO rows (dataChange=false
    * metadata events — asserted by the absent commit_versions 2 and
    * 5). The audit groups the feed by (commit, change type). */
  val q267CdfEvolution: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q267")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 12)                             // v1
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN tag BIGINT")     // v2
      spark.read.format("graft.sources.GraftDocsSource")
        .option("rows", "18").load().filter(col("doc_id") >= 12)
        .withColumn("tag", col("doc_id") * 10)
        .coalesce(1).sortWithinPartitions("doc_id")
        .createOrReplaceTempView(s"${cat}_b3")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM ${cat}_b3")   // v3
      spark.catalog.dropTempView(s"${cat}_b3")
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (2, 13)")   // v4
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN tag TO label") // v5
      spark.read.format("graft.sources.GraftDocsSource")
        .option("rows", "21").load().filter(col("doc_id") >= 18)
        .withColumn("label", col("doc_id") * 100)
        .coalesce(1).sortWithinPartitions("doc_id")
        .createOrReplaceTempView(s"${cat}_b6")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM ${cat}_b6")   // v6
      spark.catalog.dropTempView(s"${cat}_b6")
      val feed = spark.read.format("graft.sources.GraftDocsSource")
        .option("path", wh.resolve("t").toString)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
      val out = feed.groupBy(
          col("_commit_version").as("commit_version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_doc_id"),
          count(col("label")).as("n_labeled"),
          sum(col("label")).as("sum_label"))
        .orderBy("commit_version", "change_type")
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q268: branch merge-back onto a moved main
  // ---------------------------------------------------------------------

  /** Write-audit-publish when main has MOVED: fork branch `b` at v1,
    * let main append [20,24) (v2), let the branch delete doc_id = 3
    * and append [10,14) in isolation, then
    * `CALL cat.system.merge_branch('t', 'b')` — the diverged case
    * fast_forward rejects by design (q247). The merge diffs both sides
    * against the fork snapshot at FILE granularity: the branch's edits
    * (one grown deletion-vector, one local file) touch no fork file
    * main touched (main only appended), so they compose onto main's
    * current snapshot as ONE merge-branch commit — zero data bytes
    * moved, the branch consumed. (The overlapping-scope rejection and
    * the compacted-main rejection are pinned in Round16Spec.)
    *
    * The audit reads the merged table plus the history face: final
    * rows = [0,10) \ {3} ∪ [10,14) ∪ [20,24), with the merge commit
    * present and labeled. */
  val q268MergeBranch: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q268")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 10)                             // v1
      spark.sql(s"CALL $cat.system.branch('t', 'b', -1)")
      insertRange(spark, cat, 20, 24)                            // v2 (main)
      // branch-side DML in full isolation
      spark.sql(s"DELETE FROM $cat.t.branch_b WHERE doc_id = 3")
      spark.read.format("graft.sources.GraftDocsSource")
        .option("rows", "14").load().filter(col("doc_id") >= 10)
        .coalesce(1).sortWithinPartitions("doc_id")
        .createOrReplaceTempView(s"${cat}_bb")
      spark.sql(
        s"""INSERT INTO $cat.t.branch_b (doc_id, title, fp, n_words)
           |SELECT doc_id, title, fp, n_words FROM ${cat}_bb""".stripMargin)
      spark.catalog.dropTempView(s"${cat}_bb")
      val merged = spark.sql(
        s"CALL $cat.system.merge_branch('t', 'b')").head()
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, SUM(doc_id) AS sum_doc_id,
           |  SUM(CAST(n_words AS BIGINT)) AS sum_words,
           |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
           |FROM $cat.t""".stripMargin)
        .withColumn("merge_version", lit(merged.getLong(1)))
        .withColumn("n_merge_commits", lit(spark.sql(
          s"""SELECT COUNT(*) FROM $cat.t.history
             |WHERE op = 'merge-branch'""".stripMargin)
          .head().getLong(0)))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q269: ANALYZE — statistics backfill for files that predate them
  // ---------------------------------------------------------------------

  /** Statistics adoption on an EXISTING table: two files land before
    * `ndv.columns` exists, the property arrives by ALTER, and
    * `CALL cat.system.analyze('t')` backfills both files' sketches in
    * one distributed pass over exactly the needy files (a static
    * `_file IN (...)` predicate prunes the rest at plan time) + one
    * dataChange=false commit. The audit reads the NDV off the
    * optimizer's own attribute statistics (as q266) and pins the
    * procedure's contract: first call analyzes 2 files, second call is
    * the idempotent no-op (0 files, no commit). */
  val q269Analyze: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q269")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      insertRange(spark, cat, 0, 60)
      insertRange(spark, cat, 60, 120)
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES " +
        "('ndv.columns' = 'doc_id,n_words')")
      val first = spark.sql(s"CALL $cat.system.analyze('t')").head()
      val second = spark.sql(s"CALL $cat.system.analyze('t')").head()
      val rel = spark.read.format("graft.sources.GraftDocsSource")
        .option("path", wh.resolve("t").toString).load()
        .select("doc_id", "n_words")
      val stats = rel.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => s.stats
      }.getOrElse(throw new IllegalStateException(
        "no DSv2 scan relation in the optimized plan"))
      val byName = stats.attributeStats.toSeq.map { case (a, cs) =>
        a.name -> cs.distinctCount.map(_.toLong)
      }.toMap
      import spark.implicits._
      val rows = Seq(
        ("_analyzed", first.getLong(0)),
        ("_analyzed_again", second.getLong(0)),
        ("_rows", stats.rowCount.map(_.toLong).getOrElse(-1L)),
        ("doc_id", byName.getOrElse("doc_id", None).getOrElse(-1L)),
        ("n_words", byName.getOrElse("n_words", None).getOrElse(-1L)))
      rows.toDF("col_name", "ndv").orderBy("col_name")
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q270: retention.versions — self-expiring snapshot history
  // ---------------------------------------------------------------------

  /** The third self-maintenance policy: `retention.versions = 3` makes
    * every data commit that grows the log past 3 retained snapshots
    * vacuum down to the newest 3 — bounded history without a
    * maintenance job, the version-count (clock-free, deterministic)
    * face of Delta's log retention. Six single-file appends leave
    * exactly versions {4, 5, 6} retained; every append's files are
    * still referenced by the surviving snapshots, so the LIVE rows are
    * untouched — which the audit pins alongside the history window. */
  val q270Retention: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q270")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'retention.versions' = '3')""".stripMargin)
      (0 until 6).foreach(b => insertRange(spark, cat, 4 * b, 4 * b + 4))
      val hist = spark.sql(
        s"""SELECT COUNT(*) AS n, MIN(version) AS lo, MAX(version) AS hi
           |FROM $cat.t.history""".stripMargin).head()
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, SUM(doc_id) AS sum_doc_id,
           |  SUM(CAST(n_words AS BIGINT)) AS sum_words
           |FROM $cat.t""".stripMargin)
        .withColumn("n_history", lit(hist.getLong(0)))
        .withColumn("min_version", lit(hist.getLong(1)))
        .withColumn("max_version", lit(hist.getLong(2)))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q271: dynamic partition pruning on the value layout
  // ---------------------------------------------------------------------

  /** DPP against the manifest: the fact table is value-partitioned by
    * a generated column (`wb = n_words % 6`, one file per distinct
    * value per insert task), the dimension is a 2-row driver frame
    * selecting wb ∈ {1, 3} — the scan advertises `wb` as a runtime-
    * filter attribute, Spark's dynamic-partition-pruning rule runs the
    * broadcast dim first and hands the fact scan `wb IN (1, 3)`, and
    * the min=max partition stats drop every other partition's files
    * before a fact byte is read. The classic star-join pruning, at
    * manifest cost with no directory tree. (The file-count proof lives
    * in Round16Spec; this audit pins the joined result.) */
  val q271ValueDpp: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q271")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL,
           |  wb BIGINT GENERATED ALWAYS AS
           |    (CAST(n_words AS BIGINT) % 6))
           |PARTITIONED BY (wb)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      insertRange(spark, cat, 0, 48)
      insertRange(spark, cat, 48, 96)
      // the dim is a FILE-BACKED table (manifest statistics make it
      // the broadcast build side — DPP only reuses a broadcast) with a
      // SURVIVING selective filter (a driver-local frame's filter
      // constant-folds away before the pruning rule runs, and an
      // unfiltered dim is never a pruning candidate)
      spark.sql(
        s"""CREATE TABLE $cat.d (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      spark.read.format("graft.sources.GraftDocsSource")
        .option("rows", "8").load().coalesce(1)
        .createOrReplaceTempView(s"${cat}_dsrc")
      spark.sql(s"INSERT INTO $cat.d SELECT * FROM ${cat}_dsrc")
      spark.catalog.dropTempView(s"${cat}_dsrc")
      val out = spark.sql(
        s"""SELECT d.title AS tag, f.wb, COUNT(*) AS n_rows,
           |  SUM(f.doc_id) AS sum_doc_id
           |FROM $cat.t f JOIN $cat.d d ON f.wb = d.doc_id
           |WHERE d.doc_id IN (1, 3)
           |GROUP BY d.title, f.wb ORDER BY f.wb""".stripMargin)
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q272: streaming sinks under the self-maintenance policies
  // ---------------------------------------------------------------------

  /** Micro-batch sinks are the small-append pattern the maintenance
    * policies exist for: a 6-commit source drains AvailableNow (one
    * commit per epoch) into a sink with `compact.threshold = 3` and
    * `retention.versions = 2` — each epoch commit runs the policies,
    * so files concat down whenever an epoch leaves more than 3 and old
    * snapshots expire as the log grows, while each appId's LATEST txn
    * record is PINNED through vacuum (expiring it would let a
    * checkpoint replay land a micro-batch twice). The audit pins the
    * closed-form outcome: 24 rows exactly once, the epoch-by-epoch
    * file-count trace ending at 3 (1·2·3·4→concat→1·2·3), and a full
    * re-drain from the same checkpoint adding nothing. */
  val q272StreamMaintenance: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q272")
    val cp = Files.createTempDirectory("graft_q272_cp")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.src (doc_id BIGINT, title STRING,
           |  fp BIGINT, n_words INT)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      (0 until 6).foreach { b =>
        spark.read.format("graft.sources.GraftDocsSource")
          .option("rows", (4 * b + 4).toString).load()
          .filter(col("doc_id") >= 4 * b)
          .coalesce(1).sortWithinPartitions("doc_id")
          .createOrReplaceTempView(s"${cat}_b")
        spark.sql(s"INSERT INTO $cat.src SELECT * FROM ${cat}_b")
        spark.catalog.dropTempView(s"${cat}_b")
      }
      spark.sql(
        s"""CREATE TABLE $cat.sink (doc_id BIGINT, title STRING,
           |  fp BIGINT, n_words INT)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'compact.threshold' = '3', 'retention.versions' = '2')"""
          .stripMargin)
      def drain(): Unit = {
        val q = spark.readStream.table(s"$cat.src")
          .writeStream.option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.sink")
        require(q.awaitTermination(120000), "drain did not terminate")
      }
      drain()
      val nFiles = spark.sql(
        s"SELECT COUNT(*) FROM $cat.sink.files").head().getLong(0)
      drain() // checkpoint replay: exactly-once across retention
      val replayFiles = spark.sql(
        s"SELECT COUNT(*) FROM $cat.sink.files").head().getLong(0)
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, SUM(doc_id) AS sum_doc_id,
           |  SUM(CAST(n_words AS BIGINT)) AS sum_words
           |FROM $cat.sink""".stripMargin)
        .withColumn("n_files", lit(nFiles))
        .withColumn("n_files_after_replay", lit(replayFiles))
      OpsUtil.driverLiteral(out)
    } finally {
      teardown(spark, cat, wh)
      org.apache.commons.io.FileUtils.deleteDirectory(cp.toFile)
    }
  }

  // ---------------------------------------------------------------------
  // q273: incrementally-maintained materialized view (CDF-fed)
  // ---------------------------------------------------------------------

  /** MATERIALIZED VIEW lifecycle: `create_mv` seeds
    * `SELECT doc_id % 5, SUM(n_words), COUNT(*) GROUP BY 1` at source
    * v2 and ledgers the watermark as a txn record (atomic with the
    * seed data); the source then takes a MOR DELETE, a MOR UPDATE and
    * an append; `refresh_mv` folds exactly those 16 change images
    * (2 delete + 4 pre + 4 post + 6 insert) into the view through the
    * change feed — no source scan — and a second refresh is the
    * watermark no-op. At 100 TB the refresh reads only the commits
    * since the watermark: cost tracks what CHANGED, not what exists;
    * exactly-once falls out of the streaming sink's txn-record
    * idempotence (a replayed refresh finds its epoch ledgered and
    * lands nothing). The audit pins the final view rows AND the
    * lifecycle numbers (seed watermark/groups, refreshed-to version,
    * applied image count, the no-op's zero). */
  val q273MaterializedView: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q273")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read',
           |  'update.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 12)                                // v1
      insertRange(spark, cat, 12, 24)                               // v2
      val created = spark.sql(s"CALL $cat.system.create_mv(" +
        "'t_by_k', 't', 'doc_id % 5', 'n_words', false)").head()
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (5, 17)")      // v3
      spark.sql(
        s"UPDATE $cat.t SET n_words = n_words + 100 WHERE doc_id < 4") // v4
      insertRange(spark, cat, 24, 30)                               // v5
      val r1 = spark.sql(s"CALL $cat.system.refresh_mv('t_by_k')").head()
      val r2 = spark.sql(s"CALL $cat.system.refresh_mv('t_by_k')").head()
      val out = spark.sql(
        s"""SELECT doc_id AS k, title AS mv, fp AS sum_words,
           |  CAST(n_words AS BIGINT) AS n_docs
           |FROM $cat.t_by_k ORDER BY k""".stripMargin)
        .withColumn("created_at", lit(created.getLong(0)))
        .withColumn("seed_groups", lit(created.getLong(1)))
        .withColumn("refreshed_to", lit(r1.getLong(0)))
        .withColumn("applied", lit(r1.getLong(1)))
        .withColumn("noop_applied", lit(r2.getLong(1)))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q274: auto-maintained materialized view (refresh on source commit)
  // ---------------------------------------------------------------------

  /** The self-maintenance face of q273: `create_mv(..., auto => true)`
    * registers the view on the source's `mv.dependents` list, and from
    * then on EVERY source data commit — the append at v2 and the MOR
    * DELETE at v3 alike — pays an inline CDF-fed refresh before it
    * returns (Delta autoOptimize semantics applied to view
    * maintenance: the committing writer pays, readers always see a
    * fresh view). No refresh is ever called by hand here; the audit
    * reads the view cold and pins exactly two `mv-refresh` commits on
    * its history face — one per source data commit, each folding only
    * that commit's change slice. */
  val q274MvAuto: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q274")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 12)                                 // v1
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'v', 't', 'doc_id % 4', 'n_words', true)")
      insertRange(spark, cat, 12, 20)                                // v2
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (3, 13)")       // v3
      val refreshes = spark.sql(
        s"SELECT COUNT(*) FROM $cat.v.history WHERE op = 'mv-refresh'")
        .head().getLong(0)
      val out = spark.sql(
        s"""SELECT doc_id AS k, fp AS sum_words,
           |  CAST(n_words AS BIGINT) AS n_docs
           |FROM $cat.v ORDER BY k""".stripMargin)
        .withColumn("n_auto_refreshes", lit(refreshes))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q275: column MIN/MAX statistics — filter estimation for the CBO
  // ---------------------------------------------------------------------

  /** The third face of the manifest-statistics story (q266 NDV for
    * join/aggregate cardinality, q269 backfill, now RANGE bounds for
    * filter selectivity): the per-file min/max envelopes that already
    * drive data skipping fold into table-level column bounds and ride
    * DSv2 `ColumnStatistics.min/max` into Catalyst's `attributeStats`
    * — FilterEstimation then shrinks a range predicate's row estimate
    * by linear interpolation over [min, max], which is what lets a
    * filtered build side prove itself broadcast-small BEFORE the join
    * strategy is chosen (the plan-flip proof lives in Round16Spec).
    * All-or-nothing per column: one pre-stats live file withholds the
    * bound rather than narrowing it wrongly; masked files only widen —
    * the safe direction. The audit reads the bounds off the
    * optimizer's own statistics, never the manifest, so it pins the
    * whole pipeline: writer envelope → manifest token → DSv2 fold →
    * Catalyst ColumnStat. */
  val q275MinMaxStats: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q275")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      insertRange(spark, cat, 0, 80)
      insertRange(spark, cat, 80, 160)
      val rel = spark.read.format("graft.sources.GraftDocsSource")
        .option("path", wh.resolve("t").toString).load()
        .select("doc_id", "fp", "n_words")
      val stats = rel.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => s.stats
      }.getOrElse(throw new IllegalStateException(
        "no DSv2 scan relation in the optimized plan"))
      val byName = stats.attributeStats.toSeq.map { case (a, cs) =>
        a.name -> (cs.min.map(_.toString.toLong),
          cs.max.map(_.toString.toLong))
      }.toMap
      import spark.implicits._
      Seq("doc_id", "fp", "n_words").map { c =>
        val (lo, hi) = byName.getOrElse(c, (None, None))
        (c, lo.getOrElse(-1L), hi.getOrElse(-1L))
      }.toDF("col_name", "lo", "hi").orderBy("col_name")
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q276: streaming ingest with an always-fresh materialized view
  // ---------------------------------------------------------------------

  /** The streaming composition of the MV story: a 6-commit source
    * drains AvailableNow into a versioned sink that carries an
    * auto-registered MV — every micro-batch epoch commit runs the
    * refresh hook before it returns, so the aggregate view is fresh
    * after EVERY epoch without any scheduler (the pattern a 100 TB
    * ingest pipeline wants: the landing stream maintains its own
    * serving aggregate, refresh cost per epoch = that epoch's rows).
    * A full re-drain from the same checkpoint replays nothing (epoch
    * idempotence), so the view takes no extra refresh either. The
    * audit reads the view cold and pins the refresh count off the
    * view's history face: one `mv-refresh` per sink data epoch. */
  val q276StreamMv: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q276")
    val cp = Files.createTempDirectory("graft_q276_cp")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.src (doc_id BIGINT, title STRING,
           |  fp BIGINT, n_words INT)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      (0 until 6).foreach { b =>
        spark.read.format("graft.sources.GraftDocsSource")
          .option("rows", (4 * b + 4).toString).load()
          .filter(col("doc_id") >= 4 * b)
          .coalesce(1).sortWithinPartitions("doc_id")
          .createOrReplaceTempView(s"${cat}_b")
        spark.sql(s"INSERT INTO $cat.src SELECT * FROM ${cat}_b")
        spark.catalog.dropTempView(s"${cat}_b")
      }
      spark.sql(
        s"""CREATE TABLE $cat.sink (doc_id BIGINT, title STRING,
           |  fp BIGINT, n_words INT)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'v', 'sink', 'doc_id % 3', 'n_words', true)")
      def drain(): Unit = {
        val q = spark.readStream.table(s"$cat.src")
          .writeStream.option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.sink")
        require(q.awaitTermination(120000), "drain did not terminate")
      }
      drain()
      val refreshes = spark.sql(
        s"SELECT COUNT(*) FROM $cat.v.history WHERE op = 'mv-refresh'")
        .head().getLong(0)
      drain() // checkpoint replay: no new epochs, no extra refresh
      val refreshesAfterReplay = spark.sql(
        s"SELECT COUNT(*) FROM $cat.v.history WHERE op = 'mv-refresh'")
        .head().getLong(0)
      val out = spark.sql(
        s"""SELECT doc_id AS k, fp AS sum_words,
           |  CAST(n_words AS BIGINT) AS n_docs
           |FROM $cat.v ORDER BY k""".stripMargin)
        .withColumn("n_refreshes", lit(refreshes))
        .withColumn("n_refreshes_after_replay", lit(refreshesAfterReplay))
      OpsUtil.driverLiteral(out)
    } finally {
      teardown(spark, cat, wh)
      org.apache.commons.io.FileUtils.deleteDirectory(cp.toFile)
    }
  }

  // ---------------------------------------------------------------------
  // q277: materialized-view query rewrite — answer from the view
  // ---------------------------------------------------------------------

  /** The optimizer face of the MV story ([[graft.plans.MvRewriteRule]]):
    * the EXACT aggregate a fresh auto-registered view maintains,
    * written against the SOURCE table, plans as a projection over the
    * \|groups\|-row view — no corpus scan, no shuffle, no Aggregate
    * node at all. At 100 TB this is the rewrite that turns a reporting
    * query from a cluster job into a metadata read. The audit runs the
    * same SQL twice — rule on and rule off (`spark.graft.mv.rewrite`)
    * — verifies INSIDE the query that both plans return identical rows
    * (the rewrite's soundness contract), and pins the plan facts: the
    * enabled run scans the view and carries no aggregate, the disabled
    * run aggregates the source. */
  val q277MvRewrite: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q277")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 30)                                 // v1
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'v', 't', 'doc_id % 5', 'n_words', true)")
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (4, 11)")       // v2
      org.apache.spark.sql.GraftBridge.addOptimization(spark,
        graft.plans.MvRewriteRule(spark))
      def run() = spark.sql(
        s"""SELECT doc_id % 5 AS k, SUM(n_words) AS sum_words,
           |  COUNT(*) AS n_docs
           |FROM $cat.t GROUP BY doc_id % 5""".stripMargin)
      def facts(df: DataFrame): (Boolean, Boolean) = {
        val plan = df.queryExecution.optimizedPlan
        val scansMv = plan.collect {
          case s: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation
              if s.scan.description.contains(wh.resolve("v").toString) => s
        }.nonEmpty
        val aggregates = plan.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty
        (scansMv, aggregates)
      }
      val viaMv = run()
      val (mvScanned, mvAggregated) = facts(viaMv)
      spark.conf.set("spark.graft.mv.rewrite", "false")
      val viaSource = run()
      val (offScanned, offAggregated) = facts(viaSource)
      spark.conf.unset("spark.graft.mv.rewrite")
      // soundness: the rewrite must be invisible in the RESULT
      require(OpsUtil.sameRowsLocal(viaMv, viaSource),
        "mv rewrite changed the query result")
      val out = viaMv.orderBy("k")
        .withColumn("rewrite_scans_view", lit(mvScanned))
        .withColumn("rewrite_keeps_aggregate", lit(mvAggregated))
        .withColumn("fallback_scans_view", lit(offScanned))
        .withColumn("fallback_keeps_aggregate", lit(offAggregated))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q278: write distribution — the table demands clustered input
  // ---------------------------------------------------------------------

  /** Iceberg's `write.distribution-mode = hash` via DSv2
    * `RequiresDistributionAndOrdering`: a bucketed table with
    * `write.distribution = 'hash'` DEMANDS that the engine cluster
    * incoming rows by the declared bucket function (the same V2
    * `bucket` UDF the scan's KeyGroupedPartitioning reports) and sort
    * them by doc_id, BEFORE any writer task runs. Each bucket's rows
    * then arrive in exactly one task, so an 8-partition unsorted
    * INSERT lands exactly ONE file per bucket instead of up to
    * 8×buckets fragments — at 1000 executors this is the difference
    * between `buckets` files per write and a small-file explosion the
    * compactor must clean up after every job. Two inserts → exactly
    * 2×buckets files, rows intact, and the audit pins both faces. */
  val q278WriteDistribution: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q278")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |PARTITIONED BY (bucket(4, doc_id))
           |TBLPROPERTIES ('versioned' = 'true',
           |  'write.distribution' = 'hash')""".stripMargin)
      // deliberately UNSORTED, 8-partition input — the table's demand,
      // not the writer, produces the layout
      def insert(lo: Int, hi: Int): Unit = {
        spark.read.format("graft.sources.GraftDocsSource")
          .option("rows", hi.toString).option("partitions", "8").load()
          .filter(col("doc_id") >= lo)
          .createOrReplaceTempView(s"${cat}_b")
        spark.sql(s"INSERT INTO $cat.t SELECT * FROM ${cat}_b")
        spark.catalog.dropTempView(s"${cat}_b")
      }
      insert(0, 64)
      val filesFirst = spark.sql(
        s"SELECT COUNT(*) FROM $cat.t.files").head().getLong(0)
      insert(64, 96)
      val filesTotal = spark.sql(
        s"SELECT COUNT(*) FROM $cat.t.files").head().getLong(0)
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, SUM(doc_id) AS sum_doc_id,
           |  SUM(CAST(n_words AS BIGINT)) AS sum_words
           |FROM $cat.t""".stripMargin)
        .withColumn("files_after_first", lit(filesFirst))
        .withColumn("files_total", lit(filesTotal))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q279: sorted scans — exchange-free AND sort-free merge joins
  // ---------------------------------------------------------------------

  /** The read-side payoff of q278: the writer OBSERVES per-file doc_id
    * monotonicity and records `sorted=` in the manifest; a scan whose
    * every planned partition is one sorted file reports that order
    * (`SupportsReportOrdering`), so a sort-merge join between two such
    * tables plans with NO exchange (storage-partitioned on the shared
    * bucket layout) and NO sort — Hive's sorted-bucket-merge join,
    * derived entirely from manifest facts. At 100 TB the join becomes
    * a streaming zipper over pre-sorted bucket files: zero shuffle
    * bytes, zero sort memory, spill-proof by construction. The audit
    * runs the join with broadcast disabled and pins the three plan
    * facts alongside the joined aggregate. */
  val q279SortedScan: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q279")
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Seq(("a", 48), ("b", 32)).foreach { case (t, n) =>
        spark.sql(
          s"""CREATE TABLE $cat.$t (
             |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
             |  fp BIGINT NOT NULL, n_words INT NOT NULL)
             |PARTITIONED BY (bucket(4, doc_id))
             |TBLPROPERTIES ('versioned' = 'true',
             |  'write.distribution' = 'hash')""".stripMargin)
        spark.read.format("graft.sources.GraftDocsSource")
          .option("rows", n.toString).option("partitions", "8").load()
          .createOrReplaceTempView(s"${cat}_src")
        spark.sql(s"INSERT INTO $cat.$t SELECT * FROM ${cat}_src")
        spark.catalog.dropTempView(s"${cat}_src")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.sql(
        s"""SELECT a.doc_id,
           |  CAST(a.n_words AS BIGINT) + b.n_words AS words2
           |FROM $cat.a a JOIN $cat.b b ON a.doc_id = b.doc_id""".stripMargin)
      // sweep THROUGH the AQE wrapper — its subtree hides from a plain
      // collect until unwrapped
      def sweep[A](p: org.apache.spark.sql.execution.SparkPlan)(
          f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, A])
          : Seq[A] = {
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        p.collect {
          case a: AdaptiveSparkPlanExec => sweep(a.executedPlan)(f)
          case q: QueryStageExec => sweep(q.plan)(f)
          case n if f.isDefinedAt(n) => Seq(f(n))
        }.flatten
      }
      val plan = joined.queryExecution.executedPlan
      val smj = sweep(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.nonEmpty
      val exchanges = sweep(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e
      }.nonEmpty
      val sorts = sweep(plan) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.nonEmpty
      val out = joined
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(col("words2")).as("sum_words2"))
        .withColumn("merge_join", lit(smj))
        .withColumn("shuffles", lit(exchanges))
        .withColumn("sorts", lit(sorts))
      OpsUtil.driverLiteral(out)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      teardown(spark, cat, wh)
    }
  }

  // ---------------------------------------------------------------------
  // q280: vacuum dry run — preflight the destructive command
  // ---------------------------------------------------------------------

  /** `CALL cat.system.vacuum_dry_run(t, keep_last)` — Delta's VACUUM
    * DRY RUN: the exact expire/delete sets the real vacuum would act
    * on (same retention math, same tag/txn/branch pins), computed and
    * reported with NOTHING touched. The operational contract a 100 TB
    * table needs before any destructive maintenance: the numbers the
    * preflight reports are the numbers the real run then produces.
    * Lifecycle here: 6 single-file appends, v3 tag-pinned, OPTIMIZE
    * to one file (v7) — a keep-1 vacuum must expire the 6 unpinned
    * old snapshots and delete exactly the 3 files only they reference
    * (f4,f5,f6: the tag retains f1-f3, the live concat retains its own
    * file). The audit pins the dry run's numbers, that it changed
    * nothing (history length, files on disk), the real run's EQUALITY
    * with the preflight, and the live rows surviving untouched. */
  val q280VacuumDryRun: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q280")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      (0 until 6).foreach(b => insertRange(spark, cat, 4 * b, 4 * b + 4))
      spark.sql(s"CALL $cat.system.tag('t', 'pin', 3)")
      spark.sql(s"CALL $cat.system.optimize('t', 1, '')")       // v7
      def diskParts: Long = {
        val s = java.nio.file.Files.list(wh.resolve("t"))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.count(p =>
            p.getFileName.toString.endsWith(".tsv")).toLong
        } finally s.close()
      }
      val dry = spark.sql(
        s"CALL $cat.system.vacuum_dry_run('t', 1)").head()
      val historyAfterDry = spark.sql(
        s"SELECT COUNT(*) FROM $cat.t.history").head().getLong(0)
      val diskAfterDry = diskParts
      val real = spark.sql(s"CALL $cat.system.vacuum('t', 1)").head()
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, SUM(doc_id) AS sum_doc_id
           |FROM $cat.t""".stripMargin)
        .withColumn("would_expire", lit(dry.getLong(0)))
        .withColumn("would_delete", lit(dry.getLong(1)))
        .withColumn("reclaims_bytes", lit(dry.getLong(2) > 0L))
        .withColumn("history_after_dry", lit(historyAfterDry))
        .withColumn("disk_files_after_dry", lit(diskAfterDry))
        .withColumn("real_expired", lit(real.getLong(0)))
        .withColumn("real_deleted", lit(real.getLong(1)))
        .withColumn("disk_files_after_real", lit(diskParts))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q281: scoped OPTIMIZE — partition-granular compaction
  // ---------------------------------------------------------------------

  /** `CALL cat.system.optimize_where(t, col, value, n)` — Iceberg's
    * `rewrite_data_files(filter)`: compact ONLY the files provably
    * single-valued at `col = value` (manifest min == max == value, the
    * shape every value-partitioned write produces). At 100 TB this is
    * how maintenance actually runs — per partition, on the partitions
    * that fragmented, never a whole-table pass; the scoped scan reads
    * exactly those files (static `_file IN` whitelist at plan time)
    * and the commit swaps them alone. Two inserts leave 2 files per
    * value; scoping value 3 to one file compacts exactly those 2 and
    * provably touches none of the other 10. The audit pins the scoped
    * counts, the untouched count, and the rows surviving bit-intact. */
  val q281OptimizeWhere: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q281")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL,
           |  wb BIGINT GENERATED ALWAYS AS
           |    (CAST(n_words AS BIGINT) % 6))
           |PARTITIONED BY (wb)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      insertRange(spark, cat, 0, 48)
      insertRange(spark, cat, 48, 96)
      val r = spark.sql(
        s"CALL $cat.system.optimize_where('t', 'wb', 3, 1)").head()
      val entries = graft.sources.GraftVersions
        .latest(wh.resolve("t")).get.entries
      val out = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, SUM(doc_id) AS sum_doc_id,
           |  SUM(CAST(n_words AS BIGINT)) AS sum_words
           |FROM $cat.t""".stripMargin)
        .withColumn("scoped_before", lit(r.getLong(0)))
        .withColumn("scoped_after", lit(r.getLong(1)))
        .withColumn("untouched", lit(r.getLong(2)))
        .withColumn("files_total_after", lit(entries.length.toLong))
        .withColumn("value3_files", lit(entries.count(
          _.stats.get("wb").contains((3L, 3L))).toLong))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q282: materialized-view ROLL-UP rewrite — coarser grain, view-only
  // ---------------------------------------------------------------------

  /** The production face of the MV rewrite ([[graft.plans
    * .MvRewriteRule]], roll-up form): a query that aggregates at a
    * COARSER grain than the view — its group key a function of the
    * view's key, here `(doc_id % 6) % 2`, plus the global no-GROUP-BY
    * case — is answered by RE-AGGREGATING the \|groups\|-row view
    * (sum-of-sums, sum-of-counts) instead of scanning the corpus.
    * This mirrors the reference's re-aggregation instinct (the
    * notebook re-groups an already-grouped frame at
    * /root/reference/Assignment-python.py:425-434) and is the classic
    * Calcite roll-up match. The audit runs each query rule-on and
    * rule-off, verifies identical rows, and pins the plan facts: the
    * rewritten plans scan the VIEW and never the source, and — unlike
    * q277's exact match, which drops the Aggregate entirely — the
    * roll-up KEEPS one (re-aggregation over view rows is the point). */
  val q282MvRollup: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q282")
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
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (7, 22)")       // v2
      org.apache.spark.sql.GraftBridge.addOptimization(spark,
        graft.plans.MvRewriteRule(spark))
      def rollup() = spark.sql(
        s"""SELECT (doc_id % 6) % 2 AS k2, SUM(n_words) AS sum_words,
           |  COUNT(*) AS n_docs
           |FROM $cat.t GROUP BY (doc_id % 6) % 2""".stripMargin)
      def global() = spark.sql(
        s"SELECT SUM(n_words) AS sum_words, COUNT(*) AS n_docs " +
          s"FROM $cat.t")
      def facts(df: DataFrame): (Boolean, Boolean, Boolean) = {
        val plan = df.queryExecution.optimizedPlan
        def scans(dir: java.nio.file.Path) = plan.collect {
          case s: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation
              if s.scan.description.contains(dir.toString) => s
        }.nonEmpty
        val aggregates = plan.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty
        (scans(wh.resolve("v")), scans(wh.resolve("t")), aggregates)
      }
      val viaMv = rollup()
      val (mvScansView, mvScansSrc, mvAggregated) = facts(viaMv)
      val globalViaMv = global()
      val (gScansView, gScansSrc, _) = facts(globalViaMv)
      spark.conf.set("spark.graft.mv.rewrite", "false")
      val viaSource = rollup()
      val (offScansView, offScansSrc, _) = facts(viaSource)
      val globalViaSource = global()
      spark.conf.unset("spark.graft.mv.rewrite")
      // soundness: the roll-up must be invisible in the RESULT
      require(OpsUtil.sameRowsLocal(viaMv, viaSource),
        "mv roll-up rewrite changed the grouped query result")
      require(OpsUtil.sameRowsLocal(globalViaMv, globalViaSource),
        "mv roll-up rewrite changed the global aggregate result")
      val g = globalViaMv.head()
      val out = viaMv.orderBy("k2")
        .withColumn("rollup_scans_view", lit(mvScansView))
        .withColumn("rollup_scans_source", lit(mvScansSrc))
        .withColumn("rollup_keeps_aggregate", lit(mvAggregated))
        .withColumn("global_scans_view", lit(gScansView))
        .withColumn("global_scans_source", lit(gScansSrc))
        .withColumn("fallback_scans_view", lit(offScansView))
        .withColumn("fallback_scans_source", lit(offScansSrc))
        .withColumn("global_sum_words", lit(g.getLong(0)))
        .withColumn("global_n_docs", lit(g.getLong(1)))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q283: DPP × partition-spec evolution — mixed-generation pruning
  // ---------------------------------------------------------------------

  /** The composition q271 (value DPP) and q253 (spec evolution) left
    * untested: dynamic partition pruning over a snapshot whose files
    * span TWO layout generations. The table starts UNPARTITIONED (its
    * first insert lands one file whose generated `wb` column spans all
    * six values), then `ALTER TABLE ... SET TBLPROPERTIES
    * ('layout.values' = 'wb')` evolves the value layout as a
    * metadata-only commit, and the second insert fans six min=max
    * files. The DPP join then proves the per-FILE pruning contract:
    * the runtime `wb IN (1, 3)` whitelist prunes post-evolution files
    * exactly (2 of 6 read) while the pre-evolution file degrades to a
    * scan (read in full — never wrong, just unpruned), so the fact
    * scan emits exactly oldgen-rows + matching-newgen-rows. At 100 TB
    * this is how layout changes actually roll out: declare the new
    * spec instantly, let DPP benefits arrive write-by-write, migrate
    * stragglers with OPTIMIZE later. */
  val q283MixedSpecDpp: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q283")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL,
           |  wb BIGINT GENERATED ALWAYS AS
           |    (CAST(n_words AS BIGINT) % 6))
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      insertRange(spark, cat, 0, 48)                          // v1: 1 file
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
        "'layout.values'='wb')")                              // v2: DDL
      insertRange(spark, cat, 48, 96)                         // v3: 6 files
      val t = wh.resolve("t")
      val ops = graft.sources.GraftVersions.listVersions(t).map(_.op)
      require(ops == Seq("enable", "append", "set-layout", "append"),
        s"unexpected version log: $ops")
      val entries = graft.sources.GraftVersions.latest(t).get.entries
      val (newGen, oldGen) = entries.partition(
        _.stats.get("wb").exists { case (lo, hi) => lo == hi })
      val matchingNewGen = newGen.count(
        _.stats.get("wb").exists { case (lo, _) => lo == 1L || lo == 3L })
      spark.sql(
        s"""CREATE TABLE $cat.d (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true')""".stripMargin)
      spark.read.format("graft.sources.GraftDocsSource")
        .option("rows", "8").load().coalesce(1)
        .createOrReplaceTempView(s"${cat}_dsrc")
      spark.sql(s"INSERT INTO $cat.d SELECT * FROM ${cat}_dsrc")
      spark.catalog.dropTempView(s"${cat}_dsrc")
      val joined = spark.sql(
        s"""SELECT f.wb, COUNT(*) AS n_rows, SUM(f.doc_id) AS sum_doc_id
           |FROM $cat.t f JOIN $cat.d d ON f.wb = d.doc_id
           |WHERE d.doc_id IN (1, 3)
           |GROUP BY f.wb""".stripMargin)
      joined.collect() // force execution so the runtime filter fires
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[BatchScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
        case q: QueryStageExec => scansOf(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scansOf(r.child)
        case b: BatchScanExec => Seq(b)
        case other => other.children.flatMap(scansOf)
      }
      val fact = scansOf(joined.queryExecution.executedPlan)
        .find(_.scan.description().contains(s"path=$t "))
        .getOrElse(throw new IllegalStateException("no fact scan"))
      require(fact.runtimeFilters.nonEmpty,
        "DPP must attach a runtime filter to the mixed-spec fact scan")
      val emitted = fact.metrics("numOutputRows").value
      val out = joined
        .withColumn("runtime_filtered", lit(true))
        .withColumn("files_oldgen", lit(oldGen.size.toLong))
        .withColumn("files_newgen", lit(newGen.size.toLong))
        .withColumn("newgen_files_matching", lit(matchingNewGen.toLong))
        .withColumn("scan_emitted_rows", lit(emitted))
        .orderBy("wb")
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q284: MV rewrite of AVG and COUNT(DISTINCT key) — derived aggregates
  // ---------------------------------------------------------------------

  /** Two aggregate shapes the view does not store but fully DETERMINES
    * ([[graft.plans.MvRewriteRule]]): AVG(<sum>) = SUM(fp) /
    * SUM(n_words) (one IEEE division of two exact integer sums —
    * bit-identical to Average's own sum/count), and COUNT(DISTINCT
    * <key>) = the number of view rows (each row is one distinct key),
    * per coarse group and globally. The NDV case is the one a corpus
    * dashboard actually runs ("how many distinct buckets per shard?")
    * — answered at \|groups\| cost instead of a corpus-wide
    * distinct-shuffle, the most expensive aggregate Spark plans. The
    * audit pins plan facts (view-only scan both grains) and rule-off
    * row equality inside the query, then hash-checks the values. */
  val q284MvDerivedAggs: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q284")
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
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (9, 28)")       // v2
      org.apache.spark.sql.GraftBridge.addOptimization(spark,
        graft.plans.MvRewriteRule(spark))
      def grouped() = spark.sql(
        s"""SELECT (doc_id % 6) % 3 AS k3,
           |  AVG(n_words) AS avg_words,
           |  COUNT(DISTINCT doc_id % 6) AS n_keys,
           |  SUM(n_words) AS sum_words, COUNT(*) AS n_docs
           |FROM $cat.t GROUP BY (doc_id % 6) % 3""".stripMargin)
      def global() = spark.sql(
        s"SELECT AVG(n_words) AS avg_words, " +
          s"COUNT(DISTINCT doc_id % 6) AS n_keys FROM $cat.t")
      def facts(df: DataFrame): (Boolean, Boolean) = {
        val plan = df.queryExecution.optimizedPlan
        def scans(p: java.nio.file.Path) = plan.collect {
          case s: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation
              if s.scan.description.contains(p.toString) => s
        }.nonEmpty
        (scans(wh.resolve("v")), scans(wh.resolve("t")))
      }
      val viaMv = grouped()
      val (gScansView, gScansSrc) = facts(viaMv)
      val globalViaMv = global()
      val (ggScansView, ggScansSrc) = facts(globalViaMv)
      spark.conf.set("spark.graft.mv.rewrite", "false")
      val viaSource = grouped()
      val globalViaSource = global()
      spark.conf.unset("spark.graft.mv.rewrite")
      require(OpsUtil.sameRowsLocal(viaMv, viaSource),
        "derived-aggregate rewrite changed the grouped result")
      require(OpsUtil.sameRowsLocal(globalViaMv, globalViaSource),
        "derived-aggregate rewrite changed the global result")
      val g = globalViaMv.head()
      val out = viaMv.orderBy("k3")
        .withColumn("grouped_scans_view", lit(gScansView))
        .withColumn("grouped_scans_source", lit(gScansSrc))
        .withColumn("global_scans_view", lit(ggScansView))
        .withColumn("global_scans_source", lit(ggScansSrc))
        .withColumn("global_avg_words", lit(g.getDouble(0)))
        .withColumn("global_n_keys", lit(g.getLong(1)))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  // ---------------------------------------------------------------------
  // q285: historical MV rewrite — time travel answered from view history
  // ---------------------------------------------------------------------

  /** Time travel composed with the MV rewrite: `... FROM t VERSION AS
    * OF v GROUP BY <key>` is answered from the MV's OWN history — the
    * refresh commit whose ledgered watermark is exactly v folded
    * precisely the source state at v (replace-all refresh semantics),
    * so the view's snapshot at that commit IS the historical
    * aggregate. Auto-refresh guarantees one such commit per source
    * data version. At 100 TB this turns "how did the corpus look last
    * Tuesday, by shard" from a historical corpus scan into a
    * \|groups\|-row read — the reporting query a versioned warehouse
    * exists for. Pinned at v2 (post-delete) at the view's grain and
    * at v1 (pre-delete) as a global roll-up; both plans are asserted
    * view-only, and both match the rule-off time-travel scan. */
  val q285MvTimeTravel: Q = (spark, dir) => {
    val (cat, wh) = freshCatalog(spark, "q285")
    try {
      spark.sql(
        s"""CREATE TABLE $cat.t (
           |  doc_id BIGINT NOT NULL, title STRING NOT NULL,
           |  fp BIGINT NOT NULL, n_words INT NOT NULL)
           |TBLPROPERTIES ('versioned' = 'true',
           |  'delete.mode' = 'merge-on-read')""".stripMargin)
      insertRange(spark, cat, 0, 30)                                 // v1
      spark.sql(s"CALL $cat.system.create_mv(" +
        "'v', 't', 'doc_id % 5', 'n_words', true)")   // watermark 1
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id IN (4, 17)")       // v2
      insertRange(spark, cat, 30, 40)                                // v3
      org.apache.spark.sql.GraftBridge.addOptimization(spark,
        graft.plans.MvRewriteRule(spark))
      def pinned() = spark.sql(
        s"""SELECT doc_id % 5 AS k, SUM(n_words) AS sum_words,
           |  COUNT(*) AS n_docs
           |FROM $cat.t VERSION AS OF 2 GROUP BY doc_id % 5""".stripMargin)
      def pinnedGlobal() = spark.sql(
        s"SELECT SUM(n_words) AS sum_words, COUNT(*) AS n_docs " +
          s"FROM $cat.t VERSION AS OF 1")
      def facts(df: DataFrame): (Boolean, Boolean) = {
        val plan = df.queryExecution.optimizedPlan
        def scans(p: java.nio.file.Path) = plan.collect {
          case s: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation
              if s.scan.description.contains(p.toString) => s
        }.nonEmpty
        (scans(wh.resolve("v")), scans(wh.resolve("t")))
      }
      val viaMv = pinned()
      val (pScansView, pScansSrc) = facts(viaMv)
      val globalViaMv = pinnedGlobal()
      val (gScansView, gScansSrc) = facts(globalViaMv)
      spark.conf.set("spark.graft.mv.rewrite", "false")
      val viaSource = pinned()
      val globalViaSource = pinnedGlobal()
      spark.conf.unset("spark.graft.mv.rewrite")
      require(OpsUtil.sameRowsLocal(viaMv, viaSource),
        "historical rewrite changed the pinned grouped result")
      require(OpsUtil.sameRowsLocal(globalViaMv, globalViaSource),
        "historical rewrite changed the pinned global result")
      val g = globalViaMv.head()
      val out = viaMv.orderBy("k")
        .withColumn("pinned_scans_view", lit(pScansView))
        .withColumn("pinned_scans_source", lit(pScansSrc))
        .withColumn("global_scans_view", lit(gScansView))
        .withColumn("global_scans_source", lit(gScansSrc))
        .withColumn("v1_sum_words", lit(g.getLong(0)))
        .withColumn("v1_n_docs", lit(g.getLong(1)))
      OpsUtil.driverLiteral(out)
    } finally teardown(spark, cat, wh)
  }

  val queries: Map[String, Q] = Map(
    "q285_mv_time_travel" -> q285MvTimeTravel,
    "q284_mv_derived_aggs" -> q284MvDerivedAggs,
    "q283_mixed_spec_dpp" -> q283MixedSpecDpp,
    "q282_mv_rollup" -> q282MvRollup,
    "q281_optimize_where" -> q281OptimizeWhere,
    "q280_vacuum_dry_run" -> q280VacuumDryRun,
    "q273_materialized_view" -> q273MaterializedView,
    "q274_mv_auto" -> q274MvAuto,
    "q275_minmax_stats" -> q275MinMaxStats,
    "q276_stream_mv" -> q276StreamMv,
    "q277_mv_rewrite" -> q277MvRewrite,
    "q278_write_distribution" -> q278WriteDistribution,
    "q279_sorted_scan" -> q279SortedScan,
    "q272_stream_maintenance" -> q272StreamMaintenance,
    "q265_auto_compact" -> q265AutoCompact,
    "q266_ndv_stats" -> q266NdvStats,
    "q267_cdf_evolution" -> q267CdfEvolution,
    "q268_merge_branch" -> q268MergeBranch,
    "q269_analyze" -> q269Analyze,
    "q270_retention" -> q270Retention,
    "q271_value_dpp" -> q271ValueDpp)

  val oracle: Map[String, String] = Map(
    // v0 enable · v1..v6 append f1..f6 · tag v3 · v7 concat c:
    // keep-1 retains {v7} + tagged v3 → expire 6; delete {f4,f5,f6}
    // (tag holds f1-f3, live holds c); dry run touches nothing
    // (8 manifests, 7 part files intact), real run equals preflight
    "q280_vacuum_dry_run" ->
      """SELECT CAST(24 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_doc_id,
        |  CAST(6 AS BIGINT) AS would_expire,
        |  CAST(3 AS BIGINT) AS would_delete,
        |  TRUE AS reclaims_bytes,
        |  CAST(8 AS BIGINT) AS history_after_dry,
        |  CAST(7 AS BIGINT) AS disk_files_after_dry,
        |  CAST(6 AS BIGINT) AS real_expired,
        |  CAST(3 AS BIGINT) AS real_deleted,
        |  CAST(4 AS BIGINT) AS disk_files_after_real""".stripMargin,
    // 2 inserts × 6 values = 12 files; scoping wb=3 to one file leaves
    // 11 total, 1 at value 3, 10 untouched; rows [0,96) intact
    "q281_optimize_where" ->
      """SELECT CAST(96 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 96) t(i))
        |    AS sum_doc_id,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 96) t(i))
        |    AS sum_words,
        |  CAST(2 AS BIGINT) AS scoped_before,
        |  CAST(1 AS BIGINT) AS scoped_after,
        |  CAST(10 AS BIGINT) AS untouched,
        |  CAST(11 AS BIGINT) AS files_total_after,
        |  CAST(1 AS BIGINT) AS value3_files""".stripMargin,
    // the final view over live rows [0,30) \ {5,17} with the +100
    // update on doc_id<4 folded in; lifecycle: seed at v2 (5 groups),
    // refresh to v5 applying 16 images (2 del + 4 pre + 4 post +
    // 6 ins), second refresh a 0-image no-op
    "q273_materialized_view" ->
      """WITH src AS (
        |  SELECT i AS doc_id,
        |    (i % 91 + 9) + CASE WHEN i < 4 THEN 100 ELSE 0 END AS n_words
        |  FROM range(0, 30) t(i) WHERE i NOT IN (5, 17))
        |SELECT doc_id % 5 AS k, 't_by_k' AS mv,
        |  CAST(SUM(n_words) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(2 AS BIGINT) AS created_at,
        |  CAST(5 AS BIGINT) AS seed_groups,
        |  CAST(5 AS BIGINT) AS refreshed_to,
        |  CAST(16 AS BIGINT) AS applied,
        |  CAST(0 AS BIGINT) AS noop_applied
        |FROM src GROUP BY doc_id % 5 ORDER BY k""".stripMargin,
    // auto-refresh: view over live rows [0,20) \ {3,13}, k = doc_id%4,
    // exactly one mv-refresh commit per source data commit (v2 append,
    // v3 MOR delete) — never refreshed by hand
    "q274_mv_auto" ->
      """SELECT i % 4 AS k,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(2 AS BIGINT) AS n_auto_refreshes
        |FROM range(0, 20) t(i) WHERE i NOT IN (3, 13)
        |GROUP BY i % 4 ORDER BY k""".stripMargin,
    // table-level bounds over [0,160): doc_id 0..159, n_words wraps
    // i%91+9 covering 9..99, fp is the md5-prefix fingerprint
    "q275_minmax_stats" ->
      """SELECT col_name, lo, hi FROM (
        |  SELECT 'doc_id' AS col_name, CAST(0 AS BIGINT) AS lo,
        |    CAST(159 AS BIGINT) AS hi
        |  UNION ALL
        |  SELECT 'fp',
        |    (SELECT MIN(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))
        |      ::BIGINT) FROM range(0, 160) t(i)),
        |    (SELECT MAX(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))
        |      ::BIGINT) FROM range(0, 160) t(i))
        |  UNION ALL SELECT 'n_words', 9, 99)
        |ORDER BY col_name""".stripMargin,
    // view over [0,24) after the drain, k = doc_id % 3; one mv-refresh
    // per sink data epoch — the fresh stream's initial (empty) batch
    // commits an epoch too, so 6 data epochs + 1 zero-delta watermark
    // advance = 7 — and the checkpoint replay adds none
    "q276_stream_mv" ->
      """SELECT i % 3 AS k,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(7 AS BIGINT) AS n_refreshes,
        |  CAST(7 AS BIGINT) AS n_refreshes_after_replay
        |FROM range(0, 24) t(i) GROUP BY i % 3 ORDER BY k""".stripMargin,
    // time travel from view history: at v2 the live state is
    // [0,30) \ {4,17} (grouped by doc_id % 5 from the MV commit whose
    // watermark is 2); at v1 it is all of [0,30) (global roll-up from
    // the seed commit); both rewritten plans scan only the view
    "q285_mv_time_travel" ->
      """SELECT i % 5 AS k,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS pinned_scans_view, FALSE AS pinned_scans_source,
        |  TRUE AS global_scans_view, FALSE AS global_scans_source,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 30) t(i))
        |    AS v1_sum_words,
        |  CAST(30 AS BIGINT) AS v1_n_docs
        |FROM range(0, 30) t(i) WHERE i NOT IN (4, 17)
        |GROUP BY i % 5 ORDER BY k""".stripMargin,
    // derived aggregates over live rows [0,36) \ {9,28}: AVG as one
    // IEEE division of exact integer sums, COUNT(DISTINCT key) as the
    // view's group count — both at coarse grain (i%6)%3 and globally,
    // all four rewritten plans scanning only the view
    "q284_mv_derived_aggs" ->
      """SELECT (i % 6) % 3 AS k3,
        |  CAST(SUM(i % 91 + 9) AS DOUBLE) / COUNT(*) AS avg_words,
        |  CAST(COUNT(DISTINCT i % 6) AS BIGINT) AS n_keys,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS grouped_scans_view, FALSE AS grouped_scans_source,
        |  TRUE AS global_scans_view, FALSE AS global_scans_source,
        |  (SELECT CAST(SUM(i % 91 + 9) AS DOUBLE) / COUNT(*)
        |    FROM range(0, 36) t(i) WHERE i NOT IN (9, 28))
        |    AS global_avg_words,
        |  CAST(6 AS BIGINT) AS global_n_keys
        |FROM range(0, 36) t(i) WHERE i NOT IN (9, 28)
        |GROUP BY (i % 6) % 3 ORDER BY k3""".stripMargin,
    // mixed-generation DPP: [0,96) joined to dim values {1,3} on
    // wb = (i%91+9)%6; the pre-evolution file (rows [0,48)) is read in
    // full, the six post-evolution value files prune to 2 — so the
    // fact scan emits 48 + |matching rows in [48,96)| = 65
    "q283_mixed_spec_dpp" ->
      """SELECT (i % 91 + 9) % 6 AS wb,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(i) AS BIGINT) AS sum_doc_id,
        |  TRUE AS runtime_filtered,
        |  CAST(1 AS BIGINT) AS files_oldgen,
        |  CAST(6 AS BIGINT) AS files_newgen,
        |  CAST(2 AS BIGINT) AS newgen_files_matching,
        |  (SELECT CAST(48 + COUNT(*) AS BIGINT) FROM range(48, 96) t(i)
        |    WHERE (i % 91 + 9) % 6 IN (1, 3)) AS scan_emitted_rows
        |FROM range(0, 96) t(i) WHERE (i % 91 + 9) % 6 IN (1, 3)
        |GROUP BY (i % 91 + 9) % 6 ORDER BY wb""".stripMargin,
    // roll-up over live rows [0,36) \ {7,22} at grain (doc_id%6)%2 —
    // coarser than the view's doc_id%6 — plus the global aggregate;
    // rewritten plans scan ONLY the view and keep an Aggregate
    // (re-aggregation), the rule-off fallback scans only the source
    "q282_mv_rollup" ->
      """SELECT (i % 6) % 2 AS k2,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS rollup_scans_view, FALSE AS rollup_scans_source,
        |  TRUE AS rollup_keeps_aggregate,
        |  TRUE AS global_scans_view, FALSE AS global_scans_source,
        |  FALSE AS fallback_scans_view, TRUE AS fallback_scans_source,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 36) t(i)
        |    WHERE i NOT IN (7, 22)) AS global_sum_words,
        |  CAST(34 AS BIGINT) AS global_n_docs
        |FROM range(0, 36) t(i) WHERE i NOT IN (7, 22)
        |GROUP BY (i % 6) % 2 ORDER BY k2""".stripMargin,
    // aggregate over live rows [0,30) \ {4,11}; with the rule on the
    // plan scans the view and keeps no Aggregate, with it off the
    // inverse — and both return exactly these rows
    "q277_mv_rewrite" ->
      """SELECT i % 5 AS k,
        |  CAST(SUM(i % 91 + 9) AS BIGINT) AS sum_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS rewrite_scans_view,
        |  FALSE AS rewrite_keeps_aggregate,
        |  FALSE AS fallback_scans_view,
        |  TRUE AS fallback_keeps_aggregate
        |FROM range(0, 30) t(i) WHERE i NOT IN (4, 11)
        |GROUP BY i % 5 ORDER BY k""".stripMargin,
    // the distribution demand bounds files at exactly one per bucket
    // per write: 4 after the first insert, 8 after the second
    "q278_write_distribution" ->
      """SELECT CAST(96 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 96) t(i))
        |    AS sum_doc_id,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 96) t(i))
        |    AS sum_words,
        |  CAST(4 AS BIGINT) AS files_after_first,
        |  CAST(8 AS BIGINT) AS files_total""".stripMargin,
    // join [0,48) ⋈ [0,32) on doc_id → rows [0,32), words2 = 2·(i%91+9);
    // the plan is a sort-merge join with zero exchanges and zero sorts
    "q279_sorted_scan" ->
      """SELECT CAST(32 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 32) t(i))
        |    AS sum_doc_id,
        |  (SELECT CAST(SUM(2 * (i % 91 + 9)) AS BIGINT)
        |    FROM range(0, 32) t(i)) AS sum_words2,
        |  TRUE AS merge_join, FALSE AS shuffles, FALSE AS sorts"""
        .stripMargin,
    // AvailableNow drains the 6 source commits as 6 data epochs plus
    // the fresh-stream initial batch (v0's empty snapshot); the file
    // trace under threshold 3 (concat target 3/2 = 1) runs
    // 1·2·3·4→1·2·3·4→1: the LAST data epoch crosses the bound, so the
    // final live set is ONE concatenated file. The replay drains
    // nothing (same checkpoint, no new commits).
    "q272_stream_maintenance" ->
      """SELECT CAST(24 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_doc_id,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_words,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(1 AS BIGINT) AS n_files_after_replay""".stripMargin,
    // v0 enable(0) · v1..v5 append (1..5 files) · v6 compact (2) ·
    // v7 append (3): max live = 5, compacts = 1, final files = 3;
    // rows [0,24) intact with row ids 0..23 (insert order = doc order)
    "q265_auto_compact" ->
      """SELECT CAST(24 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_doc_id,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_words,
        |  CAST(0 AS BIGINT) AS min_rid, CAST(23 AS BIGINT) AS max_rid,
        |  CAST(24 AS BIGINT) AS n_rids,
        |  CAST(3 AS BIGINT) AS n_files,
        |  CAST(1 AS BIGINT) AS n_compacts,
        |  CAST(5 AS BIGINT) AS max_live_files""".stripMargin,
    // exact-mode sketches under the cap: table NDV = COUNT(DISTINCT)
    "q266_ndv_stats" ->
      """SELECT col_name, ndv FROM (
        |  SELECT '_rows' AS col_name, CAST(200 AS BIGINT) AS ndv
        |  UNION ALL
        |  SELECT 'doc_id', (SELECT COUNT(DISTINCT i) FROM range(0,200) t(i))
        |  UNION ALL
        |  SELECT 'fp', (SELECT COUNT(DISTINCT
        |      ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT)
        |    FROM range(0, 200) t(i))
        |  UNION ALL
        |  SELECT 'n_words', (SELECT COUNT(DISTINCT i % 91 + 9)
        |    FROM range(0, 200) t(i)))
        |ORDER BY col_name""".stripMargin,
    // v1: 12 inserts (label NULL); v3: 6 inserts labeled id*10;
    // v4: 2 delete images — doc 2 pre-ADD (label NULL), doc 13 labeled
    // 130; v6: 3 inserts labeled id*100. v2/v5 emit no rows.
    "q267_cdf_evolution" ->
      """WITH rows_ AS (
        |  SELECT 1 AS commit_version, 'insert' AS change_type,
        |    i AS doc_id, CAST(NULL AS BIGINT) AS label
        |  FROM range(0, 12) t(i)
        |  UNION ALL
        |  SELECT 3, 'insert', i, i * 10 FROM range(12, 18) t(i)
        |  UNION ALL SELECT 4, 'delete', 2, NULL
        |  UNION ALL SELECT 4, 'delete', 13, 130
        |  UNION ALL
        |  SELECT 6, 'insert', i, i * 100 FROM range(18, 21) t(i))
        |SELECT CAST(commit_version AS BIGINT) AS commit_version,
        |  change_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
        |  CAST(COUNT(label) AS BIGINT) AS n_labeled,
        |  CAST(SUM(label) AS BIGINT) AS sum_label
        |FROM rows_ GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // first analyze backfills both files, second is a no-op; NDV is
    // exact under the cap: doc_id 120 distinct, n_words wraps i%91+9
    "q269_analyze" ->
      """SELECT col_name, ndv FROM (
        |  SELECT '_analyzed' AS col_name, CAST(2 AS BIGINT) AS ndv
        |  UNION ALL SELECT '_analyzed_again', 0
        |  UNION ALL SELECT '_rows', 120
        |  UNION ALL
        |  SELECT 'doc_id', (SELECT COUNT(DISTINCT i) FROM range(0,120) t(i))
        |  UNION ALL
        |  SELECT 'n_words', (SELECT COUNT(DISTINCT i % 91 + 9)
        |    FROM range(0, 120) t(i)))
        |ORDER BY col_name""".stripMargin,
    // v0 enable + v1..v6 appends; retention 3 fires after v3/v4/v5/v6,
    // each keeping the newest 3 → final history {4,5,6}; rows intact
    "q270_retention" ->
      """SELECT CAST(24 AS BIGINT) AS n_rows,
        |  (SELECT CAST(SUM(i) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_doc_id,
        |  (SELECT CAST(SUM(i % 91 + 9) AS BIGINT) FROM range(0, 24) t(i))
        |    AS sum_words,
        |  CAST(3 AS BIGINT) AS n_history,
        |  CAST(4 AS BIGINT) AS min_version,
        |  CAST(6 AS BIGINT) AS max_version""".stripMargin,
    // wb = (i%91+9) % 6 over [0,96); dim = docs rows {1, 3} renamed
    // (wb = doc_id, tag = title)
    "q271_value_dpp" ->
      """WITH f AS (
        |  SELECT i AS doc_id, (i % 91 + 9) % 6 AS wb
        |  FROM range(0, 96) t(i)),
        |d(wb, tag) AS (VALUES (1, 'doc-1'), (3, 'doc-3'))
        |SELECT d.tag, CAST(f.wb AS BIGINT) AS wb,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(f.doc_id) AS BIGINT) AS sum_doc_id
        |FROM f JOIN d ON f.wb = d.wb
        |GROUP BY d.tag, f.wb ORDER BY f.wb""".stripMargin,
    // final rows [0,10)\{3} ∪ [10,14) ∪ [20,24); merge lands at main
    // v3 (v0 enable · v1 append · v2 append · v3 merge-branch)
    "q268_merge_branch" ->
      """WITH final AS (
        |  SELECT i AS doc_id, i % 91 + 9 AS nw FROM range(0, 14) t(i)
        |  WHERE i <> 3
        |  UNION ALL
        |  SELECT i, i % 91 + 9 FROM range(20, 24) t(i))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
        |  CAST(SUM(nw) AS BIGINT) AS sum_words,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_id,
        |  CAST(3 AS BIGINT) AS merge_version,
        |  CAST(1 AS BIGINT) AS n_merge_commits
        |FROM final""".stripMargin)
}
