package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import OpsUtil._

/** Core relational operator surface (SURVEY.md §2.2–§2.9), re-targeted onto
  * the TPC-H-ish test tables per SURVEY.md §7.1.
  *
  * Every query is paired with DuckDB oracle SQL in [[oracle]]. Design rules
  * for 100 TB scale (noted per query): dimension joins are broadcast, money
  * aggregation is decimal-exact (order-independent ⇒ safe under any shuffle
  * partitioning), every orderBy feeding a limit carries a unique tiebreak.
  */
object Relational {

  /** Flagship (reference Task-1 shape: scan→filter→join→group→agg→sort;
    * `/root/reference/Assignment-python.py:35-82`). Filter is pushed to the
    * parquet scan; nation (25 rows) is broadcast; the orders/customer joins
    * shuffle on their keys — at 100 TB, AQE + shuffle on l_orderkey is the
    * intended plan (orders and lineitem co-partition on orderkey).
    */
  val q01FlagshipRevenue: Q = (spark, dir) => {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // Partial aggregation BEFORE the join: collapse the fact table to one
    // row per order (exact decimal sums commute with the re-aggregation),
    // so the fact-fact join moves |orders| rows instead of |lineitem|.
    val perOrder = l.groupBy($"l_orderkey")
      .agg(sum(revenueExpr).as("rev"), count(lit(1)).as("cnt"))
    perOrder.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").as("order_year"))
      .agg(
        sum($"rev").cast("double").as("revenue"),
        sum($"cnt").as("n_items"))
      .orderBy($"n_name", $"order_year")
  }

  /** Argmax via sort-desc + limit 1 (reference `:65` best-NA-publisher;
    * O1). Spark plans TakeOrderedAndProject — no full sort at scale. */
  val q02TopNation: Q = (spark, dir) => {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // Same pre-join partial aggregation as q01: one row per order before
    // the fact-fact join. Then collapse AGAIN to one row per customer
    // BEFORE any dimension join — decimal sums re-associate exactly, so
    // re-grouping is semantics-free, and it shrinks the stream entering
    // the dimension chain from |orders| to |customers|, small enough
    // that customer⋈nation joins it by broadcast with no further
    // shuffle (measured 2.0 s → see PLANS.md).
    val perOrder = l.groupBy($"l_orderkey").agg(sum(revenueExpr).as("rev"))
    // NO per-customer collapse: the final groupBy(n_name) has map-side
    // partial aggregation, so at most 25 rows per task reach its
    // exchange no matter how many orders flow in — the former
    // intermediate groupBy(o_custkey) was a full |orders|-row exchange
    // that bought nothing (guide §2.4: two aggregations keyed
    // differently = two shuffles; one suffices). Decimal sums
    // re-associate exactly, so dropping the middle grouping is
    // semantics-free; dimension joins stay broadcast.
    val custNation = c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    perOrder
      .join(o.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custNation), $"o_custkey" === $"c_custkey")
      .groupBy($"n_name")
      .agg(sum($"rev").cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
      .limit(1)
  }

  /** Null introduction via left join + isNull probe (reference `:68-70`
    * null-count; F2/N3/A11). The test tables have no stored nulls, so the
    * nulls are produced relationally. */
  val q03NullProbe: Q = (spark, dir) => {
    import spark.implicits._
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    n.join(s, $"n_nationkey" === $"s_nationkey", "left")
      .filter($"s_suppkey".isNull)
      .agg(count(lit(1)).as("n_nations_without_supplier"))
  }

  /** Season-table-shaped multi-aggregate with conditional counts (reference
    * `:257-265` games/wins/draws/...; A3/A4/X6). count(when(...)) keeps
    * BIGINT on both engines. */
  val q04CondAgg: Q = (spark, dir) => {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when($"o_orderstatus" === "F", lit(1))).as("n_f"),
        count(when($"o_orderstatus" === "O", lit(1))).as("n_o"),
        count(when($"o_orderstatus" === "P", lit(1))).as("n_p"),
        sum(when($"o_orderstatus" === "F", money($"o_totalprice"))
          .otherwise(money(lit(0)))).cast("double").as("f_revenue"))
      .orderBy($"order_year")
  }

  /** Left join of a dimension against a pre-aggregate + na.fill for the
    * no-match rows (reference 0-0 matches, `:183-188`; J1/N1). Supplier agg
    * (≤hundreds of rows) broadcasts; at scale the aggregate shrinks the
    * fact side before the join — join the small side, not the fact. */
  val q05LeftJoinFill: Q = (spark, dir) => {
    import spark.implicits._
    val n = Tables.nation(spark, dir)
    val sAgg = Tables.supplier(spark, dir)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"), dsum($"s_acctbal").as("total_bal"))
    n.join(broadcast(sAgg), $"n_nationkey" === $"s_nationkey", "left")
      .na.fill(Map("n_suppliers" -> 0, "total_bal" -> 0.0))
      .select($"n_name", $"n_suppliers", $"total_bal")
      .orderBy($"n_name")
  }

  /** Perspective self-union via unionByName with deliberately different
    * column orders (reference home/away swap, `:228-238`; U1). */
  val q06SelfUnion: Q = (spark, dir) => {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .select(lit("customer").as("kind"), $"c_acctbal".as("bal"))
    val s = Tables.supplier(spark, dir)
      .select($"s_acctbal".as("bal"), lit("supplier").as("kind"))
    c.unionByName(s)
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_accounts"), dsum($"bal").as("total_bal"))
      .orderBy($"kind")
  }

  /** Deduplicating dimension extraction (reference `:180` distinct; A12). */
  val q07Distinct: Q = (spark, dir) => {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** League-table analog: global row_number ranking with composite,
    * computed tiebreaks + %+d goal-difference formatting + final
    * projection (reference `:305-329`; W1/X3/P5). The unpartitioned window
    * runs over 25 already-aggregated rows — the single-partition exchange
    * is applied post-aggregation, which is the scale-safe ordering. */
  val q08LeagueTable: Q = (spark, dir) => {
    import spark.implicits._
    val perNation = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("games"),
        count(when($"o_orderstatus" === "F", lit(1))).as("wins"),
        count(when($"o_orderstatus" === "P", lit(1))).as("draws"),
        count(when($"o_orderstatus" === "O", lit(1))).as("losses"))
      .withColumn("pts", $"wins" * 3 + $"draws")
      .withColumn("gd", ($"wins" - $"losses").cast("int"))
    perNation
      .withColumn("pos", row_number().over(
        Window.orderBy($"pts".desc, $"gd".desc, $"n_name")))
      .withColumn("gd", format_string("%+d", $"gd"))
      .selectExpr("pos", "n_name AS team", "games", "wins", "draws",
        "losses", "gd", "pts")
      .orderBy($"pos")
  }

  /** Partitioned rank + top-k-per-group filter (reference best-2-per-
    * competition, `:451-458`; W2/F5). Window partitions by region ⇒ scales
    * with the number of groups. */
  val q09RankPerRegion: Q = (spark, dir) => {
    import spark.implicits._
    val perNation = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(dsum($"c_acctbal").as("total_bal"))
    perNation
      .withColumn("rnk", rank().over(
        Window.partitionBy($"r_name").orderBy($"total_bal".desc, $"n_name")))
      .filter($"rnk" <= 2)
      .select($"r_name", $"n_name", $"total_bal", $"rnk")
      .orderBy($"r_name", $"rnk", $"n_name")
  }

  /** Group + sum + top-k (reference top-5 red pixels, `:829-835`; A9/O3).
    * TakeOrderedAndProject: no global sort materialization. */
  val q10TopParts: Q = (spark, dir) => {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .groupBy($"p_name")
      .agg(sum(money($"l_quantity")).cast("double").as("total_qty"))
      .orderBy($"total_qty".desc, $"p_name")
      .limit(5)
  }

  /** Ratio-of-sums percentage per group (reference pass accuracy,
    * `:357-388`; A5/A6/X8). Numerator and denominator are decimal-exact;
    * the single final division+round is deterministic on both engines. */
  val q11DiscountShare: Q = (spark, dir) => {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(
          (sum(money($"l_extendedprice") * money($"l_discount")).cast("double")
            / sum(money($"l_extendedprice")).cast("double")) * 100, 2)
          .as("discount_pct"),
        count(lit(1)).as("n_items"))
      .orderBy($"l_returnflag")
  }

  /** Two-level re-aggregation with an expression aggregate (reference GD
    * re-agg `:425-445`; A7/A8). */
  val q12RegionReagg: Q = (spark, dir) => {
    import spark.implicits._
    val perNation = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey", $"n_name")
      .agg(
        dsum($"o_totalprice").as("nation_rev"),
        count(lit(1)).as("nation_orders"))
    perNation
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        (sum(money($"nation_rev")) - sum(money(lit(0)))).cast("double").as("region_rev"),
        sum($"nation_orders").as("region_orders"),
        // Exact integer cents via integer division: even a single IEEE
        // division of exact aggregates differed from DuckDB in the last
        // ulp (r02: hash mismatch — DuckDB divides DECIMAL/BIGINT in
        // decimal). Values are positive, so DIV (trunc) == // (floor).
        (sum(money($"nation_rev")) * 100).cast("long").as("region_cents"))
      .withColumn("avg_order_cents", expr("region_cents DIV region_orders"))
      .drop("region_cents")
      .orderBy($"r_name")
  }

  /** Global (ungrouped) aggregate (reference `agg(avg(...))` `:984`; A10).
    * avg computed as exact-sum/count for cross-engine determinism. */
  val q13GlobalAgg: Q = (spark, dir) => {
    import spark.implicits._
    Tables.orders(spark, dir)
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(money($"o_totalprice")).cast("double") / count(lit(1)), 2)
          .as("avg_price"),
        money(max($"o_totalprice")).cast("double").as("max_price"),
        money(min($"o_totalprice")).cast("double").as("min_price"))
  }

  /** Positional union chain of independently-built single-row frames
    * (reference ML-results table `:1025-1033`; U2/S5). */
  val q14UnionChain: Q = (spark, dir) => {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    def statusRow(st: String): DataFrame =
      o.filter($"o_orderstatus" === st)
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("revenue"))
        .select(lit(st).as("status"), $"n", $"revenue")
    Seq("F", "O", "P").map(statusRow).reduce(_ union _).orderBy($"status")
  }

  /** Inner join on an expression condition (equi + inequality residual;
    * reference hexcode join `:720-723`; J3). */
  val q15JoinExpr: Q = (spark, dir) => {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).withColumnRenamed("p_partkey", "pk")
    l.join(broadcast(p), $"l_partkey" === $"pk" && $"p_retailprice" < $"l_extendedprice")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_cheaper_than_sold"))
      .orderBy($"p_brand")
  }

  /** Semi/anti join pair (beyond-reference set ops; SURVEY §2.4 "free in
    * Spark"): nations with vs without suppliers, as one unioned result. */
  val q16SemiAnti: Q = (spark, dir) => {
    import spark.implicits._
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    val has = n.join(s, $"n_nationkey" === $"s_nationkey", "left_semi")
      .select($"n_name", lit("has_supplier").as("kind"))
    val none = n.join(s, $"n_nationkey" === $"s_nationkey", "left_anti")
      .select($"n_name", lit("no_supplier").as("kind"))
    has.unionByName(none).orderBy($"kind", $"n_name")
  }

  val queries: Map[String, Q] = Map(
    "q01_flagship_revenue" -> q01FlagshipRevenue,
    "q02_top_nation" -> q02TopNation,
    "q03_null_probe" -> q03NullProbe,
    "q04_cond_agg" -> q04CondAgg,
    "q05_left_join_fill" -> q05LeftJoinFill,
    "q06_self_union" -> q06SelfUnion,
    "q07_distinct" -> q07Distinct,
    "q08_league_table" -> q08LeagueTable,
    "q09_rank_per_region" -> q09RankPerRegion,
    "q10_top_parts" -> q10TopParts,
    "q11_discount_share" -> q11DiscountShare,
    "q12_region_reagg" -> q12RegionReagg,
    "q13_global_agg" -> q13GlobalAgg,
    "q14_union_chain" -> q14UnionChain,
    "q15_join_expr" -> q15JoinExpr,
    "q16_semi_anti" -> q16SemiAnti,
  )

  val oracle: Map[String, String] = Map(
    "q01_flagship_revenue" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year,
         |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_top_nation" ->
      s"""SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY revenue DESC, n_name LIMIT 1""".stripMargin,
    "q03_null_probe" ->
      """SELECT COUNT(*) AS n_nations_without_supplier
        |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        |WHERE s_suppkey IS NULL""".stripMargin,
    "q04_cond_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  COUNT(*) AS n_orders,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(12,2))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS f_revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_left_join_fill" ->
      s"""SELECT n_name,
         |  COALESCE(n_suppliers, 0) AS n_suppliers,
         |  COALESCE(total_bal, 0.0) AS total_bal
         |FROM nation LEFT JOIN (
         |  SELECT s_nationkey, COUNT(*) AS n_suppliers,
         |    ${dsumSql("s_acctbal")} AS total_bal
         |  FROM supplier GROUP BY 1
         |) ON n_nationkey = s_nationkey
         |ORDER BY n_name""".stripMargin,
    "q06_self_union" ->
      s"""SELECT kind, COUNT(*) AS n_accounts, ${dsumSql("bal")} AS total_bal
         |FROM (
         |  SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
         |  UNION ALL
         |  SELECT 'supplier' AS kind, s_acctbal AS bal FROM supplier
         |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q08_league_table" ->
      """WITH per_nation AS (
        |  SELECT n_name,
        |    COUNT(*) AS games,
        |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS wins,
        |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS draws,
        |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS losses
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1
        |), scored AS (
        |  SELECT *, wins * 3 + draws AS pts,
        |    CAST(wins - losses AS INT) AS gd_i
        |  FROM per_nation
        |)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pts DESC, gd_i DESC, n_name) AS INT) AS pos,
        |  n_name AS team, games, wins, draws, losses,
        |  printf('%+d', gd_i) AS gd, pts
        |FROM scored ORDER BY pos""".stripMargin,
    "q09_rank_per_region" ->
      s"""WITH per_nation AS (
         |  SELECT r_name, n_name, ${dsumSql("c_acctbal")} AS total_bal
         |  FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY 1, 2
         |), ranked AS (
         |  SELECT r_name, n_name, total_bal,
         |    CAST(RANK() OVER (PARTITION BY r_name
         |      ORDER BY total_bal DESC, n_name) AS INT) AS rnk
         |  FROM per_nation
         |)
         |SELECT r_name, n_name, total_bal, rnk FROM ranked
         |WHERE rnk <= 2 ORDER BY r_name, rnk, n_name""".stripMargin,
    "q10_top_parts" ->
      """SELECT p_name,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY total_qty DESC, p_name LIMIT 5""".stripMargin,
    "q11_discount_share" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    * 100, 2) AS discount_pct,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_region_reagg" ->
      s"""WITH per_nation AS (
         |  SELECT n_regionkey, n_name,
         |    ${dsumSql("o_totalprice")} AS nation_rev,
         |    COUNT(*) AS nation_orders
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2
         |)
         |SELECT r_name,
         |  CAST(SUM(CAST(nation_rev AS DECIMAL(12,2)))
         |    - SUM(CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS region_rev,
         |  CAST(SUM(nation_orders) AS BIGINT) AS region_orders,
         |  CAST(CAST(SUM(CAST(nation_rev AS DECIMAL(12,2))) * 100 AS BIGINT)
         |    // CAST(SUM(nation_orders) AS BIGINT) AS BIGINT) AS avg_order_cents
         |FROM per_nation JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_global_agg" ->
      """SELECT COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    / COUNT(*), 2) AS avg_price,
        |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS max_price,
        |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS min_price
        |FROM orders""".stripMargin,
    "q14_union_chain" ->
      s"""SELECT * FROM (
         |  SELECT 'F' AS status, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders WHERE o_orderstatus = 'F'
         |  UNION ALL
         |  SELECT 'O' AS status, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders WHERE o_orderstatus = 'O'
         |  UNION ALL
         |  SELECT 'P' AS status, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders WHERE o_orderstatus = 'P'
         |) ORDER BY status""".stripMargin,
    "q15_join_expr" ->
      """SELECT p_brand, COUNT(*) AS n_cheaper_than_sold
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND p_retailprice < l_extendedprice
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_semi_anti" ->
      """SELECT n_name, 'has_supplier' AS kind FROM nation
        |WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
        |UNION ALL
        |SELECT n_name, 'no_supplier' AS kind FROM nation
        |WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
        |ORDER BY kind, n_name""".stripMargin,
  )
}
