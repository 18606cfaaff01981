package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import OpsUtil._

/** Grouping-set extensions beyond the reference's plain groupBy (SURVEY.md
  * §2.5 "not used — free in Spark if extended"): pivot and rollup. Both
  * stay two-phase hash aggregations; rollup adds one grouping-id column
  * per level, no extra shuffle. */
object Grouping {

  /** Pivot: per user-decile event-type counts (the A3 conditional-sum
    * pattern as a first-class pivot). Explicit value list keeps the plan
    * single-pass (no distinct-values pre-query) — the scale-correct form. */
  val q34Pivot: Q = (spark, dir) => {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(($"user_id" % 10).as("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy($"bucket")
  }

  /** Rollup over region → nation with subtotal rows (null keys mark the
    * subtotal levels, as in ANSI ROLLUP). */
  val q35Rollup: Q = (spark, dir) => {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** Skew-salted join (builder prompt: "salting for skew"): ~80% of events
    * collapse onto one hot key, which would pin a single reducer in a
    * plain shuffle join. The fact side gets a salt in [0,8); the dimension
    * is replicated once per salt value; the join key becomes (key, salt),
    * spreading the hot key over 8 partitions. Semantically identical to
    * the unsalted join — the oracle runs the plain form. */
  val q39SaltedJoin: Q = (spark, dir) => {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .withColumn("skew_key",
        when($"user_id" < 120, 0L).otherwise($"user_id"))
      .withColumn("salt", pmod($"event_id", lit(8)))
    val dim = spark.range(150)
      .select($"id".as("skew_key"), ($"id" % 5).as("grp"))
      .withColumn("salt", explode(sequence(lit(0L), lit(7L))))
    e.join(dim, Seq("skew_key", "salt"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      .orderBy($"grp")
  }

  val queries: Map[String, Q] = Map(
    "q34_pivot" -> q34Pivot,
    "q35_rollup" -> q35Rollup,
    "q39_salted_join" -> q39SaltedJoin,
  )

  val oracle: Map[String, String] = Map(
    "q34_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS total_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q39_salted_join" ->
      s"""SELECT d.i % 5 AS grp, COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS total_value
         |FROM events JOIN (SELECT i FROM range(0, 150) t(i)) d
         |  ON d.i = CASE WHEN user_id < 120 THEN 0 ELSE user_id END
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
