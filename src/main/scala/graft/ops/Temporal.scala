package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import OpsUtil._

/** Temporal / interval operators (SURVEY.md §2.15: the reference's
  * declared-but-unimplemented Advanced Task 2 implies interval-overlap /
  * as-of semantics, `/root/reference/Assignment-python.py:548-567`).
  *
  * Implementation choice for 100 TB: an as-of join is NOT expressed as a
  * non-equi range join (O(n·m) per key). Instead both streams are unioned
  * and a per-key ordered window carries the last reference row forward —
  * one shuffle on user_id, linear scan per partition, no cross product.
  * This is the standard scalable as-of pattern (also how streaming engines
  * sequence it).
  */
object Temporal {

  /** As-of join: for every purchase event, the most recent click by the
    * same user at-or-before it. Timestamps leave as epoch seconds: the
    * generator has shipped events.ts at both ns and µs precision (see
    * Tables.events), and epoch-second flooring is identical on both
    * engines under either encoding — raw sub-second timestamps would not
    * hash-match across them.
    */
  val q17AsofJoin: Q = (spark, dir) => {
    import spark.implicits._
    val tagged = Tables.events(spark, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "click", $"ts").as("click_ts"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts", last($"click_ts", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        unix_timestamp($"ts".cast("timestamp")).as("ts_sec"),
        unix_timestamp($"last_click_ts".cast("timestamp")).as("last_click_sec"))
      .orderBy($"event_id")
  }

  /** Gap-based sessionization (30-min inactivity ⇒ new session), then
    * per-user session stats. Two ordered windows over the same user_id
    * partitioning (single shuffle; Spark reuses the sort), then two
    * hash aggregations. All outputs integral ⇒ exact cross-engine match. */
  val q18Sessionize: Q = (spark, dir) => {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        unix_timestamp($"ts".cast("timestamp")).as("sec"))
    val sessions = e
      .withColumn("prev_sec", lag($"sec", 1).over(
        Window.partitionBy($"user_id").orderBy($"sec", $"event_id")))
      .withColumn("new_session",
        when($"prev_sec".isNull || $"sec" - $"prev_sec" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        (max($"sec") - min($"sec")).as("duration_sec"))
    sessions
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        max($"n_events").as("longest_session_events"),
        sum($"duration_sec").as("total_active_sec"))
      .orderBy($"user_id")
  }

  /** Interval-overlap join (SURVEY.md §2.15: the reference's plus-minus
    * spec implies point-in-interval semantics): purchase events joined
    * into the session interval that contains them. The join is equi on
    * user_id with the range condition as a residual — the equi key blocks
    * the pairing (per-user intervals × per-user points), so no O(n·m)
    * cross product forms; this is the J4 mitigation SURVEY §7.3 planned. */
  val q52IntervalOverlap: Q = (spark, dir) => {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp($"ts".cast("timestamp")).as("sec"))
    val sessions = e
      .withColumn("prev_sec", lag($"sec", 1).over(
        Window.partitionBy($"user_id").orderBy($"sec", $"event_id")))
      .withColumn("new_session",
        when($"prev_sec".isNull || $"sec" - $"prev_sec" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"sec").as("start_sec"), max($"sec").as("end_sec"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id", $"sec")
    sessions
      .join(purchases,
        $"user_id" === $"p_user"
          && $"sec" >= $"start_sec" && $"sec" <= $"end_sec")
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_purchases"),
        (max($"end_sec") - max($"start_sec")).as("duration_sec"))
      .orderBy($"user_id", $"session_id")
  }

  /** The same as-of semantics as q17, but through the engine's own
    * whole-operator path: graft.plans.AsOfJoin (custom LogicalPlan →
    * SparkStrategy → streaming merge exec; see that file's scale notes).
    * The right side is deduped to one row per (user_id, second) so the
    * "latest at or before" row is unique — tie-free on both engines. */
  val q63AsofCustom: Q = (spark, dir) => {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts".cast("timestamp")).as("ts_sec"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts_sec".as("click_sec")).distinct()
    graft.plans.AsOf.join(purchases, clicks, "user_id",
        "ts_sec", "click_sec", Seq("click_sec" -> "last_click_sec"))
      .orderBy($"event_id")
  }

  val queries: Map[String, Q] = Map(
    "q17_asof_join" -> q17AsofJoin,
    "q18_sessionize" -> q18Sessionize,
    "q52_interval_overlap" -> q52IntervalOverlap,
    "q63_asof_custom" -> q63AsofCustom,
  )

  val oracle: Map[String, String] = Map(
    "q17_asof_join" ->
      """WITH tagged AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN event_type = 'click' THEN ts END AS click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), win AS (
        |  SELECT *, LAST_VALUE(click_ts IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        |  FROM tagged
        |)
        |SELECT event_id, user_id,
        |  CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec,
        |  CAST(floor(date_part('epoch', last_click_ts)) AS BIGINT) AS last_click_sec
        |FROM win WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q63_asof_custom" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS click_sec
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, p.ts_sec, c.click_sec AS last_click_sec
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts_sec >= c.click_sec
        |ORDER BY p.event_id""".stripMargin,
    "q18_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec
        |  FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT *, LAG(sec) OVER (PARTITION BY user_id
        |          ORDER BY sec, event_id) AS prev_sec FROM e)
        |), numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |), sessions AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |    MAX(sec) - MIN(sec) AS duration_sec
        |  FROM numbered GROUP BY 1, 2
        |)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(MAX(n_events) AS BIGINT) AS longest_session_events,
        |  CAST(SUM(duration_sec) AS BIGINT) AS total_active_sec
        |FROM sessions GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q52_interval_overlap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec
        |  FROM events
        |), numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |    FROM (SELECT *, LAG(sec) OVER (PARTITION BY user_id
        |            ORDER BY sec, event_id) AS prev_sec FROM e)
        |  )
        |), sessions AS (
        |  SELECT user_id, session_id, MIN(sec) AS start_sec,
        |    MAX(sec) AS end_sec
        |  FROM numbered GROUP BY 1, 2
        |), purchases AS (
        |  SELECT user_id AS p_user, event_id, sec FROM e
        |  WHERE event_type = 'purchase'
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_purchases,
        |  CAST(MAX(end_sec) - MAX(start_sec) AS BIGINT) AS duration_sec
        |FROM sessions JOIN purchases
        |  ON user_id = p_user AND sec >= start_sec AND sec <= end_sec
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
