package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Round-12 specs: the shipped-model scoring query — value recount from
  * first principles and the scan-score-count plan shape. */
class Round12Spec extends SparkSpec {

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
    case s: ShuffleExchangeExec => Seq(s)
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
  }.flatten

  test("q213: confusion counts match a driver-side rescoring with the frozen weights") {
    import spark.implicits._
    val got = ops.Round12.q213ModelScoring(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val want = Tables.documents(spark, sf)
      .select($"source", $"lang", $"n_chars", $"text").collect()
      .map { r =>
        val w = r.getString(3).split(" ").filter(_.nonEmpty)
        val div = w.distinct.length.toLong * 1000000L / w.length
        val logit = 2L * div + 3000L * w.length - 500L * r.getLong(2) -
          950000L
        (r.getString(0), logit > 0, r.getString(1) == "en")
      }
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> (rows.length.toLong,
          rows.count(_._2).toLong,
          rows.count(x => x._2 && x._3).toLong,
          rows.count(x => x._2 && !x._3).toLong,
          rows.count(x => !x._2 && x._3).toLong,
          rows.count(x => !x._2 && !x._3).toLong)
      }
    assert(got == want)
    // non-degenerate on the fixture: the frozen model must actually
    // split the corpus, or the confusion table tests nothing
    val (accepted, total) =
      (got.values.map(_._2).sum, got.values.map(_._1).sum)
    assert(accepted > 0 && accepted < total,
      s"degenerate model: $accepted/$total accepted")
  }

  test("q213: plan is scan-score-count — no window, no join, shuffles only at aggregate size") {
    val df = ops.Round12.q213ModelScoring(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val windows = plan.toString
    assert(!windows.contains("WindowExec"), "scoring must not window")
    assert(!windows.toLowerCase.contains("join"),
      "a frozen-literal model needs no join")
    // one hash exchange for the |sources| aggregate + one range
    // exchange for the 20-row orderBy — nothing corpus-wide
    assert(shuffles(plan).size <= 2,
      s"expected <=2 aggregate-sized shuffles, got:\n$plan")
  }
}
