package graft.ml

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Spark-ML surface (SURVEY.md §2.13, reference Advanced Task 4
  * `/root/reference/Assignment-python.py:845-1037`): VectorAssembler →
  * seeded randomSplit → RandomForestClassifier → standard + custom
  * evaluators, including the reference's cyclic ±k accuracy
  * (`:962-977`, generalized to `least(|d|, period-|d|) <= k`) and
  * mean-probability-of-correct-class (`:980-985`, via native
  * vector_to_array instead of the reference's Python UDF).
  *
  * The reference trains an 8-case matrix — four feature sets × labels
  * month/hour/weekday/peak (`:1015-1022`) — from ONE parameterized
  * function (`trainMLModel(input, time)`, `:931`). Mirrored here: a
  * `Seq[TrainCase]` drives a single fit/evaluate function; every feature
  * set is assembled as its own vector column on one DataFrame so the
  * train/test split and its cache are shared by all eight fits (the
  * reference re-assembles and re-splits per case — at scale that's seven
  * redundant passes over the corpus).
  *
  * Excluded from the DuckDB oracle per the driver contract (ML is not
  * SQL-expressible); determinism is pinned with seed=1 exactly as the
  * reference does (`:937`), and asserted by the test suite instead.
  */
object Pipelines {

  /** One training case of the matrix: which assembled feature column,
    * which label, the label's cyclic period (12/24/7), binary or not. */
  final case class TrainCase(input: String, label: String, period: Int,
    binary: Boolean)

  /** The reference's matrix (`:1015-1022`): input1..input3 × month/hour,
    * input3 × weekday, input4 × the binary peak flag. */
  val cases: Seq[TrainCase] = Seq(
    TrainCase("input1", "month_label", 12, binary = false),
    TrainCase("input1", "hour_label", 24, binary = false),
    TrainCase("input2", "month_label", 12, binary = false),
    TrainCase("input2", "hour_label", 24, binary = false),
    TrainCase("input3", "month_label", 12, binary = false),
    TrainCase("input3", "hour_label", 24, binary = false),
    TrainCase("input3", "weekday_label", 7, binary = false),
    TrainCase("input4", "peak_label", 2, binary = true),
  )

  /** Feature sets: non-label-derived columns only (value, the JSON prop,
    * and two derived sensors), mirroring the reference's weather / power /
    * combined / peak-input splits (`:921-925`). */
  val featureSets: Map[String, Array[String]] = Map(
    "input1" -> Array("f_value", "f_k"),
    "input2" -> Array("f_vbucket", "f_vk"),
    "input3" -> Array("f_value", "f_k", "f_vbucket", "f_vk"),
    "input4" -> Array("f_value", "f_k", "f_vk"),
  )

  /** The matrix's shared input: four features + four labels per event,
    * mirroring the reference's feature/label prep
    * (`Assignment-python.py:913-918`: month/hour/weekday extraction and
    * the 8-18 peak-hour flag). Factored out of [[q60MlMetrics]] so the
    * derivation itself is ORACLE-CHECKED (q215 aggregates exactly this
    * frame against DuckDB) — only the RF fits stay oracle-exempt. */
  private[graft] def labeledFeatures(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(
        $"value".as("f_value"),
        coalesce(get_json_object($"props", "$.k").cast("double"), lit(0.0))
          .as("f_k"),
        floor($"value" / 10.0).cast("double").as("f_vbucket"),
        pmod(floor($"value" * 7), lit(5)).cast("double").as("f_vk"),
        month($"ts").cast("double").as("month_label"),
        hour($"ts").cast("double").as("hour_label"),
        (dayofweek($"ts") - 1).cast("double").as("weekday_label"),
        when(hour($"ts").between(8, 18), 1.0).otherwise(0.0).as("peak_label"))
      .na.drop()
  }

  /** Wide results table, one row per trained case, sorted by accuracy like
    * the reference's `sort(desc("Correct"))` (`:1036`). */
  val q60MlMetrics: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val data = labeledFeatures(spark, dir)

    // ONE shared split+cache of the plain double columns (cheap columnar
    // cache); each case assembles its own feature vector on the fly — a
    // streaming projection, so no per-case pass over the corpus and no
    // vector-UDT blocks in the cache. The reference re-assembles AND
    // re-splits per case (`:935-940`) — seven redundant corpus scans.
    val Array(trainFull, test) = data.randomSplit(Array(0.8, 0.2), seed = 1)
    // Seeded training-set sample: the reference's own advice for the full
    // corpus ("only use a portion of the full 13-month dataset",
    // `Assignment-python.py:902`); fit cost is linear in rows, and eight
    // fits over the full split would dominate the whole bench. Evaluation
    // still runs on the COMPLETE held-out test split.
    val train = trainFull.sample(withReplacement = false, 0.25, seed = 1)
    // materialize both caches up front: the concurrent fits below would
    // otherwise each recompute the uncached lineage on first touch
    train.cache().count(); test.cache().count()

    def fitCase(c: TrainCase): (String, String, Double, Double, Double, Double, Double) = {
      val asm = new VectorAssembler()
        .setInputCols(featureSets(c.input)).setOutputCol("features")
      val rf = new RandomForestClassifier()
        .setLabelCol(c.label).setFeaturesCol("features")
        .setNumTrees(10).setMaxDepth(4).setSeed(1)
      val pred = rf.fit(asm.transform(train)).transform(asm.transform(test))
      // accuracy, cyclic ±1/±2, and mean P(correct) are all row-wise
      // indicators — one aggregation pass computes all four.
      val d = abs(col(c.label) - $"prediction")
      val cyc = least(d, lit(c.period) - d)
      val m = pred.agg(
        avg(when(col(c.label) === $"prediction", 1.0).otherwise(0.0)),
        avg(when(cyc <= 1, 1.0).otherwise(0.0)),
        avg(when(cyc <= 2, 1.0).otherwise(0.0)),
        avg(element_at(vector_to_array($"probability"),
          (col(c.label) + 1).cast("int")))).head()
      // AUC only exists for the binary case (reference returns "N/A"
      // otherwise, `:988-990`; NaN keeps the column numeric here).
      val auc =
        if (c.binary)
          new BinaryClassificationEvaluator()
            .setLabelCol(c.label).setRawPredictionCol("rawPrediction")
            .setMetricName("areaUnderROC").evaluate(pred)
        else Double.NaN
      (c.input, c.label, m.getDouble(0), m.getDouble(1), m.getDouble(2),
        auc, m.getDouble(3))
    }

    // The eight cases are independent (shared cached inputs, separate
    // models): submit them as concurrent Spark job groups so the fits
    // overlap instead of serializing — the standard parameter-sweep shape
    // on a real cluster. Results are collected in case order, and every
    // fit is seeded, so the output stays deterministic. All 8 fits fly
    // at once (r19-verdict item 3, guide §2.6): each fit's jobs are
    // short, driver-bound stages over the tiny cached splits, so a
    // 4-deep pool left half the independent work serialized behind the
    // other half's stage tails.
    val poolSize = sys.env.getOrElse("SPARK_GRAFT_ML_POOL", "8").toInt
    val rows =
      if (poolSize <= 1) cases.map(fitCase)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          val futs = cases.map(c => scala.concurrent.Future(fitCase(c)))
          futs.map(f => scala.concurrent.Await.result(
            f, scala.concurrent.duration.Duration.Inf))
        } finally pool.shutdown()
      }
    train.unpersist(); test.unpersist()
    rows.toDF("input", "label", "accuracy", "within_one", "within_two",
        "auc_roc", "avg_correct_prob")
      .withColumn("classifier", lit("random_forest"))
      .select($"classifier", $"input", $"label", $"accuracy", $"within_one",
        $"within_two", $"auc_roc", $"avg_correct_prob")
      .coalesce(1)
      .orderBy($"accuracy".desc, $"input", $"label")
  }

  /** The q60 matrix's feature/label derivation as its own oracle-checked
    * query (verdict r12 item 4): everything SQL-expressible about the ML
    * surface — JSON feature extraction, derived sensors, month/hour/
    * weekday/peak labels, the na.drop — is hash-verified against DuckDB,
    * leaving only the RF fit itself exempt. Aggregated per
    * (month, weekday) cell so the output is calendar-sized (≤ 84 rows)
    * at any corpus scale; doubles are floor-quantized to integer
    * micro-units before summing (the q59 rule: integer sums are
    * accumulation-order-independent, double sums are not). */
  val q215FeatureLabelPrep: (SparkSession, String) => DataFrame =
    (spark, dir) => {
      import spark.implicits._
      labeledFeatures(spark, dir)
        .groupBy($"month_label".cast("long").as("month_label"),
          $"weekday_label".cast("long").as("weekday_label"))
        .agg(
          count(lit(1)).as("n"),
          sum($"peak_label".cast("long")).as("n_peak"),
          sum($"hour_label".cast("long")).as("hour_sum"),
          sum(floor($"f_value" * 1e6).cast("long")).as("f_value_q"),
          sum(floor($"f_k" * 1e6).cast("long")).as("f_k_q"),
          sum($"f_vbucket".cast("long")).as("f_vbucket_sum"),
          sum($"f_vk".cast("long")).as("f_vk_sum"))
        .orderBy($"month_label", $"weekday_label")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_ml_metrics" -> q60MlMetrics,
    "q215_feature_label_prep" -> q215FeatureLabelPrep,
  )

  /** q60 itself stays oracle-exempt by the driver contract (ML is not
    * SQL-expressible); q215 pins its entire input derivation. DuckDB's
    * `dayofweek` is already Sunday=0, matching Spark's `dayofweek - 1`. */
  val oracle: Map[String, String] = Map(
    "q215_feature_label_prep" ->
      """WITH f AS (
        |  SELECT
        |    value AS f_value,
        |    COALESCE(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0)
        |      AS f_k,
        |    CAST(floor(value / 10.0) AS BIGINT) AS f_vbucket,
        |    ((CAST(floor(value * 7) AS BIGINT) % 5) + 5) % 5 AS f_vk,
        |    month(ts) AS month_label,
        |    hour(ts) AS hour_label,
        |    dayofweek(ts) AS weekday_label,
        |    CASE WHEN hour(ts) BETWEEN 8 AND 18 THEN 1 ELSE 0 END
        |      AS peak_label
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |)
        |SELECT CAST(month_label AS BIGINT) AS month_label,
        |  CAST(weekday_label AS BIGINT) AS weekday_label,
        |  COUNT(*) AS n,
        |  CAST(SUM(peak_label) AS BIGINT) AS n_peak,
        |  CAST(SUM(hour_label) AS BIGINT) AS hour_sum,
        |  CAST(SUM(CAST(floor(f_value * 1e6) AS BIGINT)) AS BIGINT)
        |    AS f_value_q,
        |  CAST(SUM(CAST(floor(f_k * 1e6) AS BIGINT)) AS BIGINT) AS f_k_q,
        |  CAST(SUM(f_vbucket) AS BIGINT) AS f_vbucket_sum,
        |  CAST(SUM(f_vk) AS BIGINT) AS f_vk_sum
        |FROM f GROUP BY 1, 2 ORDER BY month_label, weekday_label""".stripMargin,
  )
}
