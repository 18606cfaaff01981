package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array

/** Throwaway phase-timing probe for the ML pipeline hotspot. */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val data = Tables.events(spark, sfDir)
      .select(
        month($"ts").cast("double").as("f_month"),
        dayofweek($"ts").cast("double").as("f_dow"),
        $"value".as("f_value"),
        coalesce(get_json_object($"props", "$.k").cast("double"), lit(0.0)).as("f_k"),
        hour($"ts").cast("double").as("hour_label"),
        when(hour($"ts").between(8, 18), 1.0).otherwise(0.0).as("peak_label"))
      .na.drop()
    val assembled = new VectorAssembler()
      .setInputCols(Array("f_month", "f_dow", "f_value", "f_k"))
      .setOutputCol("features").transform(data)
    val Array(train, test) = assembled.randomSplit(Array(0.8, 0.2), seed = 1)
    t("materialize train")(train.cache().count())

    val rfHour = new RandomForestClassifier()
      .setLabelCol("hour_label").setFeaturesCol("features")
      .setNumTrees(10).setMaxDepth(4).setSeed(1)
    val mHour = t("fit hour")(rfHour.fit(train))
    val predHour = t("transform+cache hour")(mHour.transform(test).cache())
    t("count hour")(predHour.count())
    t("acc")(new MulticlassClassificationEvaluator()
      .setLabelCol("hour_label").setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(predHour))
    t("f1")(new MulticlassClassificationEvaluator()
      .setLabelCol("hour_label").setPredictionCol("prediction")
      .setMetricName("f1").evaluate(predHour))
    t("cyclic x2") {
      val d = abs($"hour_label" - $"prediction")
      predHour.filter(least(d, lit(24) - d) <= 1).count()
      predHour.filter(least(d, lit(24) - d) <= 2).count()
    }
    t("avgprob")(predHour
      .select(element_at(vector_to_array($"probability"),
        ($"hour_label" + 1).cast("int")).as("p"))
      .agg(avg($"p")).head().getDouble(0))
    val rfPeak = new RandomForestClassifier()
      .setLabelCol("peak_label").setFeaturesCol("features")
      .setNumTrees(10).setMaxDepth(4).setSeed(1)
    val mPeak = t("fit peak")(rfPeak.fit(train))
    val predPeak = t("transform peak")(mPeak.transform(test).cache())
    t("auc")(new BinaryClassificationEvaluator()
      .setLabelCol("peak_label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(predPeak))
    t("peakacc")(predPeak.filter($"peak_label" === $"prediction").count())
    spark.stop()
  }
}
