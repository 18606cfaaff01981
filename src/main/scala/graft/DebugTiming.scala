package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Throwaway phase-timing probe (currently: the q41 minhash hotspot),
  * with a stage listener reporting where wall-clock actually goes. */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp = sys.env.getOrElse("SPARK_GRAFT_SP", cpus)
    val pf = sys.env.getOrElse("SPARK_GRAFT_PF", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        println(f"[stage ${si.stageId}%3d] ${dur}%5d ms  tasks=${si.numTasks}%3d " +
          f"exec=${m.executorRunTime}%6d cpu=${m.executorCpuTime / 1000000}%6d " +
          f"gc=${m.jvmGCTime}%5d deser=${m.executorDeserializeTime}%5d " +
          f"  ${si.name}%s")
      }
    })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def tokens(text: org.apache.spark.sql.Column) =
      filter(split(text, "\\s+"), t => length(t) > 0)

    t("warm io")(Tables.documents(spark, sfDir).count())

    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= 3)
    val shingles = toks.select($"doc_id",
      explode(transform(sequence(lit(0), size($"t") - 3), i =>
        concat_ws(" ", element_at($"t", i + 1), element_at($"t", i + 2),
          element_at($"t", i + 3)))).as("s"))
      .distinct()
      .cache()
    t("shingles materialize")(shingles.count())

    val minCols = (0 until 8).map { j =>
      val salted = md5(concat(lit(s"${j / 4}:"), $"s"))
      min(conv(substring(salted, 1 + 8 * (j % 4), 8), 16, 10).cast("long"))
        .as(s"h$j")
    }
    val sig = shingles.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
    val bands = sig.select($"doc_id", explode(array(
      (0 until 4).map(b =>
        md5(concat_ws("_", lit(b), col(s"h${2 * b}"), col(s"h${2 * b + 1}")))): _*
    )).as("band"))
    val cand = bands.as("ba").join(bands.as("bb"),
        col("ba.band") === col("bb.band") && col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("doc_a"), col("bb.doc_id").as("doc_b"))
      .distinct()
    val sizes = shingles.groupBy($"doc_id").agg(count(lit(1)).as("nsh"))
    val inter = cand
      .join(shingles.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(shingles.as("sb"),
        $"doc_b" === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.as("za"), $"doc_a" === col("za.doc_id"))
      .join(sizes.as("zb"), $"doc_b" === col("zb.doc_id"))
      .withColumn("jaccard",
        $"inter".cast("double") / (col("za.nsh") + col("zb.nsh") - $"inter"))
      .filter($"jaccard" >= 0.5)
    t("final one-action")(out.count())
    println("=== decomposed ===")
    t("cand")(println(cand.count()))
    println("=== executed plan with metrics ===")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
      println("  " * depth + p.nodeName + "  [" + ms + "]")
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec => ()
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(cand.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
