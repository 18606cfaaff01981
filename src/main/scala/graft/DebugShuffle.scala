package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-probe: per-round cost of the q79 label-propagation loop. */
object DebugShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[x] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val pairs = ops.Dedup.q41MinhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b").cache()
    t("pairs materialize")(println("pairs=" + pairs.count()))
    val edges = pairs
      .unionByName(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .cache()
    t("edges")(println("edges=" + edges.count()))

    var labels = edges.select($"doc_a".as("v")).distinct()
      .withColumn("label", $"v").cache()
    t("labels0")(labels.count())
    var converged = false
    var rounds = 0
    while (!converged && rounds < 12) {
      val nmin = edges.join(labels, edges("doc_b") === labels("v"))
        .groupBy(edges("doc_a").as("nv")).agg(min($"label").as("nmin"))
      val step1 = labels.select($"v", $"label".as("old"))
        .join(nmin, $"v" === $"nv", "left")
        .select($"v", $"old",
          least($"old", coalesce($"nmin", $"old")).as("l1"))
      val next = step1.as("a")
        .join(step1.select($"v".as("pv"), $"l1".as("pl")).as("b"),
          $"l1" === $"pv", "left")
        .select($"v", $"old",
          least($"l1", coalesce($"pl", $"l1")).as("label"))
      val mat = t(s"round $rounds ckpt")(next.localCheckpoint(true))
      val changed = t(s"round $rounds count")(mat.filter($"old" =!= $"label").count())
      println(s"  changed=$changed")
      labels = mat.select($"v", $"label")
      converged = changed == 0
      rounds += 1
    }
    spark.stop()
  }
}
