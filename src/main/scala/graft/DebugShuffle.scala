package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-probe: repeated same-query runs to split one-time
  * (plan+codegen) cost from steady-state execution. */
object DebugShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.buffer.pageSize", sys.env.getOrElse("SPARK_GRAFT_PAGE", "2m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[x] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables.documents(spark, sfDir).count()
    for (q <- Seq("q41_minhash_lsh", "q43_ngram_jaccard", "q42_simhash")) {
      val fn = SparkEntry.queries(q)
      t(s"$q run1")(fn(spark, sfDir).count())
      spark.catalog.clearCache()
      t(s"$q run2")(fn(spark, sfDir).count())
      spark.catalog.clearCache()
      t(s"$q run3")(fn(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
