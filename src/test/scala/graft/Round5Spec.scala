package graft

import org.apache.spark.sql.functions._

/** Round-5 specs: Spark's OWN runtime bloom filter firing on the q84 join
  * shape (the engine-native form beside q84's manual bloom probe), the
  * image-source fixture semantics (q93), the DSv2 write path lifecycle
  * (q94), and one ML case at the reference's actual capacity
  * (numTrees=100, `/root/reference/Assignment-python.py:941`).
  */
class Round5Spec extends SparkSpec {

  /** Temporarily set session confs, restoring the previous values (the
    * suite-shared session outlives this spec). */
  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("Spark's own runtime filter injects a bloom probe for the q84 join shape") {
    import spark.implicits._
    // q84 demonstrates the MANUAL bloom semi-join reduction; this spec
    // proves the engine-native form: with runtime filters on (and the
    // size thresholds scaled to test data), InjectRuntimeFilter rewrites
    // the very same dimension-filtered shuffle join so the fact side is
    // probed by a BloomFilterMightContain BEFORE its exchange.
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test tables are KB-sized; drop the 10GB application-side floor
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // the optimizer only injects for shuffle joins — force one
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val dim = Tables.customer(spark, sf)
        .filter($"c_mktsegment" === "BUILDING" && $"c_nationkey" < 10)
        .select($"c_custkey")
      val joined = Tables.orders(spark, sf)
        .join(dim, $"o_custkey" === $"c_custkey", "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan
      val hasBloomProbe = optimized.exists(_.expressions.exists(_.exists(
        _.getClass.getSimpleName == "BloomFilterMightContain")))
      assert(hasBloomProbe,
        s"expected BloomFilterMightContain in:\n$optimized")
      // and the rewrite must not change the answer
      val expected = Tables.orders(spark, sf)
        .join(dim, $"o_custkey" === $"c_custkey", "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.orderBy($"o_orderpriority").collect().toSeq ==
        expected.orderBy($"o_orderpriority").collect().toSeq)
    }
  }

  test("q93: image source decodes the PNG fixtures and drops the corrupt file") {
    import spark.implicits._
    val out = ops.Round5.q93ImageSource(spark, sf)
    val docIds = out.select($"doc_id").distinct().as[Long].collect().sorted
    // 16 valid PNGs; doc_999.png (not a PNG) must have been dropped by
    // dropInvalid rather than surfacing as a null-data row
    assert(docIds.toSeq == (0L until 16L))
    // every doc contributes exactly its 4 pixels
    val perDoc = out.groupBy($"doc_id").agg(sum($"n").as("pixels"))
      .select($"pixels").as[Long].collect()
    assert(perDoc.forall(_ == 4L))
    // metadata came from the real decoder: 4x1, 4-channel, CV_8UC4
    val meta = out.select($"width", $"height", $"channels", $"mode").distinct()
      .collect()
    assert(meta.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq == Seq((4, 1, 4, 24)))
  }

  test("q94: DSv2 write commits atomically and re-runs are idempotent") {
    val a = ops.Round5.q94Dsv2Write(spark, sf).collect().toSeq
    val b = ops.Round5.q94Dsv2Write(spark, sf).collect().toSeq // overwrite again
    assert(a == b && a.nonEmpty)
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_dsv2sink_r5000m3")
    assert(new java.io.File(root, "_SUCCESS").isFile)
    // staging is cleaned after the driver-side commit
    assert(!new java.io.File(root, "_staging").exists)
    val parts = root.listFiles.map(_.getName).filter(_.matches("part-\\d+\\.tsv"))
    assert(parts.nonEmpty)
  }

  test("ml: reference-capacity RF (numTrees=100, full split) is seeded-deterministic" +
      " and no worse than the downscaled case") {
    import org.apache.spark.ml.classification.RandomForestClassifier
    import org.apache.spark.ml.feature.VectorAssembler
    import spark.implicits._
    // input3/month at the reference's actual capacity
    // (Assignment-python.py:941: numTrees=100, default depth) over the
    // FULL train split — the bench path (q60) deliberately downsizes to
    // 10 trees/depth 4/25% sample; this spec closes the fidelity gap.
    val data = Tables.events(spark, sf)
      .select(
        $"value".as("f_value"),
        coalesce(get_json_object($"props", "$.k").cast("double"), lit(0.0))
          .as("f_k"),
        floor($"value" / 10.0).cast("double").as("f_vbucket"),
        pmod(floor($"value" * 7), lit(5)).cast("double").as("f_vk"),
        month($"ts").cast("double").as("month_label"))
      .na.drop()
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), seed = 1)
    train.cache().count(); test.cache().count()
    val asm = new VectorAssembler()
      .setInputCols(Array("f_value", "f_k", "f_vbucket", "f_vk"))
      .setOutputCol("features")
    def accuracyAt(numTrees: Int, maxDepth: Int, frac: Double): Double = {
      val t = if (frac >= 1.0) train
              else train.sample(withReplacement = false, frac, seed = 1)
      val rf = new RandomForestClassifier()
        .setLabelCol("month_label").setFeaturesCol("features")
        .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(1)
      rf.fit(asm.transform(t)).transform(asm.transform(test))
        .agg(avg(when($"month_label" === $"prediction", 1.0).otherwise(0.0)))
        .head().getDouble(0)
    }
    val full1 = accuracyAt(100, 5, 1.0)
    val full2 = accuracyAt(100, 5, 1.0)
    assert(full1 == full2, "seeded full-capacity fit must be deterministic")
    val down = accuracyAt(10, 4, 0.25)
    assert(full1 >= down,
      s"full-capacity accuracy $full1 < downscaled $down")
    train.unpersist(); test.unpersist()
  }
}
