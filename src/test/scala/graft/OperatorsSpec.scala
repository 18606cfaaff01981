package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit fixtures per SURVEY.md §5 item 2: tiny in-memory frames that
  * reproduce each reference operator shape, independent of the test
  * parquet. */
class OperatorsSpec extends SparkSpec {

  test("conditional aggregation + left join + fill keeps 0-0 groups (A3/J1/N1)") {
    import spark.implicits._
    // matches: (matchId, eventTeam-goals); match 3 has no goal events at all
    val allMatches = Seq((1, "a", "b"), (2, "a", "c"), (3, "b", "c"))
      .toDF("matchId", "home", "away")
    val goalEvents = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c"))
      .toDF("matchId", "scorer")
    val counts = goalEvents.join(allMatches, Seq("matchId"))
      .groupBy($"matchId")
      .agg(
        sum(when($"scorer" === $"home", 1).otherwise(0)).as("homeGoals"),
        sum(when($"scorer" === $"away", 1).otherwise(0)).as("awayGoals"))
    val result = allMatches.join(counts, Seq("matchId"), "left")
      .na.fill(Map("homeGoals" -> 0, "awayGoals" -> 0))
      .orderBy($"matchId")
      .select($"matchId", $"homeGoals", $"awayGoals")
      .collect()
    assert(result.toSeq == Seq(Row(1, 2L, 1L), Row(2, 0L, 1L), Row(3, 0L, 0L)))
  }

  test("custom AsOfJoinExec: picks latest right row at-or-before, null before any") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 8L, 100L), (1L, 15L, 110L), (1L, 20L, 120L),
      (2L, 7L, 200L)).toDF("key", "qt", "px")
    val out = graft.plans.AsOf.join(trades, quotes, "key", "t", "qt",
        Seq("px" -> "last_px"))
      .orderBy($"key", $"t")
      .select($"trade", $"last_px")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // t1@10: quote@8=100; t2@20: quote@20=120 (inclusive); t3@5: none before 7
    assert(out.toSeq == Seq(("t1", 100L), ("t2", 120L), ("t3", -1L)))
    val plan = graft.plans.AsOf.join(trades, quotes, "key", "t", "qt",
      Seq("px" -> "last_px")).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
  }

  test("custom as-of join matches a brute-force model on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val trades = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val quotes = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, 1000L + i))
      .distinct.groupBy(q => (q._1, q._2)).map(_._2.head).toSeq // unique (key,time)
    val out = graft.plans.AsOf.join(
        trades.toDF("key", "t", "tid"), quotes.toDF("key", "qt", "qid"),
        "key", "t", "qt", Seq("qt" -> "last_qt"))
      .select($"tid", $"last_qt")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    trades.foreach { case (k, t, tid) =>
      val expected = quotes.filter(q => q._1 == k && q._2 <= t)
        .map(_._2).sorted.lastOption
      assert(out(tid) == expected, s"trade $tid key=$k t=$t")
    }
  }

  test("as-of join: null keys/times never match as zero") {
    import spark.implicits._
    // key 0 / time 0 rows exist on BOTH sides: a null unboxed to 0L would
    // silently join against them.
    val trades = Seq(
      (Some(0L), Some(0L), "zero"),       // legit key-0/time-0 row
      (None: Option[Long], Some(5L), "nullkey"),
      (Some(1L), None: Option[Long], "nulltime"),
      (Some(1L), Some(9L), "normal"))
      .toDF("key", "t", "trade")
    val quotes = Seq(
      (Some(0L), Some(0L), Some(700L)),   // matches only the legit zero row
      (None: Option[Long], Some(1L), Some(666L)), // must be skipped
      (Some(1L), None: Option[Long], Some(667L)), // must be skipped
      (Some(1L), Some(7L), Some(42L)))
      .toDF("key", "qt", "px")
    val out = graft.plans.AsOf.join(trades, quotes, "key", "t", "qt",
        Seq("px" -> "last_px"))
      .select($"trade", $"last_px").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out("zero") == Some(700L))   // real 0-key match still works
    assert(out("nullkey") == None)      // null left key -> null, not key-0
    assert(out("nulltime") == None)     // null left time -> null
    assert(out("normal") == Some(42L))  // null right rows skipped, not 667
  }

  test("dot_long is SQL-callable after runtime registration") {
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "dot_long",
      exprs => graft.functions.DotProductLong(exprs.head, exprs(1)))
    val d = spark.sql(
      "SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(d == 32L)
  }

  test("nfc_normalize is SQL-callable after runtime registration") {
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "nfc_normalize",
      exprs => graft.functions.NfcNormalize(exprs.head))
    val n = spark.sql("SELECT nfc_normalize('áb') AS n")
      .head().getString(0)
    assert(n == "\u00e1b", "decomposed input composes through the SQL face")
  }

  test("as-of strategy registers once on the live session (AsOf.join path)") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("key", "t")
    val r = Seq((1L, 1L, 1L)).toDF("key", "qt", "v")
    graft.plans.AsOf.join(l, r, "key", "t", "qt", Seq("v" -> "lv")).count()
    graft.plans.AsOf.join(l, r, "key", "t", "qt", Seq("v" -> "lv")).count()
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    assert(cs.experimental.extraStrategies
      .count(_ == graft.plans.AsOfJoinStrategy) == 1)
  }

  test("frame sampler: height frames of width*channels bytes, stride-2 resize (q67)") {
    val r = multimodal.Multimodal.MediaRow(
      1L, "s", Array.tabulate(16)(i => (i + 1).toByte), 4, 2, 2)
    val fs = multimodal.Multimodal.FakeFrameSampler.sample(r).toList
    assert(fs.map(_.frame_idx) == List(0, 1))
    assert(fs.map(_.frame_sum) == List((1 to 8).sum.toLong, (9 to 16).sum.toLong))
    assert(fs.map(_.resized_sum) == List(1L + 3 + 5 + 7, 9L + 11 + 13 + 15))
  }

  test("signed goal-difference formatting %+d (X3/X4)") {
    import spark.implicits._
    val out = Seq(3, 0, -2).toDF("gd")
      .select(format_string("%+d", $"gd").as("s")).as[String].collect()
    assert(out.toSeq == Seq("+3", "+0", "-2"))
  }

  test("window rank with composite tiebreaks is a permutation (W1)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 10, 5), ("b", 10, 7), ("c", 8, 9)).toDF("t", "pts", "gf")
    val pos = df.withColumn("pos",
      row_number().over(Window.orderBy($"pts".desc, $"gf".desc, $"t")))
      .select($"t", $"pos").as[(String, Int)].collect().toMap
    assert(pos == Map("b" -> 1, "a" -> 2, "c" -> 3))
  }

  test("as-of join carries last non-null reference forward (J4)") {
    val df = ops.Temporal.q17AsofJoin(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every purchase with a preceding click must have click_sec <= ts_sec
    assert(rows.forall { r =>
      r.isNullAt(3) || r.getLong(3) <= r.getLong(2)
    })
  }

  test("sessionize: session counts bounded by event counts (q18)") {
    val rows = ops.Temporal.q18Sessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2))) // n_sessions <= n_events
    assert(rows.forall(r => r.getLong(4) >= 0))            // total_active_sec
  }

  test("pixel color naming: alpha<128 => None, quantization lattice (U2)") {
    import spark.implicits._
    // BGRA hex pixels: alpha 0x10 < 128 -> None; 0x00/0xff/0xff with alpha
    // 0xff -> quantized (0,255,255) = B=0,G=255,R=255 -> r=255,g=255,b=0 = Yellow
    val df = Seq("00ffff10", "00ffffff", "54a9ffff").toDF("text")
    val colors = ops.UdfSurface.queries("q25_pixel_colors")
    // exercise colorName through a 1-pixel corpus: build inline
    val named = df.select(expr(
      """CASE WHEN conv(substring(text, 7, 2), 16, 10) < 128 THEN 'None' END"""
    ).as("probe")).collect()
    assert(named.head.getString(0) == "None")
    val full = colors(spark, sf).collect()
    assert(full.map(_.getLong(1)).sum == 4L * Tables.documents(spark, sf).count())
  }

  test("cyclic distance evaluator is symmetric and bounded (M8/M9)") {
    import spark.implicits._
    val df = (0 until 24).flatMap(a => (0 until 24).map(b => (a, b)))
      .toDF("a", "b")
      .withColumn("d", least(abs($"a" - $"b"), lit(24) - abs($"a" - $"b")))
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 12))
    val m = rows.map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    assert(m.forall { case ((a, b), d) => m((b, a)) == d })
    assert(m((23, 0)) == 1 && m((12, 0)) == 12)
  }

  test("quantized cosine: self-similarity is exactly 1.0 (q50 machinery)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).limit(5)
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1000).cast("long"))
          .as("e"))
    val dot = (a: String, b: String) => aggregate(
      zip_with(col(a), col(b), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val cos = emb.select(
      (dot("e", "e").cast("double") /
        (sqrt(dot("e", "e").cast("double")) * sqrt(dot("e", "e").cast("double"))))
        .as("c")).as[Double].collect()
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("simhash is 16-bit and deterministic across runs (q42)") {
    val a = ops.Dedup.queries("q42_simhash")(spark, sf).collect()
    val b = ops.Dedup.queries("q42_simhash")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall { r => val s = r.getLong(1); s >= 0 && s < (1L << 16) })
  }

  test("exact dedup finds exactly the injected duplicates (q40)") {
    val r = ops.Dedup.queries("q40_dedup_exact")(spark, sf).head()
    val nDocs = r.getLong(0); val nUnique = r.getLong(1); val nGroups = r.getLong(2)
    val base = Tables.documents(spark, sf).count()
    assert(nDocs == base + (base + 6) / 7)  // every 7th doc duplicated
    assert(nUnique == base)                  // no natural dups in corpus
    assert(nGroups == (base + 6) / 7)
  }

  test("multimodal decode stub: bytes sum matches hex arithmetic (q61)") {
    import spark.implicits._
    val agg = multimodal.Multimodal.queries("q61_multimodal_features")(spark, sf)
    val viaBinary = agg.agg(sum($"total_byte_sum")).head().getLong(0)
    val viaHex = Tables.documents(spark, sf)
      .select(aggregate(
        transform(sequence(lit(0), lit(15)),
          i => conv(md5($"text").substr(i * 2 + 1, lit(2)), 16, 10).cast("long")),
        lit(0L), (a, b) => a + b).as("s"))
      .agg(sum($"s")).head().getLong(0)
    assert(viaBinary == viaHex)
  }

  test("ml metrics: 8-case matrix, deterministic under seed=1 (M1-M11)") {
    def run() = ml.Pipelines.q60MlMetrics(spark, sf).collect().map { r =>
      (r.getString(1), r.getString(2)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7))
    }.toMap
    // NaN-safe map equality (auc is NaN for non-binary cases)
    def bits(m: Map[(String, String), (Double, Double, Double, Double, Double)]) =
      m.view.mapValues { case (a, b, c, d, e) =>
        Seq(a, b, c, d, e).map(java.lang.Double.doubleToLongBits)
      }.toMap
    val m = run()
    // the reference's full matrix: input1-3 x month/hour, input3 x weekday,
    // input4 x peak (Assignment-python.py:1015-1022)
    assert(m.keySet.size == 8)
    assert(ml.Pipelines.cases.forall(c => m.contains((c.input, c.label))))
    m.foreach { case ((_, label), (acc, w1, w2, auc, p)) =>
      assert(acc >= 0.0 && acc <= 1.0)
      assert(w1 >= acc && w2 >= w1) // cyclic-within widens monotonically
      assert(p >= 0.0 && p <= 1.0)
      if (label == "peak_label") assert(auc >= 0.0 && auc <= 1.0)
      else assert(auc.isNaN) // reference emits "N/A" for non-binary
    }
    assert(bits(m) == bits(run())) // seed=1 end-to-end determinism
  }

  test("label propagation resolves a chain and a clique into single clusters") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4: exercises pointer doubling) + clique
    // {10,11,12} + isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val edges = pairs.unionByName(
      pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
    var labels = edges.select($"doc_a".as("v")).distinct()
      .withColumn("label", $"v").cache()
    var converged = false; var rounds = 0
    while (!converged && rounds < 12) {
      val nmin = edges.join(labels, edges("doc_b") === labels("v"))
        .groupBy(edges("doc_a").as("nv")).agg(min($"label").as("nmin"))
      val step1 = labels.select($"v", $"label".as("old"))
        .join(nmin, $"v" === $"nv", "left")
        .select($"v", $"old", least($"old", coalesce($"nmin", $"old")).as("l1"))
      val next = step1.as("a")
        .join(step1.select($"v".as("pv"), $"l1".as("pl")).as("b"),
          $"l1" === $"pv", "left")
        .select($"v", $"old", least($"l1", coalesce($"pl", $"l1")).as("label"))
      val mat = next.localCheckpoint(true)
      converged = mat.filter($"old" =!= $"label").count() == 0
      labels = mat.select($"v", $"label")
      rounds += 1
    }
    val comp = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    assert(rounds <= 4) // log-diameter convergence, not diameter
  }

  test("fused CosineSimLong is bit-identical to the composed three-dot form") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1000).cast("long")).as("e"))
    val pairs = emb.as("a").join(emb.as("b"),
      col("a.vec_id") % 7 === col("b.vec_id") % 7 && col("a.vec_id") < col("b.vec_id"))
    def d(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExprs.dotLong(a, b)
    val composed = d(col("a.e"), col("b.e")).cast("double") /
      (sqrt(d(col("a.e"), col("a.e")).cast("double")) *
        sqrt(d(col("b.e"), col("b.e")).cast("double")))
    val fused = graft.functions.VectorExprs.cosineLong(col("a.e"), col("b.e"))
    // compare raw IEEE bits, not values — the parity claim is bit-level
    val rows = pairs.select(composed.as("c"), fused.as("f")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("CosineFusionRule rewrites the composed three-dot form to cosine_long") {
    import spark.implicits._
    org.apache.spark.sql.GraftBridge.addOptimization(spark,
      graft.functions.CosineFusionRule)
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1000).cast("long")).as("e"))
      .limit(20)
    def d(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExprs.dotLong(a, b)
    val q = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        (d(col("x.e"), col("y.e")).cast("double") /
          (sqrt(d(col("x.e"), col("x.e")).cast("double")) *
            sqrt(d(col("y.e"), col("y.e")).cast("double")))).as("c"))
    // the optimizer replaced the composed pattern with the fused expression
    assert(q.queryExecution.optimizedPlan.toString.contains("cosine_long"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("dot_long"))
    // and values are the fused values (bit-identical per the spec above)
    val viaRule = q.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap
    val direct = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        graft.functions.VectorExprs.cosineLong(col("x.e"), col("y.e")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap
    assert(viaRule == direct)
  }

  test("custom DotProductLong codegen matches the HOF fold exactly") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select(transform($"embedding", x => floor(x.cast("double") * 1000).cast("long")).as("e"))
    val hof = aggregate(zip_with($"e", $"e", (x, y) => x * y), lit(0L), (a, x) => a + x)
    val mismatches = emb
      .select((functions.VectorExprs.dotLong($"e", $"e") - hof).as("d"))
      .filter($"d" =!= 0L).count()
    assert(mismatches == 0)
  }

  test("bucketed join plan has no join-side shuffle (q29)") {
    // force a sort-merge join so bucketing (not broadcast) must avoid the
    // shuffle; restore the threshold afterwards
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = ops.Sources.q29BucketedJoin(spark, sf)
      df.collect() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
        && !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join-side shuffle present in:\n$plan")
    } finally spark.conf.set(key, old)
  }

  test("every oracle query name exists in queries (driver contract)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
    assert(SparkEntry.queries.nonEmpty)
  }

  test("entry returns rows at sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
