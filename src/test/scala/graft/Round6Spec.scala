package graft

import org.apache.spark.sql.functions._

/** Round-6 specs: invariants of the new curation-stage operators
  * (contamination, unigram-LM scoring, repetition metrics, mix weights,
  * Z-order skipping) that the DuckDB hash check can't express — plan
  * shape, determinism across runs, and the Z-locality guarantee.
  */
class Round6Spec extends SparkSpec {

  test("q99: benchmark side broadcasts; benchmark docs never appear as hits") {
    import spark.implicits._
    val df = ops.Round6.q99Contamination(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the corpus side must be probed by a broadcast of the benchmark
    // grams — the 100 TB side is never shuffled for the join
    assert(df.queryExecution.executedPlan.toString.contains("Broadcast"),
      "expected a broadcast join for the benchmark-gram probe")
    rows.foreach { r =>
      val (docId, nGrams, nHit, ppm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(docId % 97 != 0, "benchmark docs must be excluded from scoring")
      assert(nHit <= nGrams && ppm >= 0 && ppm <= 1000000)
      assert(ppm == nHit * 1000000 / nGrams)
    }
    // emitted in contamination order, doc_id-tiebroken
    val key = rows.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(key == key.sorted)
  }

  test("q100: surprise scores are positive, integer-exact, and re-run stable") {
    val a = ops.Round6.q100UnigramSurprise(spark, sf).collect().toSeq
    spark.catalog.clearCache()
    val b = ops.Round6.q100UnigramSurprise(spark, sf).collect().toSeq
    assert(a == b, "integer-quantized scoring must be run-deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(1) > 0)            // n_toks
      assert(r.getLong(2) > 0)            // surprise_q: −ln p > 0 for p < 1
    }
    val key = a.map(r => (-r.getLong(2), r.getLong(0)))
    assert(key == key.sorted)
  }

  test("q101: repetition metrics satisfy their own definitions") {
    val rows = ops.Round6.q101Repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd, top, dupPpm, topPpm) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nd <= n && top >= 1 && top <= n - nd + 1)
      assert(dupPpm == (n - nd) * 1000000 / n)
      assert(topPpm == top * 1000000 / n)
    }
  }

  test("q102: mix rates respect the cap and sampling never exceeds the group") {
    val rows = ops.Round6.q102MixWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, s, ratePpm, nSampled) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(s == math.floor(math.sqrt(nDocs.toDouble) * 1000).toLong,
        "quantized sqrt weight must match driver-side math")
      assert(ratePpm >= 0 && ratePpm <= 1000000)
      assert(nSampled <= nDocs)
      if (ratePpm == 1000000) assert(nSampled == nDocs)
    }
  }

  test("q104: packing conserves every token and every document") {
    import spark.implicits._
    val hist = ops.Round6.q104Packing(spark, sf).collect()
    assert(hist.nonEmpty)
    val docs = Tables.documents(spark, sf)
    val expectTokens = docs.select(sum(size(split($"text", " ")))).head().getLong(0)
    val expectDocs = docs.count()
    // the histogram re-aggregates bins, so token/doc mass must be conserved
    assert(hist.map(_.getLong(2)).sum == expectTokens)
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum == expectDocs)
  }

  test("q105: shared-passage pairs include the injected duplicates") {
    val rows = ops.Round6.q105SharedPassages(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 3))
    // the q40-style injected copies (doc_id + 1000000) must be caught by
    // the fingerprint bucket join — they share every passage
    assert(rows.exists(r => r.getLong(1) - r.getLong(0) == 1000000L),
      "no injected duplicate pair surfaced")
  }

  /** Temporarily set session confs, restoring previous values. */
  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join (engine-native skew handling)") {
    import spark.implicits._
    // q39 demonstrates MANUAL salting; this proves the engine-native form:
    // OptimizeSkewedJoin detects the hot key 0 (90% of the left side) and
    // splits its partition into advisory-sized chunks at runtime.
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
    ) {
      // payload must SURVIVE the join (referenced by the aggregate) or
      // column pruning leaves 8-byte rows and nothing looks skewed; md5
      // keeps the shuffle bytes incompressible so size estimates hold
      val left = spark.range(0, 50000).select(
        when($"id" % 10 < 9, lit(0L)).otherwise(pmod($"id", lit(100))).as("k"),
        md5($"id".cast("string")).as("pad"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum($"v").as("vsum"),
          sum(length($"pad")).as("padlen"))
      val Array(row) = joined.collect()
      assert(joined.queryExecution.executedPlan.toString.contains("skew=true"),
        "expected OptimizeSkewedJoin to mark the sort-merge join")
      // and the split must not change the answer: every left row matches
      // exactly one right key
      assert(row.getLong(0) == 50000L)
    }
  }

  test("q103: Z-order blocks are tight in BOTH dimensions and skipping skips") {
    val rows = ops.Round6.q103Zorder(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minH, maxH, minV, maxV, isRead) =
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getBoolean(6))
      // the whole point of the Morton layout: a z div 64 block spans at
      // most 8 consecutive values in EACH interleaved dimension
      assert(maxH - minH < 8, s"hour span ${maxH - minH} leaks across blocks")
      assert(maxV - minV < 8, s"bucket span ${maxV - minV} leaks across blocks")
      assert(isRead == (minH <= 11 && maxH >= 8))
    }
    // the probe must actually skip files — otherwise the layout bought
    // nothing (hours 8-11 sit inside one of three hour-blocks)
    assert(rows.exists(!_.getBoolean(6)), "no file was skipped")
    assert(rows.exists(_.getBoolean(6)), "no file was read")
  }
}
