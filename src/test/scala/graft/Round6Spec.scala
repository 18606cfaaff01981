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
