package graft

import org.apache.spark.sql.functions._

/** Round-7 specs: invariants of the data-selection operators that the
  * DuckDB hash check can't express — partition/exhaustiveness laws
  * (SemDeDup, SCD2), the bottom-k mergeability property, and round-trip
  * conservation for the text source.
  */
class Round7Spec extends SparkSpec {

  test("q106: every vector lands in exactly one cluster; drops never exceed the cluster") {
    import spark.implicits._
    val rows = ops.Round7.q106SemDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dropped, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept + dropped == n, "kept + dropped must partition the cluster")
      assert(dropped >= 0 && kept >= 1,
        "the smallest-id member of a cluster can never be dropped")
    }
    val total = rows.map(_.getLong(1)).sum
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(total == nVecs,
      s"assignment must be exhaustive and unique: $total != $nVecs")
  }

  test("q107: rule battery is a partition — every fail count is bounded by n_docs") {
    import spark.implicits._
    val rows = ops.Round7.q107GopherRules(spark, sf).collect()
    val langs = rows.map(_.getString(0)).toSeq
    assert(langs == langs.sorted && langs.distinct == langs)
    rows.foreach { r =>
      val n = r.getLong(1)
      val pass = r.getLong(2)
      val fails = (3 to 7).map(r.getLong)
      assert(pass <= n && fails.forall(f => f >= 0 && f <= n))
      // a doc passes iff it fails zero rules, so n - pass <= sum of fails
      assert(n - pass <= fails.sum, "every failing doc fails >= 1 rule")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
  }

  test("q109: SCD2 intervals chain per key with exactly one open row") {
    import spark.implicits._
    val rows = ops.Round7.q109Scd2(spark, sf)
      .select($"custkey", $"valid_from".cast("string"),
        $"valid_to".cast("string"), $"is_current")
      .as[(Long, String, String, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, hist) =>
      val open = hist.filter(_._4)
      assert(open.length == 1, s"custkey $ck must have exactly one current row")
      assert(open.head._3 == null, "the current row must be open-ended")
      // closed rows chain: each valid_to equals the next row's valid_from
      val sorted = hist.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2,
          s"custkey $ck: interval gap between ${a._3} and ${b._2}")
        case _ => ()
      }
    }
  }

  test("q110: bottom-k sketches merge — union of halves re-takes to the global sample") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = Tables.documents(spark, sf)
      .select($"lang", $"doc_id",
        conv(substring(md5(concat_ws(":", $"doc_id", $"text")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .cache()
    def bottomK(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rank", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")))
      .filter($"rank" <= 5).drop("rank")
    // shard the corpus arbitrarily, sketch each shard, merge, re-sketch
    val merged = bottomK(
      bottomK(hashed.filter($"doc_id" % 2 === 0))
        .unionByName(bottomK(hashed.filter($"doc_id" % 2 =!= 0))))
      .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val global = bottomK(hashed)
      .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == global,
      "bottom-k of merged shard sketches must equal the global bottom-k")
    hashed.unpersist()
  }

  test("q113: merge table is deterministic and merges are distinct pairs") {
    val a = ops.Round7.q113BpeTrain(spark, sf).collect().toSeq
    val b = ops.Round7.q113BpeTrain(spark, sf).collect().toSeq
    assert(a == b, "BPE training must be run-deterministic")
    assert(a.length == 3)
    val pairs = a.map(_.getString(1))
    assert(pairs.distinct == pairs, "a pair can win at most one round")
    pairs.foreach(p => assert(p.split(" ").length == 2,
      s"merge '$p' must be a space-separated token pair"))
    assert(a.forall(_.getLong(2) > 0))
  }

  test("q114: compaction collapses 40 part files into 4, losslessly") {
    import spark.implicits._
    val result = ops.Round7.q114Compaction(spark, sf).collect()
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_compact_" + sf.replaceAll("[^a-zA-Z0-9.]", "_"))
    def partFiles(d: String): Int =
      Option(new java.io.File(base, d).listFiles())
        .map(_.count(_.getName.startsWith("part-"))).getOrElse(0)
    assert(partFiles("frag") == 40, "the fragmented state must be real")
    assert(partFiles("compact") == 4,
      "explicit repartition(4) must pin the output file count")
    val expect = Tables.documents(spark, sf)
      .groupBy(pmod($"doc_id", lit(4)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"),
        sum($"doc_id").as("id_sum"))
      .orderBy($"bucket").collect()
    assert(result.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq)
  }

  test("q115: pre-evolution batch surfaces the new column as all-NULL") {
    val rows = ops.Round7.q115SchemaEvolution(spark, sf).collect()
    assert(rows.length == 2)
    val byBatch = rows.map(r => r.getInt(0) -> r).toMap
    assert(byBatch(1).getLong(2) == 0,
      "batch 1 predates the lang column — merged reads must NULL-fill it")
    assert(byBatch(2).getLong(2) == byBatch(2).getLong(1),
      "every batch-2 row carries the evolved column")
  }

  test("q116: join-counted triangles match a brute-force enumeration") {
    import spark.implicits._
    val row = ops.Round7.q116Triangles(spark, sf).collect().head
    // re-derive the edge set driver-side and enumerate all 3-subsets
    val n = 200
    val edges = (0 until n).flatMap(i =>
      Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 2) % n)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = (for {
      (a, i) <- nodes.zipWithIndex
      b <- nodes.drop(i + 1) if edges((a, b))
      c <- nodes.dropWhile(_ <= b) if edges((b, c)) && edges((a, c))
    } yield 1).size
    assert(row.getLong(0) == edges.size.toLong)
    assert(row.getLong(2) == brute.toLong,
      s"join count ${row.getLong(2)} != brute force $brute")
  }

  test("q117: bigram surprise is deterministic and positively scored") {
    val a = ops.Round7.q117BigramLm(spark, sf).collect().toSeq
    spark.catalog.clearCache()
    val b = ops.Round7.q117BigramLm(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_.getLong(2) > 0))
    val key = a.map(r => (-r.getLong(2), r.getLong(0)))
    assert(key == key.sorted, "ranking must be surprise-desc, id-tiebroken")
  }

  test("q118: PERMISSIVE totals reconcile with DROPMALFORMED") {
    val r = ops.Round7.q118CorruptCsv(spark, sf).collect().head
    val (nRows, nCorrupt, goodChars, nKept, keptChars) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nCorrupt > 0, "the fixture must actually contain corrupt rows")
    assert(nRows == nKept + nCorrupt,
      "PERMISSIVE keeps what DROPMALFORMED drops")
    assert(goodChars == keptChars,
      "good-row payload must be identical under both modes")
  }

  test("q119: pushed COUNT/MIN/MAX answers a 2-trillion-row table instantly") {
    import spark.implicits._
    val t0 = System.nanoTime()
    val df = spark.read.format("graft.sources.GraftDocsSource")
      .option("rows", "2000000000000").load()
      .filter($"doc_id" >= 500000000000L && $"doc_id" < 1500000000000L)
      .agg(count(lit(1)).as("n"), min($"doc_id").as("lo"),
        max($"doc_id").as("hi"))
    val row = df.collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(row.getLong(0) == 1000000000000L)
    assert(row.getLong(1) == 500000000000L && row.getLong(2) == 1499999999999L)
    // enumeration at even 100M rows/s would need hours; closed form is
    // instant (generous bound for a loaded CI host)
    assert(secs < 30, s"took $secs s — aggregate was not answered closed-form")
    assert(df.queryExecution.executedPlan.toString.contains("COMPLETE-agg-pushdown"),
      "plan must show the source-side aggregate scan")
  }

  test("q119 regression: count() OVER the pushed aggregate plans and runs (empty pushed aggregation declined)") {
    // An outer count() makes ColumnPruning drop every unreferenced inner
    // aggregate expression, so the source sees an Aggregation with NO
    // aggregate exprs. The connector must DECLINE it (vacuous forall used
    // to claim complete pushdown while building the row scan → Spark
    // internal error "data source returns unexpected number of columns").
    // Hidden for rounds by Bench's swallowed Throwables; its new
    // "errors" field surfaced it the day it shipped.
    import spark.implicits._
    val df = spark.read.format("graft.sources.GraftDocsSource")
      .option("rows", "50000").load()
      .filter($"doc_id" >= 1000 && $"doc_id" < 42000)
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"))
    assert(df.count() == 1L)           // the bench's action shape
    assert(df.limit(1).collect().length == 1)
    // and the normal path still pushes completely
    assert(df.queryExecution.executedPlan.toString.contains("COMPLETE-agg-pushdown"))
  }

  test("q121: the curation funnel is monotone non-increasing per language") {
    val rows = ops.Round7.q121CurationPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stages = (1 to 5).map(r.getLong) // n_raw..n_final
      assert(stages.zip(stages.tail).forall { case (a, b) => a >= b },
        s"${r.getString(0)}: funnel must only shrink, got $stages")
      assert(stages.head > stages(1),
        "the injected duplicates must make the dedup stage do real work")
    }
  }

  test("q112: text round trip conserves every document and character") {
    import spark.implicits._
    val buckets = ops.Round7.q112TextSource(spark, sf).collect()
    val expect = Tables.documents(spark, sf)
      .groupBy(expr("doc_id % 5").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(length($"text")).as("text_chars"),
        sum($"doc_id").as("id_sum"))
      .orderBy($"bucket").collect()
    assert(buckets.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq,
      "read-back aggregate must equal the parquet-side aggregate")
  }
}
