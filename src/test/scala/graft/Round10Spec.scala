package graft

import org.apache.spark.sql.functions._

/** Round-10 specs: independent recounts and law-pinning for the
  * decontamination / epoch-planning / split-leakage audits (q167–q169).
  */
class Round10Spec extends SparkSpec {

  test("q167: contamination ppm matches a driver-side gram recount for the top doc") {
    import spark.implicits._
    val rows = ops.Round10.q167NgramDecontam(spark, sf).collect()
    assert(rows.length == 20)
    // independent recount: rebuild splits and distinct 5-grams in plain
    // Scala and reproduce the most-contaminated doc's numbers
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 10
    }
    def grams(t: String): Set[String] = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val train = docs.filter(d => bucket(d._2) < 8)
    val evalDocs = docs.filter(d => bucket(d._2) >= 8)
    val trainGrams = train.iterator.flatMap(d => grams(d._2)).toSet
    val top = rows.head
    val mine = grams(evalDocs.find(_._1 == top.getLong(0)).get._2)
    assert(mine.nonEmpty && top.getLong(1) == mine.size, "n_grams recount")
    assert(top.getLong(2) == mine.count(trainGrams.contains), "n_hit recount")
    assert(top.getLong(3) == top.getLong(2) * 1000000L / top.getLong(1))
    // ordering law and ppm sanity
    val ppm = rows.map(_.getLong(3))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q168: plan laws hold on the corpus AND the cap binds on a skewed synthetic mixture") {
    import spark.implicits._
    val rows = ops.Round10.q168EpochPlan(spark, sf).collect()
    assert(rows.length == 20)
    val budget = rows.map(_.getLong(1)).sum * 3L / 2L
    rows.foreach { r =>
      assert(r.getLong(2) <= 4L * r.getLong(1), "never above the 4-epoch cap")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
    // the one-round redistribution can undershoot only by integer-div
    // remainders: strictly less than one token per source
    val alloc = rows.map(_.getLong(2)).sum
    assert(alloc <= budget && budget - alloc < rows.length,
      s"budget $budget vs allocated $alloc")
    // skewed synthetic: one giant source, several tiny ones — the tiny
    // sources MUST cap at 4 epochs and the giant absorbs the leftover
    val skew = Seq(("big", 10000L), ("tiny1", 100L), ("tiny2", 150L),
      ("tiny3", 120L))
    val plan = ops.Round10.epochPlan(skew)
    val b = skew.map(_._2).sum * 3L / 2L
    val byName = plan.map(p => p._1 -> p).toMap
    Seq("tiny1", "tiny2", "tiny3").foreach { s =>
      assert(byName(s)._5, s"$s must be capped (4·tokens < equal share)")
      assert(byName(s)._3 == 4L * byName(s)._2, s"$s allocates exactly 4 epochs")
      assert(byName(s)._4 == 4000000L, s"$s epochs_ppm is exactly 4e6")
    }
    assert(!byName("big")._5 && byName("big")._3 > b / skew.length,
      "the uncapped source absorbs redistributed budget above its equal share")
    val allocS = plan.map(_._3).sum
    assert(allocS <= b && b - allocS < skew.length)
  }

  test("q170: the KMV sketch merges losslessly and its estimates come from the true bottom-64") {
    import spark.implicits._
    val rows = ops.Round10.q170KmvQuantiles(spark, sf).collect()
    assert(rows.length == 3)
    // mergeability is carried as data and must hold exactly
    rows.foreach(r => assert(r.getBoolean(4),
      "shard-merged bottom-64 must equal the direct global bottom-64"))
    // independent recount: rebuild the sketch driver-side
    val vals = Tables.orders(spark, sf)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("v")).distinct().collect().map(_.getLong(0))
    def h(v: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(v.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    val sample = vals.sortBy(v => (h(v), v)).take(64).sorted
    val exact = vals.sorted
    rows.zipWithIndex.foreach { case (r, i) =>
      val q = i + 1
      assert(r.getInt(0) == q)
      assert(r.getLong(1) == sample(
        math.max(1, math.min(sample.length, 16 * q)) - 1), s"q$q estimate")
      val ex = exact((math.max(1L, exact.length.toLong * q / 4) - 1).toInt)
      assert(r.getLong(2) == ex, s"q$q exact order statistic")
      assert(r.getLong(3) == math.abs(r.getLong(1) - ex) * 1000000L / ex)
    }
    // estimates are monotone across quartiles (sample quantiles of a
    // sorted sample)
    assert(rows(0).getLong(1) <= rows(1).getLong(1)
      && rows(1).getLong(1) <= rows(2).getLong(1))
  }

  test("q171: packing audit matches a driver-side replay of the concat-and-chunk stream") {
    import spark.implicits._
    val row = ops.Round10.q171PackingAudit(spark, sf).collect().head
    // replay the deterministic packing driver-side
    def h(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) =>
        (h(t), id, t.split(" ").count(_.nonEmpty).toLong)
      }
      .filter(_._3 > 0)
      .sortBy(d => (d._1, d._2))
    val total = docs.map(_._3).sum
    assert(row.getLong(0) == docs.length, "n_docs")
    assert(row.getLong(1) == total, "total_tokens")
    assert(row.getLong(2) == (total + 511L) / 512L, "n_windows")
    var e = 0L
    var straddlers = 0L
    docs.foreach { d =>
      val s = e; e += d._3
      if (s / 512L < (e - 1L) / 512L) straddlers += 1
    }
    assert(row.getLong(3) == straddlers, "boundary docs replayed")
    assert(row.getLong(4) == total * 1000000L / (row.getLong(2) * 512L))
    assert(row.getLong(4) <= 1000000L && row.getLong(2) * 512L >= total,
      "fill never exceeds capacity")
    assert(row.getLong(5) == straddlers * 1000000L / docs.length)
  }

  test("q172: retrieved docs contain BOTH query terms with exactly recounted frequencies") {
    import spark.implicits._
    val rows = ops.Round10.q172BooleanRetrieval(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // rebuild term selection + postings driver-side
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (tok, id))
    }.groupBy(identity).map { case ((tok, id), xs) => (tok, id, xs.length.toLong) }
    val byTok = tf.groupBy(_._1).map { case (tok, xs) => tok -> xs.map(_._3).sum }
    val ranked = byTok.toSeq.sortBy { case (tok, cnt) => (-cnt, tok) }
    val (t1, t2) = (ranked(4)._1, ranked(5)._1)
    val p1 = tf.filter(_._1 == t1).map(x => x._2 -> x._3).toMap
    val p2 = tf.filter(_._1 == t2).map(x => x._2 -> x._3).toMap
    val expect = p1.keySet.intersect(p2.keySet).toSeq
      .map(id => (id, p1(id), p2(id), p1(id) + p2(id)))
      .sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == expect,
      "posting intersection must match the driver-side replay exactly")
  }

  test("q173: split-balance cells conserve the corpus and shares are exact identities") {
    import spark.implicits._
    val rows = ops.Round10.q173SplitBalance(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total,
      "every document lands in exactly one (split, lang) cell")
    val bySplit = rows.groupBy(_.getString(0))
    assert(bySplit.keySet == Set("train", "val", "test"))
    rows.foreach { r =>
      val splitTotal = bySplit(r.getString(0)).map(_.getLong(2)).sum
      assert(r.getLong(3) == r.getLong(2) * 1000000L / splitTotal, "share")
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)), "dev")
    }
    // corpus shares are consistent across splits for the same lang
    rows.groupBy(_.getString(1)).values.foreach(g =>
      assert(g.map(_.getLong(4)).distinct.length == 1))
  }

  test("q174: novelty counts match a driver-side gram inventory and bound correctly") {
    import spark.implicits._
    val rows = ops.Round10.q174SourceNovelty(spark, sf).collect()
    assert(rows.length == 20)
    // driver-side replay of (source, gram) inventories
    val docs = Tables.documents(spark, sf).select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val inv = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap { case (_, t) =>
        val w = t.split(" ").filter(_.nonEmpty)
        if (w.length < 5) Seq.empty else w.sliding(5).map(_.mkString(" ")).toSeq
      }.toSet
    }
    rows.foreach { r =>
      val s = r.getString(0)
      val mine = inv(s)
      assert(r.getLong(1) == mine.size, s"$s n_grams")
      val others = inv.filter(_._1 != s).values
        .foldLeft(Set.empty[String])(_ union _)
      assert(r.getLong(2) == mine.count(g => !others.contains(g)), s"$s n_unique")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("q175: diff statuses are mutually exact — unchanged cells match checksums, changed cells differ") {
    import spark.implicits._
    val rows = ops.Round10.q175SnapshotDiff(spark, sf).collect()
    val byStatus = rows.map(r => r.getString(0) -> r).toMap
    assert(byStatus.contains("added") && byStatus.contains("changed"),
      "onboarded source must show as added; %3 removal must show as changed")
    assert(!byStatus.contains("removed"), "A is a subset of B — nothing is removed")
    // conservation: docs_b across all statuses == corpus size
    assert(rows.map(_.getLong(3)).sum == Tables.documents(spark, sf).count())
    // every src0 cell is added (plus any cell whose docs ALL carry
    // doc_id % 3 == 0 — possible at tiny scale)
    val src0Cells = Tables.documents(spark, sf)
      .filter($"source" === "src0").select($"lang").distinct().count()
    assert(byStatus("added").getLong(1) >= src0Cells)
    assert(byStatus("added").getLong(2) == 0, "added cells have no version-A docs")
    byStatus.get("unchanged").foreach { r =>
      assert(r.getLong(4) == 0, "unchanged cells carry zero doc delta")
      assert(r.getLong(2) == r.getLong(3))
    }
    assert(byStatus("changed").getLong(4) > 0,
      "changed cells gained their %3==0 docs back")
  }

  test("q176: exact AUC matches a brute-force pairwise count driver-side") {
    import spark.implicits._
    val row = ops.Round10.q176ScoreBiasAuc(spark, sf).collect().head
    val scores = Tables.documents(spark, sf)
      .select($"lang", $"text").collect()
      .map { r =>
        val w = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getString(0) == "en", w.distinct.length.toLong * 1000000L / w.length)
      }
    val pos = scores.filter(_._1).map(_._2)
    val neg = scores.filter(!_._1).map(_._2)
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    // brute-force Mann-Whitney: O(n_pos * n_neg) is fine at spec scale
    var wins = 0L; var ties = 0L
    pos.foreach(p => neg.foreach { n =>
      if (p > n) wins += 1 else if (p == n) ties += 1
    })
    assert(row.getLong(2) == wins, "wins")
    assert(row.getLong(3) == ties, "ties")
    assert(row.getLong(4) ==
      (2 * wins + ties) * 1000000L / (2L * pos.length * neg.length))
    // an unbiased score sits near 500000; a catastrophic bias would not
    assert(row.getLong(4) > 300000L && row.getLong(4) < 700000L,
      s"diversity score should not be wildly language-biased: ${row.getLong(4)}")
  }

  test("q177: centroid drift matches a driver-side recount and vanishes for identical batches") {
    import spark.implicits._
    val rows = ops.Round10.q177CentroidDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1000).toLong).toArray))
    val lab0 = rows.head.getInt(0)
    def centroid(vs: Seq[Array[Long]]): Array[Long] = {
      val dims = vs.head.length
      Array.tabulate(dims)(d =>
        math.floor(vs.map(_(d)).sum.toDouble / vs.length).toLong)
    }
    val ref = vecs.filter(v => v._2 == lab0 && v._1 % 2 == 0).map(_._3).toSeq
    val cur = vecs.filter(v => v._2 == lab0 && v._1 % 2 == 1).map(_._3).toSeq
    val (cr, cc) = (centroid(ref), centroid(cur))
    val drift = cr.zip(cc).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(rows.head.getLong(1) == ref.size && rows.head.getLong(2) == cur.size)
    assert(rows.head.getLong(3) == drift, "drift recounted driver-side")
    // law: identical batches drift zero — run the same arithmetic with
    // ref==cur and confirm the formula's fixed point
    assert(cr.zip(cr).map { case (a, b) => (a - b) * (a - b) }.sum == 0L)
  }

  test("q178: L1 divergence matches a driver-side distribution recount and bounds correctly") {
    import spark.implicits._
    val rows = ops.Round10.q178SourceDivergence(spark, sf).collect()
    assert(rows.length == 20)
    val toks = Tables.documents(spark, sf).select($"source", $"text")
      .collect().flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).map(t => (r.getString(0), t))
      }
    val cell = toks.groupBy(identity).map { case ((s, t), xs) => (s, t, xs.length.toLong) }
    val st = cell.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val tt = cell.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val ct = tt.values.sum
    val s0 = rows.head.getString(0)
    val mine = cell.filter(_._1 == s0).map(x => x._2 -> x._3).toMap
    val l1 = tt.map { case (t, tot) =>
      math.abs(mine.getOrElse(t, 0L) * 1000000L / st(s0)
        - tot * 1000000L / ct)
    }.sum
    assert(rows.head.getLong(1) == mine.size, "n_tokens recount")
    assert(rows.head.getLong(2) == l1, "L1 recount for the first source")
    // L1 between two probability distributions is bounded by 2 (2e6 ppm,
    // plus integer-floor slack per term)
    rows.foreach(r => assert(r.getLong(2) <= 2000000L + tt.size))
  }

  test("q179: every FK edge is clean on this corpus AND a planted orphan is caught") {
    import spark.implicits._
    val rows = ops.Round10.q179FkIntegrity(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq == Seq("customer->nation",
      "lineitem->orders", "nation->region", "orders->customer",
      "supplier->nation"), "edges sorted and complete")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) == 0 && r.getLong(3) == 0,
        s"${r.getString(0)} must be orphan-free on the generated corpus")
    }
    assert(rows.find(_.getString(0) == "lineitem->orders").get.getLong(1) ==
      Tables.lineitem(spark, sf).count(), "child counts conserve")
    // the detector itself: a child keyed to a non-existent parent is
    // counted through the same one-pass left-join shape
    val child = Seq(1L, 2L, 999L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val probe = child
      .join(parent.withColumn("present", lit(true)), $"k" === $"pk", "left")
      .agg(count(lit(1)), count(when($"present".isNull, 1))).head()
    assert(probe.getLong(0) == 3 && probe.getLong(1) == 1,
      "the audit shape catches a planted orphan")
  }

  test("q180: first-digit profile matches a driver recount; Benford constants are the true floors") {
    import spark.implicits._
    val rows = ops.Round10.q180Benford(spark, sf).collect()
    assert(rows.length <= 9 && rows.nonEmpty)
    // the hardcoded constants ARE floor(log10(1+1/d)*1e6)
    (1 to 9).foreach { d =>
      val expect = math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
      rows.find(_.getInt(0) == d).foreach(r =>
        assert(r.getLong(3) == expect, s"digit $d constant"))
    }
    // recount digits driver-side
    val cents = Tables.orders(spark, sf)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect().map(_.getLong(0))
    val byDigit = cents.groupBy(v => v.toString.head.asDigit)
      .map { case (d, xs) => d -> xs.length.toLong }
    assert(rows.map(_.getLong(1)).sum == cents.length)
    rows.foreach { r =>
      assert(r.getLong(1) == byDigit(r.getInt(0)), s"digit ${r.getInt(0)} count")
      assert(r.getLong(2) == r.getLong(1) * 1000000L / cents.length)
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)))
    }
  }

  test("q181: novelty accounting conserves the gram universe — every gram is new exactly once") {
    import spark.implicits._
    val rows = ops.Round10.q181NoveltyCurve(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // sum of n_new across tranches == |distinct grams| (each gram first
    // seen exactly once), and tranche 0's grams are ALL new
    val maxId = Tables.documents(spark, sf).agg(max($"doc_id")).head().getLong(0)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val slices = docs.flatMap { case (id, t) =>
      val w = t.split(" ").filter(_.nonEmpty)
      val s = math.min(9L, id * 10L / (maxId + 1L))
      if (w.length < 5) Seq.empty
      else w.sliding(5).map(g => (s, g.mkString(" "))).toSeq
    }.distinct
    val universe = slices.map(_._2).distinct.length.toLong
    assert(rows.map(_.getLong(2)).sum == universe,
      "every distinct gram is first-seen exactly once")
    val first = rows.find(_.getLong(0) == 0L).get
    assert(first.getLong(1) == first.getLong(2) &&
      first.getLong(3) == 1000000L,
      "the first tranche's grams are all new by definition")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
      // per-tranche inventory recount
      val mine = slices.filter(_._1 == r.getLong(0)).map(_._2).distinct.length
      assert(r.getLong(1) == mine, s"tranche ${r.getLong(0)} inventory")
    }
  }

  test("q182: cascade rates are exact; the joint never exceeds any single filter") {
    import spark.implicits._
    val rows = ops.Round10.q182FilterCascade(spark, sf).collect()
    assert(rows.length == 4)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val joint = byName("4_joint")
    val singles = Seq("1_len_ge_200", "2_diversity_ge_0.3", "3_word_len_3_12")
      .map(byName)
    singles.foreach { s =>
      assert(s.isNullAt(3), "single filters carry no independence column")
      assert(joint.getLong(1) <= s.getLong(1),
        "joint passes are a subset of every single filter's passes")
    }
    assert(!joint.isNullAt(3))
    // the independence prediction replays exactly from the single rates
    val Seq(pp1, pp2, pp3) = singles.map(_.getLong(2))
    assert(joint.getLong(3) == pp1 * pp2 / 1000000L * pp3 / 1000000L)
    // driver recount of one filter: length >= 200
    val n200 = Tables.documents(spark, sf).filter($"n_chars" >= 200).count()
    assert(byName("1_len_ge_200").getLong(1) == n200)
  }

  test("q183: precision/recall/F1 derive exactly from q32's confusion matrix") {
    import spark.implicits._
    val rows = ops.Round10.q183ClassifierMetrics(spark, sf).collect()
    assert(rows.nonEmpty)
    val matrix = ops.Text.q32LangId(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val langs = rows.map(_.getString(0))
    rows.foreach { r =>
      val l = r.getString(0)
      val nTrue = matrix.collect { case ((a, _), n) if a == l => n }.sum
      val nPred = matrix.collect { case ((_, p), n) if p == l => n }.sum
      val tp = matrix.getOrElse((l, l), 0L)
      assert(r.getLong(1) == nTrue, s"$l n_true")
      assert(r.getLong(2) == nPred, s"$l n_pred")
      assert(r.getLong(3) == tp, s"$l tp")
      assert(r.getLong(5) == tp * 1000000L / nTrue, s"$l recall")
      if (nPred > 0) {
        val prec = tp * 1000000L / nPred
        assert(r.getLong(4) == prec, s"$l precision")
        if (prec + r.getLong(5) > 0)
          assert(r.getLong(6) ==
            2L * prec * r.getLong(5) / (prec + r.getLong(5)), s"$l f1")
      } else assert(r.isNullAt(4), s"$l never predicted -> NULL precision")
      // F1 is bounded by both precision and recall... up to integer floor
      if (!r.isNullAt(6)) {
        assert(r.getLong(6) <= math.max(r.getLong(4), r.getLong(5)))
      }
    }
    assert(langs.toSet == matrix.keys.map(_._1).toSet,
      "one metrics row per true language")
  }

  test("q184: the probe sweep is monotone and its nprobe=2 row matches q51 exactly") {
    import spark.implicits._
    val rows = ops.Similarity.q184ProbeSweep(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    val scanned = rows.map(_.getLong(1))
    val hits = rows.map(_.getLong(2))
    assert(scanned.zip(scanned.tail).forall { case (a, b) => a <= b },
      "more probes never scan fewer vectors")
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      "more probes never lose recall (probe sets are nested)")
    rows.foreach { r =>
      assert(r.getLong(2) <= 10)
      assert(r.getLong(3) == r.getLong(2) * 1000000L / 10L)
      assert(r.getLong(1) >= r.getLong(2), "hits come from scanned vectors")
    }
    // cross-operator identity: q51 IS the nprobe=2 search — its top-10's
    // overlap with the exact top-10 must equal the sweep's nprobe=2 hits
    val q51Ids = ops.Similarity.q51AnnIvf(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val dot = graft.functions.VectorExprs.dotLong _
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding",
        x => floor(x.cast("double") * 1000).cast("long")).as("e"))
    val q = emb.filter($"vec_id" === 1).select($"e".as("qe"))
    val exact = emb.filter($"vec_id" =!= 1).join(broadcast(q))
      .select($"vec_id",
        (dot($"e", $"qe").cast("double") /
          (sqrt(dot($"e", $"e").cast("double"))
            * sqrt(dot($"qe", $"qe").cast("double")))).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    assert(rows.find(_.getInt(0) == 2).get.getLong(2) ==
      q51Ids.intersect(exact).size.toLong,
      "nprobe=2 hits must equal q51's overlap with the exact top-10")
  }

  test("q185: co-occurrence counts and lifts match a driver-side recount") {
    import spark.implicits._
    val rows = ops.Round10.q185Cooccurrence(spark, sf).collect()
    assert(rows.length == 15)
    val docs = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).distinct.toSet)
    val n = docs.length.toLong
    val df = docs.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb, "pairs are ordered")
      val nAb = docs.count(d => d.contains(ta) && d.contains(tb)).toLong
      assert(r.getLong(2) == nAb, s"($ta,$tb) co-occurrence count")
      assert(r.getLong(3) == df(ta) && r.getLong(4) == df(tb))
      assert(r.getLong(5) == nAb * n * 1000000L / (df(ta) * df(tb)))
      // co-occurrence can never exceed either marginal
      assert(nAb <= df(ta) && nAb <= df(tb))
    }
    // ordering law: count desc with pair tiebreak
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q186: banding configs nest, and the 4x2 row's dup count IS q41's result size") {
    import spark.implicits._
    val rows = ops.Dedup.q186BandingSweep(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("2x4", "4x2", "8x1"))
    val Seq(c24, c42, c81) = rows.toSeq
    // nesting: an all-4 band match implies 2-hash band matches implies
    // 1-hash band matches
    assert(c24.getLong(3) <= c42.getLong(3) && c42.getLong(3) <= c81.getLong(3),
      "candidate sets nest with looser banding")
    assert(c24.getLong(4) <= c42.getLong(4) && c42.getLong(4) <= c81.getLong(4),
      "verified dups nest too")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getLong(5) == r.getLong(4) * 1000000L / r.getLong(3))
    }
    // cross-operator identity: q41 is exactly the 4x2 config — its
    // verified pair count must equal this sweep's 4x2 dup count
    val q41Pairs = ops.Dedup.q41MinhashLsh(spark, sf).count()
    assert(c42.getLong(4) == q41Pairs,
      "the sweep's 4x2 row must reproduce q41's verified pair count")
  }

  test("q187: survivor audit matches a recount from q41's own pairs") {
    import spark.implicits._
    val row = ops.Round10.q187SurvivorAudit(spark, sf).collect().head
    val pairs = ops.Dedup.q41MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val score = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map { r =>
        val w = r.getString(1).split(" ").filter(_.nonEmpty)
        r.getLong(0) -> w.distinct.length.toLong * 1000000L / w.length
      }.toMap
    val losses = pairs.map { case (a, b) =>
      math.max(0L, score(b) - score(a))
    }
    assert(row.getLong(0) == pairs.length, "pair count")
    assert(row.getLong(1) ==
      pairs.count { case (a, b) => score(a) >= score(b) }, "kept-best count")
    assert(row.getLong(2) == losses.sum / pairs.length, "mean loss")
    assert(row.getLong(3) == losses.max, "max loss")
    // structural law: kept_best + lossy pairs cover everything
    assert(row.getLong(1) + losses.count(_ > 0) == pairs.length)
  }

  test("q188: merged manifests are indistinguishable from recompute, and a tamper breaks it") {
    import spark.implicits._
    val row = ops.Round10.q188ManifestMerge(spark, sf).collect().head
    assert(row.getBoolean(3), "merge must equal recompute on every cell")
    assert(row.getLong(0) == row.getLong(1) && row.getLong(0) == row.getLong(2))
    val nCells = Tables.documents(spark, sf)
      .select($"lang", $"source").distinct().count()
    assert(row.getLong(0) == nCells, "every (lang, source) cell is audited")
    // negative control: the same modular algebra with ONE count
    // perturbed must break the identity (the flags carry real signal)
    val p = BigInt(ops.Round9.checksumPrime)
    val a = BigInt(12345); val b = BigInt(67890)
    assert((((a mod p) + (b mod p)) mod p) == ((a + b) mod p))
    assert(((a + 1) mod p) != (a mod p))
  }

  test("q189: stability deltas match a driver recount; whitespace alone can never move the score") {
    import spark.implicits._
    val row = ops.Round10.q189NormStability(spark, sf).collect().head
    def score(t: String): Long = {
      val w = t.split(" ").filter(_.nonEmpty)
      w.distinct.length.toLong * 1000000L / w.length
    }
    def norm(t: String): String = java.text.Normalizer.normalize(
      t.toLowerCase.replaceAll(" +", " "), java.text.Normalizer.Form.NFC)
    val docs = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0))
    val deltas = docs.map(t => math.abs(score(t) - score(norm(t))))
    assert(row.getLong(0) == docs.length)
    assert(row.getLong(1) == deltas.count(_ > 0), "changed-doc recount")
    assert(row.getLong(2) == deltas.count(_ > 0).toLong * 1000000L / docs.length)
    assert(row.getLong(3) == deltas.sum / docs.length, "mean delta")
    assert(row.getLong(4) == deltas.max, "max delta")
    // the whitespace-invariance law: collapsing spaces WITHOUT case
    // folding can never move the score (empty tokens already filtered)
    docs.take(50).foreach(t =>
      assert(score(t) == score(t.replaceAll(" +", " ")),
        "whitespace collapse alone must be score-neutral"))
  }

  test("q190: chain and closure counts match a driver-side graph recount") {
    import spark.implicits._
    val row = ops.Round10.q190TransitivityAudit(spark, sf).collect().head
    val pairs = ops.Dedup.q41MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairSet = pairs.toSet
    val adj = (pairs ++ pairs.map(_.swap))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    var chains = 0L; var closed = 0L
    (pairs ++ pairs.map(_.swap)).foreach { case (a, b) =>
      adj.getOrElse(b, Array.empty[Long]).foreach { c =>
        if (a < c) {
          chains += 1
          if (pairSet.contains((a, c))) closed += 1
        }
      }
    }
    assert(row.getLong(0) == chains, "chain recount")
    assert(row.getLong(1) == closed, "closure recount")
    assert(row.getLong(2) == (if (chains > 0) closed * 1000000L / chains
      else 1000000L))
    assert(row.getLong(1) <= row.getLong(0))
  }

  test("q191: purity accounting matches a driver recount and conserves each language's docs") {
    import spark.implicits._
    val rows = ops.Round10.q191LanguagePurity(spark, sf).collect()
    val markers = Map(
      "en" -> Set("the", "and", "of", "to", "a", "is", "in"),
      "de" -> Set("der", "die", "das", "und", "ist", "ein"),
      "fr" -> Set("le", "la", "les", "et", "est", "un"),
      "es" -> Set("el", "los", "las", "y", "es", "un"),
      "zh" -> Set("的", "是", "在", "了", "和"))
    val docs = Tables.documents(spark, sf).select($"lang", $"text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val l = r.getString(0)
      val mine = docs.filter(_._1 == l)
      val stats = mine.map { case (_, t) =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val hits = markers.view.mapValues(ws => toks.count(ws)).toMap
        val tot = hits.values.sum.toLong
        val own = hits.getOrElse(l, 0).toLong
        (tot, if (tot > 0) Some(own * 1000000L / tot) else None)
      }
      assert(r.getLong(1) == mine.length, s"$l n_docs")
      assert(r.getLong(2) == stats.count(_._1 == 0), s"$l unsignaled")
      assert(r.getLong(3) == stats.count(_._2.contains(1000000L)), s"$l pure")
      val signaled = stats.flatMap(_._2)
      if (signaled.nonEmpty)
        assert(r.getLong(4) == signaled.sum / signaled.length, s"$l mean")
    }
    assert(rows.map(_.getLong(1)).sum == docs.length,
      "languages partition the corpus")
  }

  test("q192: length buckets conserve docs and tokens and the log2 key is exact") {
    import spark.implicits._
    val rows = ops.Round10.q192LengthProfile(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select($"lang", $"text")
      .collect().map { r =>
        (r.getString(0), r.getString(1).split(" ").count(_.nonEmpty).toLong)
      }.filter(_._2 > 0)
    assert(rows.map(_.getLong(2)).sum == docs.length, "docs conserve")
    assert(rows.map(_.getLong(3)).sum == docs.map(_._2).sum, "tokens conserve")
    rows.foreach { r =>
      val (lang, bucket) = (r.getString(0), r.getLong(1))
      val mine = docs.filter { case (l, t) =>
        l == lang && java.lang.Long.toBinaryString(t).length.toLong == bucket
      }
      assert(r.getLong(2) == mine.length, s"$lang/$bucket doc count")
      assert(r.getLong(3) == mine.map(_._2).sum, s"$lang/$bucket token mass")
      // bucket bounds: every doc in bucket k has toks in [2^(k-1), 2^k)
      mine.foreach { case (_, t) =>
        assert(t >= (1L << (bucket - 1).toInt) && t < (1L << bucket.toInt))
      }
    }
    // ppm identities per language
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val (ld, lt) = (g.map(_.getLong(2)).sum, g.map(_.getLong(3)).sum)
      g.foreach { r =>
        assert(r.getLong(4) == r.getLong(2) * 1000000L / ld)
        assert(r.getLong(5) == r.getLong(3) * 1000000L / lt)
      }
    }
  }

  test("q193: the size histogram conserves q79's clusters and documents exactly") {
    import spark.implicits._
    val rows = ops.Round10.q193ClusterSizes(spark, sf).collect()
    val clusters = ops.Round3.q79DupClusters(spark, sf).collect()
      .map(_.getLong(1))
    assert(rows.map(_.getLong(1)).sum == clusters.length,
      "every q79 cluster lands in exactly one size bucket")
    assert(rows.map(_.getLong(2)).sum == clusters.sum,
      "document mass conserves through the histogram")
    rows.foreach { r =>
      assert(r.getLong(0) >= 2, "near-dup clusters have at least 2 members")
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getLong(1) == clusters.count(_ == r.getLong(0)),
        s"size-${r.getLong(0)} recount")
    }
  }

  test("q194: duplicate provenance matches a driver recount over q41's pairs") {
    import spark.implicits._
    val rows = ops.Round10.q194DupProvenance(spark, sf).collect()
    assert(rows.length == 20)
    val srcOf = Tables.documents(spark, sf).select($"doc_id", $"source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = ops.Dedup.q41MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_.getLong(1)).sum == srcOf.size, "doc totals conserve")
    rows.foreach { r =>
      val s = r.getString(0)
      val dupDocs = pairs.flatMap { case (a, b) => Seq(a, b) }
        .filter(srcOf(_) == s).distinct
      assert(r.getLong(2) == dupDocs.length, s"$s dup docs")
      assert(r.getLong(3) == dupDocs.length.toLong * 1000000L / r.getLong(1))
      val intraSides = pairs.count { case (a, b) =>
        srcOf(a) == s && srcOf(a) == srcOf(b) } * 2 +
        0 // both sides of an intra pair belong to s
      assert(r.getLong(4) == intraSides, s"$s intra sides")
      val crossSides = pairs.count { case (a, b) =>
        srcOf(a) == s && srcOf(a) != srcOf(b) } +
        pairs.count { case (a, b) => srcOf(b) == s && srcOf(a) != srcOf(b) }
      assert(r.getLong(5) == crossSides, s"$s cross sides")
    }
  }

  test("q195: the KS row matches an exhaustive driver-side CDF scan over the split") {
    import spark.implicits._
    val rows = ops.Round10.q195SplitDifficulty(spark, sf).collect()
    assert(rows.length == 5)
    def bucket(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val scored = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0)).map { t =>
        val w = t.split(" ").filter(_.nonEmpty)
        (bucket(t) < 8, w.distinct.length.toLong * 1000000L / w.length)
      }
    val (tr, ev) = (scored.filter(_._1).map(_._2).sorted,
      scored.filterNot(_._1).map(_._2).sorted)
    val ks = scored.map(_._2).distinct.map { s =>
      math.abs(tr.count(_ <= s).toLong * 1000000L / tr.length
        - ev.count(_ <= s).toLong * 1000000L / ev.length)
    }.max
    assert(rows.head.getLong(3) == ks,
      "row 1 must be the exact KS statistic over all distinct scores")
    rows.foreach { r =>
      assert(r.getLong(3) == math.abs(r.getLong(1) - r.getLong(2)))
    }
    val gaps = rows.map(_.getLong(3))
    assert(gaps.zip(gaps.tail).forall { case (a, b) => a >= b })
  }

  test("q196: the waterfall is monotone and each stage matches its source operator") {
    import spark.implicits._
    val rows = ops.Round10.q196CurationWaterfall(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1_raw", "2_exact_dedup",
      "3_near_dedup", "4_quality"))
    val docs = rows.map(_.getLong(1))
    val toks = rows.map(_.getLong(2))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      "stages only remove documents")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b },
      "stages only remove tokens")
    rows.foreach(r =>
      assert(r.getLong(3) == r.getLong(2) * 1000000L / toks.head))
    // stage 1 == corpus; stage 2 == distinct texts (q40's universe)
    assert(docs.head == Tables.documents(spark, sf).count())
    val distinctTexts = Tables.documents(spark, sf)
      .select(md5($"text")).distinct().count()
    assert(docs(1) == distinctTexts,
      "exact-dedup stage keeps one doc per distinct text")
    // near-dup stage drops exactly the q41 doc_b survivors still present
    val dropB = ops.Dedup.q41MinhashLsh(spark, sf).collect()
      .map(_.getLong(1)).toSet
    val firstIds = Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5($"text")).orderBy($"doc_id")))
      .filter($"rn" === 1).select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(docs(2) == firstIds.count(id => !dropB.contains(id)),
      "near-dup stage recounted from q41's pairs")
  }

  test("q169: content-hash splitting provably never leaks; id splitting leaks the injected re-crawls") {
    import spark.implicits._
    val rows = ops.Round10.q169SplitLeakage(spark, sf).collect()
    assert(rows.length == 2)
    val byPolicy = rows.map(r => r.getString(0) -> r).toMap
    val content = byPolicy("by_content")
    val byId = byPolicy("by_id")
    assert(content.getLong(2) == 0 && content.getLong(3) == 0
      && content.getLong(4) == 0,
      "content-hash split leakage must be exactly zero — split is a function of the digest")
    assert(byId.getLong(2) > 0,
      "id split must leak: injected re-crawls land in different splits")
    assert(content.getLong(1) == byId.getLong(1),
      "both policies audit the same digest universe")
    // every leaked digest covers >= 2 docs by definition
    assert(byId.getLong(3) >= 2 * byId.getLong(2))
  }
}
