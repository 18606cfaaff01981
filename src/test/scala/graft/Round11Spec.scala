package graft

import org.apache.spark.sql.functions._

/** Round-11 specs: law-pinning and independent recounts for the
  * canonicalization-sensitivity, edit-distance-verification, and
  * median/MAD outlier audits (q197–q199).
  */
class Round11Spec extends SparkSpec {

  /** Collect WindowExec nodes, descending through AQE wrapper nodes
    * (QueryStageExec hides subtrees from the default traversal). */
  private def windowExecs(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = p.collect {
    case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      windowExecs(s.plan)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      windowExecs(a.executedPlan)
  }.flatten

  test("q197: canonical dedup re-merges exactly the injected jitter plus raw dup groups") {
    import spark.implicits._
    val r = ops.Round11.q197CanonicalDedup(spark, sf).collect().head
    val (n, rawU, canonU) = (r.getLong(0), r.getLong(1), r.getLong(4))
    assert(n > 0 && rawU <= n && canonU <= rawU,
      "canonicalization can only merge keys, never split them")
    // independent recount in plain Scala: the canonical key must equal
    // the ORIGINAL text's key (jitter is exactly what canon undoes on
    // this lowercase single-spaced corpus), so canon_unique ==
    // distinct original texts
    val texts = Tables.documents(spark, sf).select($"text")
      .collect().map(_.getString(0))
    assert(canonU == texts.distinct.length,
      "canonical dedup must recover the pre-jitter duplicate structure")
    // raw side: keys split by (doc_id%3, doc_id%5) jitter classes
    val rawKeys = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map { row =>
        val (id, t) = (row.getLong(0), row.getString(1))
        val b = if (id % 3 == 0) t.toUpperCase else t
        if (id % 5 == 0) "  " + b + " " else b
      }
    assert(rawU == rawKeys.distinct.length, "raw key recount")
    assert(r.getLong(7) == rawU - canonU, "canon_extra_docs arithmetic")
  }

  test("q198: verified pairs are a subset of q41 candidates and levenshtein is recomputed exactly") {
    import spark.implicits._
    val rows = ops.Round11.q198EditdistVerify(spark, sf).collect()
    assert(rows.nonEmpty, "the corpus has near-duplicates; some must verify")
    val cands = ops.Dedup.q41MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val text = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(cands((a, b)), s"($a,$b) not a q41 candidate")
      val (pa, pb) = (text(a).take(120), text(b).take(120))
      val l = lev(pa, pb)
      assert(r.getLong(2) == l, s"levenshtein mismatch for ($a,$b)")
      assert(r.getLong(3) == l * 1000000L / math.max(pa.length, pb.length))
      assert(r.getLong(3) <= 300000)
    }
    // ordered ascending by normalized distance
    val ppm = rows.map(_.getLong(3))
    assert(ppm.zip(ppm.tail).forall { case (x, y) => x <= y })
  }

  test("q199: median/MAD recount per language and the outlier rule is exact") {
    import spark.implicits._
    val rows = ops.Round11.q199MadOutliers(spark, sf).collect()
    val byLang = Tables.documents(spark, sf)
      .select($"lang", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet == byLang.keySet)
    def lowMed(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(((s.length + 1) / 2) - 1)
    }
    rows.foreach { r =>
      val lang = r.getString(0)
      val xs = byLang(lang).map(_._3).toSeq
      val med = lowMed(xs)
      val mad = lowMed(xs.map(x => math.abs(x - med)))
      assert(r.getLong(1) == xs.length, s"$lang n_docs")
      assert(r.getLong(2) == med, s"$lang median")
      assert(r.getLong(3) == mad, s"$lang MAD")
      val out = xs.count(x => math.abs(x - med) > 3 * mad)
      assert(r.getLong(4) == out, s"$lang outliers")
      assert(r.getLong(5) == out * 1000000L / xs.length)
    }
  }

  test("q199: every WindowExec in the executed plan is key-partitioned (two-level rank, no global sort)") {
    val df = ops.Round11.q199MadOutliers(spark, sf)
    df.collect()
    val wins = windowExecs(df.queryExecution.executedPlan)
    assert(wins.nonEmpty, "expected the block-rank windows to be present")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "q199 must not contain an unpartitioned window")
  }

  test("q200: Gini matches a driver-side recount and is invariant to tie order") {
    import spark.implicits._
    spark.catalog.clearCache() // isolate the self-containment assert below
    val r = ops.Round11.q200TokenGini(spark, sf).collect().head
    val freqs = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
      .filter(length($"t") > 0)
      .collect().map(_.getString(0))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val n = freqs.length.toLong
    val tot = freqs.sum
    assert(r.getLong(0) == n && r.getLong(1) == tot)
    // recount with an ARBITRARY tie order (sorted by value only) — the
    // rank·f sum must not depend on how equal frequencies are ordered
    val s = freqs.sorted.zipWithIndex
      .map { case (f, i) => (i + 1).toLong * f }.sum
    assert(r.getLong(2) == (2 * s - (n + 1) * tot) * 1000000L / (n * tot))
    assert(r.getLong(2) >= 0 && r.getLong(2) < 1000000L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "q200 must unpersist its frequency cache")
  }

  test("q201: HRW movement is exactly the docs whose new hash wins, about 1/17 of the corpus") {
    import spark.implicits._
    val rows = ops.Round11.q201HrwShards(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 16),
      "all 16 shards must be occupied")
    val n = rows.map(_.getLong(1)).sum
    val moved = rows.map(_.getLong(2)).sum
    // binomial(n, 1/17): mean n/17, sd sqrt(n·(1/17)(16/17)); 6σ guard
    val exp = n.toDouble / 17
    val sd = math.sqrt(n * (1.0 / 17) * (16.0 / 17))
    assert(math.abs(moved - exp) < 6 * sd + 1,
      s"moved=$moved expected≈$exp (n=$n)")
    // independent recount for a sample of docs
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long, s: Int): Long = {
      val hex = md.digest(s"$id:$s".getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val ids = Tables.documents(spark, sf).select($"doc_id")
      .collect().map(_.getLong(0))
    val mine = ids.map { id =>
      val hs = (0 until 16).map(s => h(id, s))
      val shard = hs.indexOf(hs.max)
      (shard, h(id, 16) > hs.max)
    }
    val mineByShard = mine.groupBy(_._1)
    rows.foreach { r =>
      val g = mineByShard(r.getInt(0))
      assert(r.getLong(1) == g.length, s"shard ${r.getInt(0)} occupancy")
      assert(r.getLong(2) == g.count(_._2), s"shard ${r.getInt(0)} moved")
    }
  }

  test("q202: bootstrap CI brackets the point estimate and replicates recount exactly") {
    import spark.implicits._
    val rows = ops.Round11.q202BootstrapCi(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), "lo <= hi")
      // the CI need not strictly contain the mean for tiny n, but on
      // this data the 2nd..63rd order statistics must bracket it
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(4),
        s"${r.getString(0)}: CI [${r.getLong(3)},${r.getLong(4)}] " +
          s"vs mean ${r.getLong(2)}")
    }
    // recount one source's replicate means in plain Scala
    val src = rows.head.getString(0)
    val docs = Tables.documents(spark, sf)
      .filter($"source" === src).select($"doc_id", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long, b: Int): Long = {
      val hex = md.digest(s"$id#$b".getBytes("UTF-8")).take(4)
        .map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val cum = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L,
      999916L, 999989L, 999998L)
    def w(uu: Long): Long = {
      val i = cum.indexWhere(uu < _); if (i < 0) 9L else i.toLong
    }
    val means = (0 until 64).flatMap { b =>
      val ws = docs.map { case (id, nc) => (w(u(id, b)), nc) }
      val sw = ws.map(_._1).sum
      if (sw > 0) Some(ws.map { case (x, nc) => x * nc }.sum / sw) else None
    }.sorted
    val r0 = rows.head
    assert(r0.getLong(3) == means(1), "lo = 2nd order statistic")
    assert(r0.getLong(4) == means(62), "hi = 63rd order statistic")
  }

  test("q203: moment matrix matches a driver-side recount and Cauchy-Schwarz holds") {
    import spark.implicits._
    val rows = ops.Round11.q203EmbeddingMoments(spark, sf).collect()
    assert(rows.length == 36)
    val vecs = Tables.embeddings(spark, sf).select($"embedding")
      .collect().map(_.getSeq[Float](0).toArray
        .map(x => math.floor(x.toDouble * 1000).toLong))
    val n = vecs.length.toLong
    val byIj = rows.map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    for { i <- 0 until 8; j <- i until 8 } {
      val r = byIj((i, j))
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val sxi = vecs.map(_(i)).sum
      val sxj = vecs.map(_(j)).sum
      assert(r.getLong(2) == n && r.getLong(3) == sxy)
      assert(r.getLong(4) == sxi && r.getLong(5) == sxj)
      assert(r.getLong(6) == n * sxy - sxi * sxj)
    }
    // diagonal entries are n·Var ≥ 0; off-diagonals obey Cauchy-Schwarz
    for { i <- 0 until 8; j <- i until 8 } {
      val c = byIj((i, j)).getLong(6)
      if (i == j) assert(c >= 0)
      else {
        val (vi, vj) = (byIj((i, i)).getLong(6), byIj((j, j)).getLong(6))
        assert(c.toDouble * c <= 1.0000001 * vi.toDouble * vj,
          s"|cov($i,$j)| exceeds sqrt(var·var)")
      }
    }
  }

  test("q204: containment is directional, bounded, and recounts from per-source fingerprint sets") {
    import spark.implicits._
    val rows = ops.Round11.q204SourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent per-source winnowing recount in plain Scala
    val docs = Tables.documents(spark, sf).select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val bySource = docs.groupBy(_._1).map { case (src, ds) =>
      val fps = ds.flatMap { case (_, t) =>
        val hs = (0 to t.length - 5).map(i => h(t.substring(i, i + 5)))
        if (hs.length < 8) Seq.empty
        else hs.sliding(8).map(_.min).toSeq
      }.toSet
      (src, fps)
    }
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(sa != sb)
      val (fa, fb) = (bySource(sa), bySource(sb))
      assert(r.getLong(2) == (fa & fb).size, s"($sa,$sb) intersection")
      assert(r.getLong(3) == fa.size, s"$sa set size")
      assert(r.getLong(4) == (fa & fb).size.toLong * 1000000L / fa.size)
      assert(r.getLong(4) <= 1000000L)
    }
  }

  test("q205: quintiles partition the corpus exactly and dup counts recount from q41") {
    import spark.implicits._
    val rows = ops.Round11.q205DupQualityBias(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 5L))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "quintiles must partition the corpus")
    // exact-quintile law: each cell is floor-balanced (sizes differ by <= 1
    // only when n is not divisible by 5; with blocked ranks they are exact)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles: ${sizes.toSeq}")
    val dupDocs = ops.Dedup.q41MinhashLsh(spark, sf)
      .select(explode(array($"doc_a", $"doc_b")).as("d")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == dupDocs,
      "per-quintile dup counts must sum to the distinct dup-doc count")
    rows.foreach(r =>
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1)))
  }

  test("q206: the audit counts misses on an imperfect synthetic blocking") {
    import spark.implicits._
    // "mint anvil"/"mint anvis": lev 1 but DIFFERENT head nouns — the
    // block loses the pair and recall must drop below 1e6
    val names = Seq("mint anvil", "mint anvis", "cold anvil", "gold anvil",
      "totally unrelated").toDF("p_name")
    val r = ops.Round11.blockingRecall(names).collect().head
    assert(r.getLong(0) == 5)
    // true pairs: (mint anvil, mint anvis) lev1 cross-block;
    // (cold anvil, gold anvil) lev1 same block;
    // (cold anvil, mint anvil)? lev("cold","mint") prefix... dist > 2; no
    assert(r.getLong(1) == 2, s"true pairs: ${r.getLong(1)}")
    assert(r.getLong(2) == 1 && r.getLong(3) == 1,
      "exactly one pair must be lost to the noun block")
    assert(r.getLong(4) == 500000L)
    // and on the corpus: recall is a valid ppm with truth > 0
    val c = ops.Round11.q206BlockingRecall(spark, sf).collect().head
    assert(c.getLong(1) > 0 && c.getLong(4) <= 1000000L)
    assert(c.getLong(2) + c.getLong(3) == c.getLong(1))
  }

  test("q207: threshold sweep is monotone and recounts from q41's verified pairs") {
    import spark.implicits._
    val rows = ops.Round11.q207DedupThresholds(spark, sf).collect()
    val jppm = ops.Dedup.q41MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1000000).toLong))
    rows.foreach { r =>
      val t = r.getLong(0)
      val surviving = jppm.filter(_._3 >= t)
      assert(r.getLong(1) == surviving.length, s"pairs at $t")
      assert(r.getLong(2) == surviving.map(_._2).distinct.length,
        s"dropped docs at $t")
    }
    // monotone: higher threshold, fewer pairs and fewer drops
    val byT = rows.sortBy(_.getLong(0))
    byT.zip(byT.tail).foreach { case (a, b) =>
      assert(a.getLong(1) >= b.getLong(1) && a.getLong(2) >= b.getLong(2))
    }
  }

  test("q208: template groups recount and share_ppm uses the corpus total") {
    import spark.implicits._
    val rows = ops.Round11.q208TemplateMining(spark, sf).collect()
    assert(rows.length == 15)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).take(5).mkString(" ")))
    val total = docs.length.toLong
    val groups = docs.groupBy(_._3)
    rows.foreach { r =>
      val g = groups(r.getString(0))
      assert(r.getLong(1) == g.length)
      assert(r.getLong(2) == g.map(_._2).distinct.length)
      assert(r.getLong(3) == g.map(_._1).min)
      assert(r.getLong(4) == g.length * 1000000L / total)
    }
    // ordered by group size desc
    val sizes = rows.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("q209: sampled-mean errors recount exactly and shrink with the rate") {
    import spark.implicits._
    val r = ops.Round11.q209SampleSufficiency(spark, sf).collect().head
    assert(r.getLong(0) == 20)
    // recount in plain Scala from the same membership hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long, t: String): Long = {
      val hex = md.digest(s"$id:$t".getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"text", $"n_chars").collect()
      .map(row => (row.getString(0), u(row.getLong(1), row.getString(2)),
        row.getLong(3)))
    def worst(cut: Long): Long = docs.groupBy(_._1).map { case (_, ds) =>
      val mean = ds.map(_._3).sum / ds.length
      val s = ds.filter(_._2 < cut)
      if (s.isEmpty) 1000000L
      else math.abs(s.map(_._3).sum / s.length - mean) * 1000000L / mean
    }.max
    assert(r.getLong(1) == worst(1), "rate 1/64")
    assert(r.getLong(2) == worst(4), "rate 1/16")
    assert(r.getLong(3) == worst(16), "rate 1/4")
  }

  test("q210: density sits in the winnowing band and the expression matches the composed form per source") {
    import spark.implicits._
    val rows = ops.Round11.q210WinnowDensity(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(4) > 0 && r.getLong(4) < 333333L,
        s"${r.getString(0)}: density ${r.getLong(4)} ppm above the " +
          "2/(w+1) selection bound")
      assert(r.getLong(3) <= r.getLong(2),
        "selected fps cannot exceed gram positions")
    }
    // this corpus's ~30-word vocabulary makes gram REPETITION collapse
    // per-doc distinct minima to ~0.1-1% — the very signal q77 reports;
    // the 2/(w+1) theory band applies to HIGH-ENTROPY text, pinned here
    // on synthetic unique strings (md5-hex chains: effectively random)
    val uniq = (0 until 50).map { i =>
      Iterator.iterate(s"seed$i")(s => java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString).drop(1).take(8).mkString
    }.toDF("text")
    val dens = uniq.select(
      sum(size(graft.functions.TextExprs
        .winnowedFingerprints($"text", 5, 8))).cast("long").as("nfp"),
      sum(length($"text") - 4).cast("long").as("grams")).collect().head
    val ppm = dens.getLong(0) * 1000000L / dens.getLong(1)
    assert(ppm > 150000L && ppm < 300000L,
      s"high-entropy density $ppm ppm should sit near 2/(w+1) = 222222")
    // n_windows accounting: wins = grams - 7 per doc, never negative
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) - 7 * r.getLong(1),
      "all docs here are longer than one window"))
  }

  test("q211: estimator rows bracket the truth and recount from first principles") {
    import spark.implicits._
    val rows = ops.Round11.q211MinhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 8)
      assert(r.getLong(1) == r.getLong(0) * 1000000L / 8)
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(3) <= r.getLong(5),
        "mean must sit between min and max")
      // q41 pairs are verified at jaccard >= 0.5
      assert(r.getLong(4) >= 500000L)
    }
    assert(rows.map(_.getLong(2)).sum ==
      ops.Dedup.q41MinhashLsh(spark, sf).count(),
      "every verified pair lands in exactly one estimator row")
    // full recount of the signature-match distribution in plain Scala
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String, off: Int): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(off, off + 8), 16)
    }
    def sig(t: String): Seq[Long] = {
      val w = t.split(" ").filter(_.nonEmpty)
      val sh = if (w.length < 3) Set.empty[String]
        else w.sliding(3).map(_.mkString(" ")).toSet
      (0 until 8).map(j => sh.map(s => h32(s"${j / 4}:$s", 8 * (j % 4))).min)
    }
    val sigs = docs.toMap.map { case (id, t) => (id, sig(t)) }
    val pairs = ops.Dedup.q41MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mine = pairs.map { case (a, b) =>
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
    }.groupBy(identity).map { case (m, xs) => (m, xs.length.toLong) }
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toMap == mine)
  }

  test("q212: tau recounts exactly from the sampled pairs and counts conserve") {
    import spark.implicits._
    val r = ops.Round11.q212KendallTau(spark, sf).collect().head
    val n = r.getLong(0)
    assert(r.getLong(1) == n * (n - 1) / 2, "pair count = C(n,2)")
    assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1),
      "concordant + discordant + tied must cover all pairs")
    // recount from the same sample definition: the k = 512 smallest
    // content hashes (bottomKByHash), NOT a rate — the fix that caps
    // the pair join at C(512,2) regardless of corpus size
    val md = java.security.MessageDigest.getInstance("MD5")
    def h15(id: Long, t: String): Long = {
      val hex = md.digest(s"$id:$t".getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val s = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"n_chars").collect()
      .map(row => (row.getLong(0), row.getString(1), row.getLong(2)))
      .sortBy { case (id, t, _) => (h15(id, t), id) }
      .take(512)
      .map { case (_, t, nc) =>
        val w = t.split(" ").filter(_.nonEmpty)
        (nc, w.distinct.length.toLong * 1000000L / w.length)
      }
    assert(n == s.length)
    val prods = for {
      i <- s.indices; j <- (i + 1) until s.length
    } yield (s(i)._1 - s(j)._1) * (s(i)._2 - s(j)._2)
    assert(r.getLong(2) == prods.count(_ > 0))
    assert(r.getLong(3) == prods.count(_ < 0))
    val (c, d) = (prods.count(_ > 0).toLong, prods.count(_ < 0).toLong)
    val np = prods.length.toLong
    val tau = if (c >= d) (c - d) * 1000000L / np
      else -((d - c) * 1000000L / np)
    assert(r.getLong(5) == tau)
  }

  test("bottomKByHash caps the relation at k and is a no-op when k >= n (q206/q212 bound)") {
    import spark.implicits._
    val names = (1 to 100).map(i => s"name $i").toDF("p_name")
    assert(ops.OpsUtil.bottomKByHash(names, Seq($"p_name"), $"p_name", 10)
      .count() == 10, "k < n must cap the relation at k rows")
    assert(ops.OpsUtil.bottomKByHash(names, Seq($"p_name"), $"p_name", 4096)
      .count() == 100, "k >= n must keep the whole relation")
    // membership is content-keyed: the k=10 sample over a re-shuffled
    // input is the identical row set (the q85/q110 determinism rule)
    val a = ops.OpsUtil.bottomKByHash(names, Seq($"p_name"), $"p_name", 10)
      .select($"p_name").collect().map(_.getString(0)).toSet
    val b = ops.OpsUtil.bottomKByHash(names.repartition(7), Seq($"p_name"),
      $"p_name", 10).select($"p_name").collect().map(_.getString(0)).toSet
    assert(a == b, "sample membership must be a pure function of content")
  }

  test("corpus fixture invariant: documents.text has no non-space whitespace at any SF (backs the q41 single-space-tokenizer / oracle regex-split equivalence)") {
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = Tables.documents(spark, dir)
        .filter($"text".rlike("[\\t\\n\\r\\u000B\\f\\u0085\\u00A0]"))
        .count()
      assert(n == 0, s"$dir: $n docs carry non-space whitespace — " +
        "DistinctWordGrams' single-space tokenizer would diverge from " +
        "the oracle's \\s+ split (Dedup.scala q41/q186/q211)")
    }
  }

  test("lowMedianByKey equals the naive per-key sorted median on adversarial synthetics") {
    import spark.implicits._
    // ties straddling block boundaries, values exactly at multiples of
    // 64, single-element keys, and a constant-valued key
    val data = Seq(
      ("a", 64L), ("a", 64L), ("a", 63L), ("a", 65L), ("a", 128L),
      ("b", 0L), ("b", 0L), ("b", 0L),
      ("c", 1000L),
      ("d", 127L), ("d", 128L), ("d", 129L), ("d", 130L))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    val df = data.toDF("k", "x", "tie")
    val got = ops.Round11.lowMedianByKey(df, "k", "x", "tie")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = data.groupBy(_._1).map { case (k, vs) =>
      val s = vs.map(_._2).sorted
      (k, s(((s.length + 1) / 2) - 1))
    }
    assert(got == want)
  }
}
