package graft

import java.nio.file.Files

import graft.sources.{GraftDV, GraftVersions}

/** Round-15 advisor fixes, each with the failure it closes:
  *
  *  - optimistic concurrency counts equality-delete mask growth as a
  *    conflicting touch (the fingerprint used to omit `eq`, so a COW
  *    rewrite planned before a concurrent `delete-equality` would land
  *    files without the value mask and resurrect the deleted rows);
  *  - the change feed fails LOUDLY on retention holes mid-range
  *    (tag-pinning vacuum retains non-contiguous versions; the old
  *    skip-and-re-snapshot both lost the expired commit's changes and
  *    re-emitted every carried row as an insert at the wrong version);
  *  - concat compaction honors targetFiles for eq-FREE files even when
  *    eq-masked neighbors force their own bins (they used to collapse
  *    into a single bin);
  *  - `_row_id` / `_row_commit_version` join the reserved-name set for
  *    ADD/RENAME COLUMN (an added `_row_id` would shadow row lineage);
  *  - vacuum sweeps stale `v*-*.tmp` commit temps under _versions
  *    (crash debris nothing else reclaims), mtime-guarded so an
  *    in-flight writer's temp is never touched.
  */
class Round15Spec extends SparkSpec {

  private def freshCatalog(tag: String): (String, java.nio.file.Path) = {
    val wh = Files.createTempDirectory(s"graft_r15_$tag")
    val cat = s"r15_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }
  private def dropCatalog(cat: String, wh: java.nio.file.Path): Unit = {
    spark.conf.unset(s"spark.sql.catalog.$cat")
    spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    org.apache.commons.io.FileUtils.deleteDirectory(wh.toFile)
  }
  private def docsRange(rows: Int) =
    spark.read.format("graft.sources.GraftDocsSource")
      .option("rows", rows.toString).load()

  test("optimistic concurrency: equality-delete mask growth on a file " +
      "conflicts with a stale rewrite of it; disjoint scopes still land") {
    import GraftVersions.{FileEntry, ConcurrentCommitException}
    val root = Files.createTempDirectory("graft_r15_occ_eq")
    try {
      GraftVersions.enable(root) // v0
      val a = FileEntry("part-00000-a.tsv", FileEntry.NoStats,
        rows = Some(10L), bytes = Some(100L))
      val b = FileEntry("part-00001-b.tsv", FileEntry.NoStats,
        rows = Some(10L), bytes = Some(100L))
      GraftVersions.advance(root, "append", Some(Set.empty), Seq(a, b)) // v1
      // concurrent equality delete grows ONLY a.eq — every other
      // fingerprint member of `a` is untouched
      GraftVersions.advance(root, "delete-equality", Some(Set(a.name)),
        Seq(a.copy(eq = Some(GraftDV.of(Seq(3L))))),
        readVersion = Some(1L)) // v2
      // a COW rewrite of A planned against v1 would re-materialize the
      // value-masked rows: eq growth must count as a conflicting touch
      val e = intercept[ConcurrentCommitException] {
        GraftVersions.advance(root, "update", Some(Set(a.name)),
          Seq(a.copy(name = "part-00000-a2.tsv")), readVersion = Some(1L))
      }
      assert(e.getMessage.contains("planned against snapshot v1"),
        e.getMessage)
      assert(GraftVersions.latest(root).get.version == 2L)
      // scope {B} saw no eq growth → rebases and lands
      val v3 = GraftVersions.advance(root, "update", Some(Set(b.name)),
        Seq(b.copy(name = "part-00001-b2.tsv")), readVersion = Some(1L))
      assert(v3.version == 3L)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("change feed: a retention hole mid-range fails loudly instead of " +
      "skipping the expired commit and re-snapshotting") {
    val (cat, wh) = freshCatalog("cdfhole")
    try {
      docsRange(4).coalesce(1)
        .writeTo(s"$cat.t").tableProperty("versioned", "true").create() // v0+v1
      spark.sql(s"INSERT INTO $cat.t VALUES (10, 'a', 1, 2)") // v2
      spark.sql(s"INSERT INTO $cat.t VALUES (11, 'b', 1, 2)") // v3
      spark.sql(s"INSERT INTO $cat.t VALUES (12, 'c', 1, 2)") // v4
      val tdir = wh.resolve("t")
      // tag v2, then retain {v2, v4}: v3 is the hole
      spark.sql(s"CALL $cat.system.tag('t', 'pin', 2)").collect()
      GraftVersions.vacuum(tdir, keepLast = 1)
      assert(GraftVersions.listVersionNumbers(tdir) == Seq(2L, 4L))
      // batch CDF [3, 4] starts at retained v2's successor but crosses
      // the expired v3: under the old skip logic v4 (whose v3 base is
      // gone) re-materialized as a FULL snapshot of inserts — every
      // carried row duplicated at the wrong commit_version
      val e = intercept[Exception] {
        spark.read.format("graft.sources.GraftDocsSource")
          .option("path", tdir.toString)
          .option("readChangeFeed", "true").option("startingVersion", "3")
          .load().collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
      assert(msgs.exists(m => m.contains("no longer retained") &&
        m.contains("version 3")), msgs.mkString(" | "))
      // [4, 4] anchors at the expired v3 (s = startingVersion - 1), so
      // the start-version guard fires — also loud, also restart-worthy
      val e2 = intercept[Exception] {
        spark.read.format("graft.sources.GraftDocsSource")
          .option("path", tdir.toString)
          .option("readChangeFeed", "true").option("startingVersion", "4")
          .load().collect()
      }
      val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause)
        .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
      assert(msgs2.exists(m => m.contains("no longer retained") ||
        m.contains("predates the retained history")),
        msgs2.mkString(" | "))
    } finally dropCatalog(cat, wh)
  }

  test("change feed: contiguous retained history is unaffected by the " +
      "hole guard (fresh stream still snapshots at the oldest retained)") {
    val (cat, wh) = freshCatalog("cdfok")
    try {
      docsRange(4).coalesce(1)
        .writeTo(s"$cat.t").tableProperty("versioned", "true").create() // v0+v1
      spark.sql(s"INSERT INTO $cat.t VALUES (10, 'a', 1, 2)") // v2
      spark.sql(s"INSERT INTO $cat.t VALUES (11, 'b', 1, 2)") // v3
      val tdir = wh.resolve("t")
      // contiguous batch range works
      val rows = spark.read.format("graft.sources.GraftDocsSource")
        .option("path", tdir.toString)
        .option("readChangeFeed", "true").option("startingVersion", "2")
        .load().collect()
      assert(rows.length == 2)
      // vacuum to a contiguous suffix {2,3}: a fresh stream's initial
      // snapshot at the oldest retained version is NOT a hole
      GraftVersions.vacuum(tdir, keepLast = 2)
      assert(GraftVersions.listVersionNumbers(tdir) == Seq(2L, 3L))
      val sink = Files.createTempDirectory("graft_r15_cdf_sink")
      val cp = Files.createTempDirectory("graft_r15_cdf_cp")
      try {
        val q = spark.readStream
          .format("graft.sources.GraftDocsSource")
          .option("path", tdir.toString).load()
          .writeStream.format("parquet")
          .option("checkpointLocation", cp.toString)
          .option("path", sink.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
        assert(spark.read.parquet(sink.toString).count() == 6L)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(sink.toFile)
        org.apache.commons.io.FileUtils.deleteDirectory(cp.toFile)
      }
    } finally dropCatalog(cat, wh)
  }

  test("concat compaction: eq-free files honor targetFiles even when " +
      "eq-masked neighbors bin apart") {
    val (cat, wh) = freshCatalog("concatbins")
    try {
      docsRange(40).repartitionByRange(5,
          org.apache.spark.sql.functions.col("doc_id"))
        .writeTo(s"$cat.t").tableProperty("versioned", "true")
        .tableProperty("delete.mode", "equality")
        .tableProperty("row.tracking", "true").create()
      spark.sql(s"DELETE FROM $cat.t WHERE doc_id = 5") // masks one file
      GraftVersions.compact(spark, wh.resolve("t"), targetFiles = 3)
      val v = GraftVersions.latest(wh.resolve("t")).get
      val (masked, free) = v.entries.partition(_.eq.isDefined)
      assert(masked.size == 1, v.entries.toString)
      // the four clean files fill TWO bins (targetFiles - 1 masked bin),
      // not one giant bin
      assert(free.size == 2, v.entries.toString)
      assert(spark.table(s"$cat.t").count() == 39L)
      // row ids survived the splice
      assert(spark.sql(s"SELECT _row_id FROM $cat.t").collect()
        .forall(!_.isNullAt(0)))
    } finally dropCatalog(cat, wh)
  }

  test("ALTER COLUMN: the row-lineage metadata names are reserved for " +
      "ADD and RENAME") {
    val (cat, wh) = freshCatalog("reserved")
    try {
      docsRange(5).coalesce(1)
        .writeTo(s"$cat.t").tableProperty("versioned", "true")
        .tableProperty("row.tracking", "true").create()
      for (n <- Seq("_row_id", "_row_commit_version")) {
        val e = intercept[Exception] {
          spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS ($n BIGINT)")
        }
        assert(e.getMessage.contains("already exists"), e.getMessage)
      }
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (tmp BIGINT)")
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN tmp TO _row_id")
      }
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
      // the metadata column still reads (nothing shadowed it)
      assert(spark.sql(s"SELECT _row_id FROM $cat.t").collect()
        .forall(!_.isNullAt(0)))
    } finally dropCatalog(cat, wh)
  }

  test("vacuum sweeps stale v*-*.tmp commit temps under _versions, " +
      "mtime-guarded") {
    val root = Files.createTempDirectory("graft_r15_tmpsweep")
    try {
      GraftVersions.enable(root) // v0
      GraftVersions.advance(root, "append", Some(Set.empty),
        Seq(GraftVersions.FileEntry("part-00000-x.tsv",
          GraftVersions.FileEntry.NoStats, rows = Some(1L),
          bytes = Some(10L)))) // v1
      val vdir = root.resolve("_versions")
      val staleSc = vdir.resolve("v00002-sc-dead.tmp")
      val staleMan = vdir.resolve("v00002-dead.tmp")
      val fresh = vdir.resolve("v00003-sc-live.tmp")
      Seq(staleSc, staleMan, fresh).foreach(Files.write(_,
        "debris".getBytes("UTF-8")))
      // age the stale pair past the 10-minute guard
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600L * 1000)
      Files.setLastModifiedTime(staleSc, old)
      Files.setLastModifiedTime(staleMan, old)
      GraftVersions.vacuum(root, keepLast = 10)
      assert(!Files.exists(staleSc) && !Files.exists(staleMan),
        "stale commit temps must be reclaimed")
      assert(Files.exists(fresh),
        "an in-flight writer's fresh temp must survive")
      // the log itself is intact
      assert(GraftVersions.listVersionNumbers(root) == Seq(0L, 1L))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }
}
