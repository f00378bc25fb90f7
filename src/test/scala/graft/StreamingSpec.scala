package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming tests: drive the file-source streams synchronously with
  * AvailableNow/processAllAvailable over the sf0.001 parquet fixtures.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** File-stream sources need a directory; stage the single-file fixture
    * into a temp dir.
    */
  private def staged(table: String): String = {
    val dir = Files.createTempDirectory(s"graft_src_$table")
    Files.copy(java.nio.file.Paths.get(s"$sf/$table.parquet"),
      dir.resolve(s"$table.parquet"))
    dir.toString
  }

  test("vertex ingest stream packs the same ids as the batch builder") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val batch = Tables.T(spark, sf, "customer")
    val q = Streams.vertexIngest(spark, staged("customer"),
      batch.schema, labelId = 7, keyCol = "c_custkey",
      outDir = s"$tmp/out", checkpointDir = s"$tmp/ck")
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$tmp/out")
    assert(streamed.count() == batch.count())
    val ids = streamed.select("id").collect().map(_.getLong(0))
    assert(ids.forall(i => (i >>> 48) == 7))
    val keys = streamed.select(col("id").bitwiseAND(lit((1L << 48) - 1)))
      .collect().map(_.getLong(0)).sorted
    val batchKeys = batch.select(col("c_custkey").cast("long")).collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == batchKeys.toSeq)
  }

  test("streaming ingest into a durable GraphStore is per-batch atomic and exactly-once (r12)") {
    val tmp = Files.createTempDirectory("graft_gstream").toString
    val root = s"$tmp/store"
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("gstream", root)
    val v0 = graft.cypher.GraphStore.latestVersion(root).get
    val batch = Tables.T(spark, sf, "nation")
    val src = spark.readStream.schema(batch.schema).parquet(staged("nation"))
    val q = Streams.graphStoreIngest(src, s, "Nation", "n_nationkey",
      checkpointDir = s"$tmp/ck")
    q.awaitTermination(60000)
    // the batch committed as one store version; contents queryable
    val v1 = graft.cypher.GraphStore.latestVersion(root).get
    assert(v1 > v0)
    val n = s.run("MATCH (x:Nation) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == batch.count())
    // REPLAY of an already-committed batch id is a no-op (idempotent sink)
    s.ingestVertexBatch("Nation", "n_nationkey", batch, appId = s"$tmp/ck", batchId = 0L)
    assert(graft.cypher.GraphStore.latestVersion(root).get == v1)
    assert(s.run("MATCH (x:Nation) RETURN count(*) AS n")
      .collect().head.getLong(0) == n)
    // …including after a RESTART: a fresh session reloads the batch marker
    val r = new graft.cypher.GraphSession(spark)
    r.openGraph("gstream", root)
    r.ingestVertexBatch("Nation", "n_nationkey", batch, appId = s"$tmp/ck", batchId = 0L)
    assert(graft.cypher.GraphStore.latestVersion(root).get == v1)
    assert(r.run("MATCH (x:Nation) RETURN count(*) AS n")
      .collect().head.getLong(0) == n)
    // a NEW batch id appends and bumps exactly one version
    import spark.implicits._
    val extra = Seq((900L, "ATLANTIS", 0L)).toDF(batch.columns: _*)
    r.ingestVertexBatch("Nation", "n_nationkey", extra, appId = s"$tmp/ck", batchId = 1L)
    assert(graft.cypher.GraphStore.latestVersion(root).get == v1 + 1)
    assert(r.run("MATCH (x:Nation {n_name: 'ATLANTIS'}) RETURN count(*) AS n")
      .collect().head.getLong(0) == 1L)
    // EDGE stream (batch-ingested here; the streaming wrapper is the same
    // foreachBatch shape as the vertex test above): customers → nations
    val cust = Tables.T(spark, sf, "customer").limit(50)
    r.ingestVertexBatch("Customer", "c_custkey", cust, appId = s"$tmp/ck2", batchId = 0L)
    r.ingestEdgeBatch("IN_NATION", "c_custkey",
      "Customer", "c_custkey", "Nation", "c_nationkey",
      cust.select(col("c_custkey"), col("c_nationkey")), s"$tmp/ck3", 0L)
    val paths = r.run(
      "MATCH (c:Customer)-[:IN_NATION]->(x:Nation) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(paths == 50L, s"edge ingest produced $paths joined paths")
    // edge replay is a no-op too
    val vE = graft.cypher.GraphStore.latestVersion(root).get
    r.ingestEdgeBatch("IN_NATION", "c_custkey",
      "Customer", "c_custkey", "Nation", "c_nationkey",
      cust.select(col("c_custkey"), col("c_nationkey")), s"$tmp/ck3", 0L)
    assert(graft.cypher.GraphStore.latestVersion(root).get == vE)
    // TIME TRAVEL (retention-bounded: only versions the two newest
    // catalogs reference survive gc): as-of the pre-edge version sees
    // the vertices but NO edges
    val tt = new graft.cypher.GraphSession(spark)
    tt.openGraph("gstream", root, asOfVersion = vE - 1)
    assert(tt.run("MATCH (x:Nation) RETURN count(*) AS n")
      .collect().head.getLong(0) == n + 1) // incl. ATLANTIS
    // the edge label does not EXIST yet at this version — same error a
    // never-created label gets (the catalog time-traveled too)
    intercept[Exception] {
      tt.run("MATCH (c:Customer)-[:IN_NATION]->(x:Nation) RETURN count(*) AS n").collect()
    }
    // …and is read-only by construction: a write fails OCC validation
    val e = intercept[Exception] { tt.run("CREATE (:Nation {n_nationkey: 901})") }
    assert(e.getMessage.contains("could not serialize access due to concurrent update"))
    // a gc'd / never-written version errors with the retained list
    val e2 = intercept[IllegalArgumentException] {
      new graft.cypher.GraphSession(spark).openGraph("gstream", root, asOfVersion = 9999L)
    }
    assert(e2.getMessage.contains("not available"))
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(tmp))
  }

  /** Streaming view of events with the TIMESTAMP(NANOS) column normalized to
    * micros, mirroring Tables.T.
    */
  private def eventStream = {
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    // ts arrives as TIMESTAMP_NTZ (nanos truncated to micros by the parquet
    // reader); same normalization as Tables.T — cast to tz-aware under UTC
    spark.readStream.schema(schema).parquet(staged("events"))
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("upsert ingest replaces re-sent keys through deletion vectors, exactly-once (r12)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_gupsert").toString
    val root = s"$tmp/store"
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("gupsert", root)
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // batch 0: initial corpus; batch 1: one update + one insert
    s.ingestVertexUpsertBatch("Doc", "doc_id",
      docs(1L -> "a", 2L -> "b", 3L -> "c"), "up1", 0L)
    val v1 = graft.cypher.GraphStore.latestVersion(root).get
    s.ingestVertexUpsertBatch("Doc", "doc_id",
      docs(2L -> "b-v2", 4L -> "d"), "up1", 1L)
    assert(graft.cypher.GraphStore.latestVersion(root).get == v1 + 1)
    // the update committed through the dv path: old files carried, a
    // tombstone suppresses doc 2's old copy
    val v2 = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v2/catalog.txt").getLines().toList
    assert(cat.exists(_.startsWith("dvp v Doc ")), cat.mkString("; "))
    // replay of batch 1 is a no-op (restart contract)
    s.ingestVertexUpsertBatch("Doc", "doc_id",
      docs(2L -> "b-v2", 4L -> "d"), "up1", 1L)
    assert(graft.cypher.GraphStore.latestVersion(root).get == v2)
    // reopen: exactly-once rows, updated text visible once
    val r = new graft.cypher.GraphSession(spark)
    r.openGraph("gupsert", root)
    val rows = r.run("MATCH (d:Doc) RETURN d.text AS t ORDER BY t")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("a", "b-v2", "c", "d"), rows.toString)
    // and the streaming wrapper drives the same primitive
    val src = spark.readStream.schema(docs(1L -> "x").schema)
      .parquet { val d = s"$tmp/in"; docs(3L -> "c-v2").write.parquet(d); d }
    val q = Streams.graphStoreUpsertIngest(src, r, "Doc", "doc_id",
      checkpointDir = s"$tmp/ck")
    q.awaitTermination(60000)
    val r2 = new graft.cypher.GraphSession(spark)
    r2.openGraph("gupsert", root)
    val rows2 = r2.run("MATCH (d:Doc) RETURN d.text AS t ORDER BY t")
      .collect().map(_.getString(0)).toSeq
    assert(rows2 == Seq("a", "b-v2", "c-v2", "d"), rows2.toString)
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("sustained upsert ingest: bounded manifest, forced compactions, time travel stays exact (r13)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_gupslong").toString
    val root = s"$tmp/store"
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("gupslong", root)
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val expected = scala.collection.mutable.Map.empty[Long, String]
    (1L to 50L).foreach(i => expected(i) = s"t$i")
    s.ingestVertexUpsertBatch("Doc", "doc_id", docs(expected.toSeq), "app", 0L)
    // 60 CDC batches: 3 key updates + 1 insert each. The dv path takes
    // most batches; the 64-line manifest bound and the 4096-tombstone
    // budget must force periodic self-compactions (full rewrites) that
    // keep open-time cost and store size bounded — this is the steady
    // state a 100 TB CDC ingest lives in.
    var maxLines = 0
    var compactions = 0
    (1 to 60).foreach { b =>
      val upd = (1 to 3).map { j =>
        val k = (b * 3 + j) % 50 + 1L; val t = s"u$b-$j"; expected(k) = t; (k, t)
      } :+ { val k = 50L + b; val t = s"n$b"; expected(k) = t; (k, t) }
      s.ingestVertexUpsertBatch("Doc", "doc_id", docs(upd), "app", b.toLong)
      val v = graft.cypher.GraphStore.latestVersion(root).get
      val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
      val lines = cat.count(l => l.startsWith("file v Doc ") || l.startsWith("dvp v Doc "))
      maxLines = math.max(maxLines, lines)
      if (cat.exists(_.startsWith("vlabel Doc "))) compactions += 1
    }
    // the 64-line check fires BEFORE a statement adds its own ≤2 lines, so
    // the chain peaks at 65 — bounded, never growing past one batch's delta
    assert(maxLines <= 66, s"manifest chain blew past the compaction bound: $maxLines")
    assert(compactions >= 1,
      "60 dv batches never forced a self-compaction — the bound is not engaging")
    // store size stays bounded: gc retains the two newest catalogs' refs
    val vers = java.nio.file.Files.list(java.nio.file.Paths.get(root)).iterator()
    val nVers = scala.jdk.CollectionConverters.IteratorHasAsScala(vers).asScala
      .count(_.getFileName.toString.matches("v\\d+"))
    assert(nVers <= 70, s"gc left $nVers version dirs after 61 publishes")
    // exactly-once + last-writer-wins across the whole run
    val r = new graft.cypher.GraphSession(spark)
    r.openGraph("gupslong", root)
    val got = r.run("MATCH (d:Doc) RETURN d.doc_id AS k, d.text AS t")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got.size == 110, s"expected 110 rows, got ${got.size}")
    assert(got == expected.toMap,
      (got.toSet -- expected.toSet).take(5).toString + " / " +
        (expected.toSet -- got.toSet).take(5).toString)
    // time travel to the previous version (survives gc by construction):
    // exactly the last batch's delta is missing
    val vLast = graft.cypher.GraphStore.latestVersion(root).get
    val tt = new graft.cypher.GraphSession(spark)
    tt.openGraph("gupslong", root, asOfVersion = vLast - 1)
    val old = tt.run("MATCH (d:Doc) RETURN d.doc_id AS k, d.text AS t")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(old.size == 109, s"as-of previous: ${old.size}")
    assert(old.contains(109L)) // batch 59's insert is present
    assert(!old.contains(110L), "batch 60's insert leaked into the previous version")
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("streaming upsert maintains stored index entries — reopened probe runs no passes (r14)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_gupsidx").toString
    val root = s"$tmp/store"
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("gupsidx", root)
    def docs(rows: Seq[(Long, Seq[Double])]) = rows.toDF("doc_id", "embedding")
    // batch 0: two well-separated clouds (even near (0,0), odd far)
    val base = (0 until 40).map { i =>
      val (bx, by) = if (i % 2 == 0) (0.0, 0.0) else (100.0, 100.0)
      (i.toLong, Seq(bx + (i / 2) * 0.5, by + (i % 5) * 0.5))
    }
    s.ingestVertexUpsertBatch("Doc", "doc_id", docs(base), "appix", 0L)
    s.run("SELECT create_ivfflat_l2_ops_index('gupsidx', 'Doc', 'embedding', 2, 2)")
    s.run("SELECT create_pq_l2_ops_index('gupsidx', 'Doc', 'embedding', 2, 2, 4)")
    // 4 CDC batches through the publish hooks: doc 2 MOVES clouds in
    // batch 2, each batch also inserts a far-cloud doc — every publish
    // must append an index-entry DELTA, never drop the chain
    (1 to 4).foreach { b =>
      val upd: Seq[(Long, Seq[Double])] =
        (if (b == 2) Seq(2L -> Seq(100.0, 100.0)) else Seq.empty) :+
          ((100L + b) -> Seq(101.0 + b, 100.0))
      s.ingestVertexUpsertBatch("Doc", "doc_id", docs(upd), "appix", b.toLong)
    }
    // ... and one batch through the streaming wrapper itself
    val src = spark.readStream.schema(docs(base).schema).parquet {
      val d = s"$tmp/in"; docs(Seq(110L -> Seq(102.0, 101.0))).write.parquet(d); d
    }
    Streams.graphStoreUpsertIngest(src, s, "Doc", "doc_id", s"$tmp/ck")
      .awaitTermination(60000)
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    assert(cat.count(_.startsWith("ivfa Doc embedding ")) >= 2,
      "streaming upserts did not keep the ivfa entry chain: " + cat.mkString("; "))
    assert(cat.count(_.startsWith("pqc Doc embedding ")) >= 2,
      "streaming upserts did not keep the pqc entry chain: " + cat.mkString("; "))
    // reopen in a fresh session: probes answer from the STORED entries —
    // zero k-means / assignment / encode passes
    val km0 = graft.functions.Ivf.kmeansBuilds.get()
    val as0 = graft.functions.Ivf.assignBuilds.get()
    val en0 = graft.functions.Ivf.encodeBuilds.get()
    val r = new graft.cypher.GraphSession(spark)
    r.openGraph("gupsidx", root)
    // doc 2's stale near-list entry is a recall-safe superset candidate —
    // the exact rerank orders it LAST (its true position is the far
    // cloud), so the top-19 are exactly the 19 true near-cloud docs
    val near = r.run(
      "MATCH (d:Doc) RETURN d.doc_id AS k ORDER BY d.embedding <-> [0.0, 0.0] LIMIT 19")
      .collect().map(_.getLong(0)).toSet
    assert(near.size == 19 && !near.contains(2L),
      s"moved doc outranked a true near doc — entry delta not applied: $near")
    assert(near.forall(k => k % 2 == 0), s"far-cloud docs leaked: $near")
    val far = r.run(
      "MATCH (d:Doc) RETURN d.k AS k, d.doc_id AS i ORDER BY d.embedding <-> [102.0, 101.0] LIMIT 1")
      .collect().map(_.getLong(1)).toSeq
    assert(far == Seq(110L), far.toString)
    assert(graft.functions.Ivf.kmeansBuilds.get() == km0, "reopened probe re-ran k-means")
    assert(graft.functions.Ivf.assignBuilds.get() == as0,
      "reopened probe re-derived assignments despite streamed entry deltas")
    assert(graft.functions.Ivf.encodeBuilds.get() == en0,
      "reopened probe re-encoded the corpus despite streamed entry deltas")
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("watermarked windowed aggregation over the events stream") {
    val fixed = eventStream
    val agg = Streams.windowedEventCounts(fixed, watermark = "1 hour", window_ = "6 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; check a prefix matches batch
    val streamed = spark.sql("SELECT win_start, event_type, n FROM win_counts")
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2))).toSet // java8API: Instant
    val expected = Streams.windowedEventCounts(
      Tables.T(spark, sf, "events"), watermark = "1 hour", window_ = "6 hours")
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2))).toSet // java8API: Instant
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(expected))
  }

  test("per-user activity aggregation (update-mode state)") {
    val q = Streams.perUserActivity(eventStream).writeStream
      .outputMode("complete").format("memory").queryName("user_act")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT user_id, n_events FROM user_act")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.T(spark, sf, "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("streaming exact dedup drops duplicate fingerprints within watermark") {
    import spark.implicits._
    // two copies of every doc text, one second apart
    val docs = Tables.T(spark, sf, "documents").limit(20)
      .select(col("doc_id"), col("text"))
    val tmp = Files.createTempDirectory("graft_dedup").toString
    docs.withColumn("ingest_ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .unionByName(docs.withColumn("ingest_ts", lit("2024-01-01 00:00:01").cast("timestamp")))
      .coalesce(1).write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val q = Streams.dedupIngest(stream, "ingest_ts").writeStream
      .outputMode("append").format("memory").queryName("dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.sql("SELECT fp FROM dedup_out").collect().map(_.getString(0))
    assert(out.length == 20, s"expected 20 unique docs, got ${out.length}")
    assert(out.distinct.length == 20)
  }

  test("streaming near-dup detection flags corpus near-copies at ingest") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_neardup").toString
    // incoming batch: one near-copy of corpus doc 0 (append two words),
    // one exact copy of doc 1, one fresh unrelated doc
    val corpus = Tables.T(spark, sf, "documents")
    val t0 = corpus.filter(col("doc_id") === 0).select(col("text")).head.getString(0)
    val t1 = corpus.filter(col("doc_id") === 1).select(col("text")).head.getString(0)
    Seq((100000L, t0 + " trailing addition"), (100001L, t1),
        (100002L, "completely unrelated fresh words nothing shared here at all"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val index = graft.operators.Dedup.bandIndex(spark, sf)
    val q = Streams.nearDupIngest(stream, index).writeStream
      .outputMode("append").format("memory").queryName("neardup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val hits = spark.sql("SELECT DISTINCT doc_id, corpus_doc FROM neardup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((100000L, 0L)), s"near-copy of doc 0 not flagged: $hits")
    assert(hits.contains((100001L, 1L)), s"exact copy of doc 1 not flagged: $hits")
    assert(!hits.exists(_._1 == 100002L), s"fresh doc spuriously flagged: $hits")
  }

  test("streaming quality + BM25 scoring at ingest matches the batch scorer (r11)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_scoreingest").toString
    val terms = Seq("hash", "merge", "window")
    val corpus = Tables.T(spark, sf, "documents")
    val stats = Streams.bm25CorpusStats(corpus, terms).localCheckpoint()
    // incoming docs drawn FROM the corpus so the batch t7 scorer is the
    // ground truth for the streaming result
    val in = corpus.filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text"))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    in.coalesce(1).write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val q = Streams.scoreIngest(stream, stats, terms).writeStream
      .outputMode("append").format("memory").queryName("score_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT doc_id, quality, bm25 FROM score_out")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(streamed.size == 5)
    // batch ground truth: same formulas over the same stats row
    val batch = Streams.scoreIngest(in, stats, terms)
      .collect().map(r => (r.getLong(0), (r.getDouble(2), r.getDouble(3)))).toMap
    // same kernels in micro-batch vs batch execution → identical values
    for ((id, (bq, bb)) <- batch) {
      assert(streamed(id)._1 == bq, s"quality mismatch for $id")
      assert(streamed(id)._2 == bb, s"bm25 mismatch for $id")
    }
    // scores against the corpus stats are sane: some doc hits a query term
    assert(batch.values.exists(_._2 > 0))
  }

  test("flatMapGroupsWithState sessionization closes sessions at the gap") {
    import spark.implicits._
    val gap = 60L * 1000000L // 1 minute
    // user 1: two sessions (3 events, then 2); user 2: one session
    val events = Seq(
      Streams.SessionEvent(1L, 0L), Streams.SessionEvent(1L, 10000000L),
      Streams.SessionEvent(1L, 20000000L),
      Streams.SessionEvent(1L, 200000000L), Streams.SessionEvent(1L, 210000000L),
      Streams.SessionEvent(2L, 0L), Streams.SessionEvent(2L, 30000000L))
    val tmp = Files.createTempDirectory("graft_sess").toString
    events.toDF().coalesce(1).write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema)
      .parquet(s"$tmp/in").as[Streams.SessionEvent]
    val q = Streams.sessionize(stream, gap).writeStream
      .outputMode("append").format("memory").queryName("sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // only CLOSED sessions are emitted: user 1's first session (3 events);
    // the still-open tails stay in state
    val rows = spark.sql("SELECT user_id, n_events, start_us, end_us FROM sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 3L, 0L, 20000000L)))
  }

  test("streaming sequence packer emits the same closed bins as batch d8") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    // same inputs as d8: (lang, doc_id, whitespace token count)
    val docs = graft.Tables.T(spark, sf, "documents")
      .select(col("lang"), col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[Streams.PackDoc].collect().sortBy(d => (d.lang, d.doc_id))
    val tmp = Files.createTempDirectory("graft_pack").toString
    docs.toSeq.toDF().coalesce(1).write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema)
      .parquet(s"$tmp/in").as[Streams.PackDoc]
    val q = Streams.packStream(stream, budget = 2048L).writeStream
      .outputMode("append").format("memory").queryName("packed")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT lang, bin, n_docs, bin_tokens FROM packed")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch reference: every d8 bin except each language's LAST (still open
    // in the stream's state, not emitted)
    val batch = graft.operators.Pipeline.queries("d8_sequence_pack")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastBin = batch.groupBy(_._1).map { case (l, bs) => l -> bs.map(_._2).max }
    val closed = batch.filterNot { case (l, b, _, _) => lastBin(l) == b }.toSet
    assert(streamed == closed, s"streamed=${streamed.size} closedBatch=${closed.size}")
  }
}
