package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Second-JVM child that takes the store commit lock and holds it.
  * args: root holdMs marker — holdMs < 0 holds until killed. Writes
  * "held" to the marker INSIDE the lock body, "released" after exit.
  * No SparkSession: GraphStore.withCommitLock is plain NIO, so the child
  * starts in ~200 ms with only scala-library on the classpath.
  */
object LockHolderMain {
  def main(args: Array[String]): Unit = {
    val root = args(0); val holdMs = args(1).toLong; val marker = args(2)
    graft.cypher.GraphStore.withCommitLock(root, waitMs = 30000L) {
      Files.write(Paths.get(marker), "held".getBytes("UTF-8"))
      Thread.sleep(if (holdMs < 0) 3600000L else holdMs)
    }
    Files.write(Paths.get(marker), "released".getBytes("UTF-8"))
  }
}

/** Second-JVM child that performs indexed point writes against a shared
  * durable graph. args: root graphName loKey hiKey marker — SETs d.t on
  * Doc rows k in [lo, hi), each write a full open→run→publish with the
  * same conflict-retry loop a real writer needs (serialization failures
  * and GC'd-version reads retry). Writes "done" to the marker on success.
  */
object IndexWriterMain {
  def main(args: Array[String]): Unit = {
    val root = args(0); val name = args(1)
    val lo = args(2).toInt; val hi = args(3).toInt; val marker = args(4)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.datetime.java8API.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (k <- lo until hi) {
        // bounded retries (ADVICE r15): a DETERMINISTIC failure must fail
        // the suite with its cause, not wedge it in an infinite loop —
        // only genuine write-write conflict shapes are retried, and only
        // within a wall-clock deadline.
        var done = false
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        var last: Throwable = null
        while (!done) {
          try {
            val s = new graft.cypher.GraphSession(spark)
            s.openGraph(name, root)
            s.run(s"MATCH (d:Doc {k: $k}) SET d.t = 'w$k'")
            done = true
          } catch {
            case e: Throwable
                if (e.getMessage != null &&
                  e.getMessage.contains("could not serialize")) ||
                  e.isInstanceOf[org.apache.spark.SparkException] ||
                  e.isInstanceOf[java.io.FileNotFoundException] =>
              last = e
              if (System.nanoTime() > deadline) throw last
          }
        }
      }
      Files.write(Paths.get(marker), "done".getBytes("UTF-8"))
    } finally spark.stop()
  }
}

/** Cross-PROCESS commit-lock behavior (VERDICT r12 #4): the r12 redesign's
  * whole point is that `FileChannel.tryLock` serializes across OS
  * processes and the kernel frees a dead holder's lock — WriteSpec hammers
  * same-JVM contention, this spec exercises the actual multi-writer
  * deployment path with a second JVM.
  */
class StoreProcSpec extends AnyFunSuite {

  private def spawn(root: String, holdMs: Long, marker: String): Process = {
    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    new ProcessBuilder(java, "-cp", System.getProperty("java.class.path"),
      "graft.LockHolderMain", root, holdMs.toString, marker)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .start()
  }

  private def awaitMarker(marker: String, want: String, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!(Files.exists(Paths.get(marker)) &&
        new String(Files.readAllBytes(Paths.get(marker)), "UTF-8") == want)) {
      assert(System.currentTimeMillis() < deadline, s"marker never became '$want'")
      Thread.sleep(20)
    }
  }

  test("waiter blocks while a second JVM holds the lock, acquires on its release") {
    val root = Files.createTempDirectory("graft_xproc").toString
    val marker = s"$root/marker.txt"
    val p = spawn(root, 2500, marker)
    try {
      awaitMarker(marker, "held")
      // a short-deadline attempt while the child holds must time out —
      // there is no takeover path by construction
      intercept[IllegalStateException] {
        graft.cypher.GraphStore.withCommitLock(root, waitMs = 300) { fail("acquired a held lock") }
      }
      // a generous-deadline attempt blocks, then wins once the child releases
      var acquired = false
      graft.cypher.GraphStore.withCommitLock(root, waitMs = 20000) { acquired = true }
      assert(acquired)
      // the child releases the flock BEFORE its post-body marker write, so
      // the parent may legally acquire in that window — await the marker
      // rather than asserting it instantly (was flaky under a loaded box)
      awaitMarker(marker, "released")
    } finally { p.destroyForcibly(); p.waitFor() }
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("SIGKILLed holder frees the lock immediately (kernel release, no staleness wait)") {
    val root = Files.createTempDirectory("graft_xproc_kill").toString
    val marker = s"$root/marker.txt"
    val p = spawn(root, -1, marker)
    try {
      awaitMarker(marker, "held")
      p.destroyForcibly()
      p.waitFor()
      val t0 = System.currentTimeMillis()
      var acquired = false
      graft.cypher.GraphStore.withCommitLock(root, waitMs = 5000) { acquired = true }
      val waited = System.currentTimeMillis() - t0
      assert(acquired)
      assert(waited < 2000, s"lock not freed promptly after holder kill (${waited}ms)")
    } finally { p.destroyForcibly(); p.waitFor() }
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("two JVMs interleave indexed point writes: chains exact and compacted (r15)") {
    // VERDICT r14 #5: StoreProcSpec proved the commit lock cross-process;
    // this proves the ivfa/pqc index CHAINS survive two processes
    // interleaving point writes and compactions — every write appends a
    // delta chain file under the lock, compaction merges whichever
    // writer's publish crosses the threshold, and the reopened probe must
    // still be exact with the chain folded, not grown per write.
    val spark = TestSpark.spark
    val root = Files.createTempDirectory("graft_xproc_idx").toString
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("xidx", root)
    (0 until 40).foreach { i =>
      val (bx, by) = if (i % 2 == 0) (0.0, 0.0) else (100.0, 100.0)
      s.run(s"CREATE (:Doc {k: $i, embedding: [${bx + (i / 2) * 0.5}, ${by + (i % 5) * 0.5}]})")
    }
    s.run("SELECT create_ivfflat_l2_ops_index('xidx', 'Doc', 'embedding', 2, 2)")
    s.run("SELECT create_pq_l2_ops_index('xidx', 'Doc', 'embedding', 2, 2, 4)")
    // child JVM writes k ∈ [20, 30) while this JVM writes k ∈ [0, 10)
    val marker = s"$root/writer.marker"
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    import scala.jdk.CollectionConverters._
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val p = new ProcessBuilder(
      (Seq(javaBin) ++ addOpens ++ Seq("-cp", System.getProperty("java.class.path"),
        "graft.IndexWriterMain", root, "xidx", "20", "30", marker)).asJava)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .start()
    try {
      for (k <- 0 until 10) {
        // bounded like the child's loop (ADVICE r15): deterministic
        // failures surface instead of wedging the suite before
        // awaitMarker's own deadline can fire
        var done = false
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        var last: Throwable = null
        while (!done) {
          try {
            val w = new graft.cypher.GraphSession(spark)
            w.openGraph("xidx", root)
            w.run(s"MATCH (d:Doc {k: $k}) SET d.t = 'w$k'")
            done = true
          } catch {
            case e: Throwable
                if (e.getMessage != null &&
                  e.getMessage.contains("could not serialize")) ||
                  e.isInstanceOf[org.apache.spark.SparkException] ||
                  e.isInstanceOf[java.io.FileNotFoundException] =>
              last = e
              if (System.nanoTime() > deadline) throw last
          }
        }
      }
      awaitMarker(marker, "done", timeoutMs = 240000)
    } finally { p.destroyForcibly(); p.waitFor() }
    // reopen cold: every one of the 20 writes visible exactly once
    val r = new graft.cypher.GraphSession(spark)
    r.openGraph("xidx", root)
    val rows = r.run("MATCH (d:Doc) WHERE d.t IS NOT NULL RETURN d.k AS k, d.t AS t ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    val expect = ((0 until 10) ++ (20 until 30)).map(k => (k.toLong, s"w$k"))
    assert(rows == expect, s"lost/duplicated indexed writes: $rows")
    assert(r.run("MATCH (d:Doc) RETURN count(*) AS n").collect().head.getLong(0) == 40L)
    // the stored index still probes exactly (doc 0 is (0.0, 0.0))
    val top = r.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [0.0, 0.0] LIMIT 1")
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L), top.toString)
    // chains are bounded: 20 interleaved writes crossed the compaction
    // threshold, so the final catalog carries a folded chain, not 21 lines
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    val nIvfa = cat.count(_.startsWith("ivfa Doc embedding "))
    val nPqc = cat.count(_.startsWith("pqc Doc embedding "))
    assert(nIvfa >= 1 && nIvfa <= 16, s"ivfa chain unbounded/missing: $nIvfa")
    assert(nPqc >= 1 && nPqc <= 16, s"pqc chain unbounded/missing: $nPqc")
    assert(cat.count(_.startsWith("file v Doc ")) < 64, "label manifest unbounded")
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }
}
