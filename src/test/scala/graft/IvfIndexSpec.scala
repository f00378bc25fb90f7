package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVFFlat-analog index surface: textual DDL
  * (create_ivfflat_{l2,ip}_ops_index — reference
  * sql/postgraph.sql.in:151-158, ivfutils.c) + the planner-style rewrite
  * of `ORDER BY v.prop <-> <vec> LIMIT k` onto probed candidate lists.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkSession(): graft.cypher.GraphSession = {
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("ivfg")
    // 40 Doc vertices on a 2-D grid: two well-separated clouds around
    // (0,0) and (100,100) so lists=2 clusters them deterministically
    (0 until 40).foreach { i =>
      val (bx, by) = if (i % 2 == 0) (0.0, 0.0) else (100.0, 100.0)
      val x = bx + (i / 2) * 0.5
      val y = by + (i % 5) * 0.5
      s.run(s"CREATE (:Doc {k: $i, embedding: [$x, $y]})")
    }
    s
  }

  test("create_ivfflat_l2_ops_index DDL + probed ANN matches brute force") {
    val s = mkSession()
    val void = s.run("SELECT create_ivfflat_l2_ops_index('ivfg', 'Doc', 'embedding', 2, 2)")
    assert(void.columns.toSeq == Seq("create_ivfflat_l2_ops_index"))
    val q = "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [1.0, 1.0] LIMIT 5"
    val indexed = s.run(q).collect().map(_.getLong(0)).toSeq
    // brute force on a fresh session (no index) — identical top-5: the
    // query point sits inside the (0,0) cloud, whose list the probe keeps
    val s2 = new graft.cypher.GraphSession(spark)
    s2.createGraph("ivfg2")
    (0 until 40).foreach { i =>
      val (bx, by) = if (i % 2 == 0) (0.0, 0.0) else (100.0, 100.0)
      val x = bx + (i / 2) * 0.5
      val y = by + (i % 5) * 0.5
      s2.run(s"CREATE (:Doc {k: $i, embedding: [$x, $y]})")
    }
    val brute = s2.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [1.0, 1.0] LIMIT 5")
      .collect().map(_.getLong(0)).toSeq
    assert(indexed == brute)
  }

  test("probe restricts the scan to the near list; probes GUC widens it") {
    val s = mkSession()
    s.run("SELECT create_ivfflat_l2_ops_index('ivfg', 'Doc', 'embedding', 2, 2)")
    // with 1 probe, a LIMIT above the near list's size still returns only
    // that list's members (IVFFlat recall trade at probes=1)
    val near = s.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [0.0, 0.0] LIMIT 40")
      .collect().map(_.getLong(0)).toSet
    assert(near.size < 40, s"probe did not restrict: ${near.size} rows")
    assert(near.forall(_ % 2 == 0), "far-cloud members leaked into the near list")
    // SET ivfflat.probes = 2 reaches both lists → full recall
    s.run("SET ivfflat.probes = 2")
    val all = s.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [0.0, 0.0] LIMIT 40")
      .collect().map(_.getLong(0)).toSet
    assert(all.size == 40)
  }

  test("index stays correct across writes (lazy assignment rebuild)") {
    val s = mkSession()
    s.run("SELECT create_ivfflat_l2_ops_index('ivfg', 'Doc', 'embedding', 2, 2)")
    s.run("CREATE (:Doc {k: 999, embedding: [0.1, 0.1]})")
    val top = s.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [0.1, 0.1] LIMIT 1")
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(999L)) // the post-build row is probed, not stale
  }

  test("non-matching shapes never rewrite (other props, DESC, no limit)") {
    val s = mkSession()
    s.run("SELECT create_ivfflat_l2_ops_index('ivfg', 'Doc', 'embedding', 2, 2)")
    // DESC order (farthest-first) must NOT use the index — all 40 rows rank
    val desc = s.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [0.0, 0.0] DESC LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    assert(desc.forall(_ % 2 == 1), "farthest docs are the far cloud")
    // no LIMIT → full result, no restriction
    val n = s.run(
      "MATCH (d:Doc) RETURN d.k AS k ORDER BY d.embedding <-> [0.0, 0.0]").count()
    assert(n == 40)
  }
}
