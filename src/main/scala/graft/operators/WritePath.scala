package graft.operators

import graft.cypher.GraphSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-oracled write-path rows (VERDICT r15 #2): CREATE / SET+REMOVE /
  * DELETE / MERGE mutate a fresh in-memory scratch graph, read back a
  * deterministic one-row summary (counts + sums + md5 of the sorted final
  * state), and the DuckDB oracle computes the same expected state
  * relationally from `range()` — value-level coverage for the four §2.1
  * write clauses that previously had only spec/golden-replay validation.
  *
  * Reference semantics: cypher_create.c:210-330 (clause-ordered
  * visibility), cypher_set.c / cypher_remove, cypher_delete.c (DETACH
  * cascade), cypher_merge.c:324-460 (match-or-create).
  *
  * Scale note: these are write-CLAUSE semantics probes on bounded scratch
  * graphs (200 nodes), not ingest benchmarks — the 100 TB write path is
  * the GraphStore publish/dv pipeline exercised by WriteSpec/StoreProcSpec.
  */
object WritePath {

  /** One-row digest of a (k, …) state: count, sums, and md5 over the
    * comma-joined SORTED `k:v` renderings (sort on the STRING — the
    * oracle mirrors with `ORDER BY (k || ':' || v)`, identical ASCII
    * order).
    */
  private def digest(df: DataFrame, pairs: org.apache.spark.sql.Column,
      aggs: (String, org.apache.spark.sql.Column)*): DataFrame = {
    val all = Seq(count(lit(1)).as("n"),
      md5(concat_ws(",", sort_array(collect_list(pairs)))).as("h")) ++
      aggs.map { case (n, c) => c.as(n) }
    df.agg(all.head, all.tail: _*)
  }

  private def fresh(s: SparkSession, name: String): GraphSession = {
    val gs = new GraphSession(s)
    gs.createGraph(name)
    gs
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CREATE: per-row node creation, then per-match-row edge creation
    // (one edge per (a,b) pair the MATCH yields — cypher_create.c:210).
    "w1_create" -> ((s, _) => {
      val gs = fresh(s, s"w1_${System.nanoTime()}")
      gs.run("UNWIND range(1, 200) AS i CREATE (:N {k: i, v: i * i % 97})")
      gs.run("MATCH (a:N), (b:N) WHERE b.k = a.k + 1 CREATE (a)-[:R {w: a.k % 7}]->(b)")
      val nodes = digest(gs.run("MATCH (n:N) RETURN n.k AS k, n.v AS v"),
        concat_ws(":", col("k"), col("v")), "sum_v" -> sum(col("v")))
        .select(col("n").as("n_nodes"), col("sum_v"), col("h").as("h_nodes"))
      val edges = digest(
        gs.run("MATCH (a:N)-[r:R]->(b:N) RETURN a.k AS ak, b.k AS bk, r.w AS w"),
        concat_ws(":", col("ak"), col("bk"), col("w")), "sum_w" -> sum(col("w")))
        .select(col("n").as("n_edges"), col("sum_w"), col("h").as("h_edges"))
      nodes.crossJoin(edges)
    }),

    // SET (expression over current value) + REMOVE (property drop → NULL)
    "w2_set_remove" -> ((s, _) => {
      val gs = fresh(s, s"w2_${System.nanoTime()}")
      gs.run("UNWIND range(1, 200) AS i CREATE (:N {k: i, v: i % 13, tag: 'x'})")
      gs.run("MATCH (n:N) WHERE n.k % 3 = 0 SET n.v = n.v + 1000")
      gs.run("MATCH (n:N) WHERE n.k % 4 = 0 REMOVE n.tag")
      digest(gs.run("MATCH (n:N) RETURN n.k AS k, n.v AS v, n.tag AS tag"),
        concat_ws(":", col("k"), col("v"), coalesce(col("tag"), lit("-"))),
        "sum_v" -> sum(col("v")),
        "n_tagged" -> count(col("tag")))
        .select(col("n").as("n_nodes"), col("sum_v"), col("n_tagged"), col("h"))
    }),

    // DETACH DELETE: node removal cascades to incident edges
    "w3_detach_delete" -> ((s, _) => {
      val gs = fresh(s, s"w3_${System.nanoTime()}")
      gs.run("UNWIND range(1, 200) AS i CREATE (:N {k: i})")
      gs.run("MATCH (a:N), (b:N) WHERE b.k = a.k + 1 CREATE (a)-[:R]->(b)")
      gs.run("MATCH (n:N) WHERE n.k % 5 = 0 DETACH DELETE n")
      val nodes = digest(gs.run("MATCH (n:N) RETURN n.k AS k"),
        col("k").cast("string"), "sum_k" -> sum(col("k")))
        .select(col("n").as("n_nodes"), col("sum_k"), col("h").as("h_nodes"))
      val edges = digest(gs.run("MATCH (a:N)-[:R]->(b:N) RETURN a.k AS ak, b.k AS bk"),
        concat_ws(":", col("ak"), col("bk")))
        .select(col("n").as("n_edges"), col("h").as("h_edges"))
      nodes.crossJoin(edges)
    }),

    // MERGE: lateral match-or-create once per distinct binding — nodes
    // 1..20 already carry the pattern (match), 21..50 get the WHOLE
    // unmatched pattern created (edge + fresh :T node each,
    // cypher_merge.c:324-460); the re-run is a pure no-op. (An UNWIND-fed
    // `MERGE ({k: i})` would exercise nothing: the reference's create
    // path can't materialize props drawn from a previous clause's row and
    // creates NOTHING — the replicated quirk, new cypher_merge.out:139-151.)
    "w4_merge" -> ((s, _) => {
      val gs = fresh(s, s"w4_${System.nanoTime()}")
      gs.run("UNWIND range(1, 50) AS i CREATE (:N {k: i})")
      gs.run("MATCH (n:N) WHERE n.k <= 20 CREATE (n)-[:R]->(:T {v: 0})")
      gs.run("MATCH (n:N) MERGE (n)-[:R]->(:T {v: 0})")
      gs.run("MATCH (n:N) MERGE (n)-[:R]->(:T {v: 0})") // idempotent re-run
      digest(gs.run("MATCH (n:N)-[:R]->(t:T) RETURN n.k AS k, t.v AS v"),
        concat_ws(":", col("k"), col("v")), "sum_k" -> sum(col("k")))
        .select(col("n").as("n_pairs"), col("sum_k"), col("h"))
    })
  )

  val oracles: Map[String, String] = Map(
    "w1_create" ->
      """WITH n AS (SELECT i AS k, (i * i) % 97 AS v FROM range(1, 201) t(i)),
        |     e AS (SELECT a.k AS ak, b.k AS bk, a.k % 7 AS w
        |           FROM n a JOIN n b ON b.k = a.k + 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS n_nodes,
        |       (SELECT CAST(SUM(v) AS BIGINT) FROM n) AS sum_v,
        |       (SELECT md5(string_agg(k || ':' || v, ',' ORDER BY (k || ':' || v))) FROM n) AS h_nodes,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT CAST(SUM(w) AS BIGINT) FROM e) AS sum_w,
        |       (SELECT md5(string_agg(ak || ':' || bk || ':' || w, ',' ORDER BY (ak || ':' || bk || ':' || w))) FROM e) AS h_edges
        |""".stripMargin,
    "w2_set_remove" ->
      """WITH n AS (SELECT i AS k,
        |             CASE WHEN i % 3 = 0 THEN i % 13 + 1000 ELSE i % 13 END AS v,
        |             CASE WHEN i % 4 = 0 THEN NULL ELSE 'x' END AS tag
        |           FROM range(1, 201) t(i))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |       CAST(SUM(v) AS BIGINT) AS sum_v,
        |       CAST(COUNT(tag) AS BIGINT) AS n_tagged,
        |       md5(string_agg(k || ':' || v || ':' || COALESCE(tag, '-'), ','
        |           ORDER BY (k || ':' || v || ':' || COALESCE(tag, '-')))) AS h
        |FROM n""".stripMargin,
    "w3_detach_delete" ->
      """WITH n AS (SELECT i AS k FROM range(1, 201) t(i) WHERE i % 5 <> 0),
        |     e AS (SELECT a.i AS ak, b.i AS bk
        |           FROM range(1, 201) a(i) JOIN range(1, 201) b(i) ON b.i = a.i + 1
        |           WHERE a.i % 5 <> 0 AND b.i % 5 <> 0)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS n_nodes,
        |       (SELECT CAST(SUM(k) AS BIGINT) FROM n) AS sum_k,
        |       (SELECT md5(string_agg(CAST(k AS VARCHAR), ',' ORDER BY CAST(k AS VARCHAR))) FROM n) AS h_nodes,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT md5(string_agg(ak || ':' || bk, ',' ORDER BY (ak || ':' || bk))) FROM e) AS h_edges
        |""".stripMargin,
    "w4_merge" ->
      """WITH p AS (SELECT i AS k, 0 AS v FROM range(1, 51) t(i))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       md5(string_agg(k || ':' || v, ',' ORDER BY (k || ':' || v))) AS h
        |FROM p""".stripMargin
  )
}
