package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX bridge for whole-graph analytics (connected components, PageRank,
  * degrees) over a PropertyGraph — the "analytics queries via GraphX" half of
  * the engine (the reference has no whole-graph analytics; this is north-star
  * surface). Vertex attribute = label id (Int), edge attribute = edge label
  * id — attributes stay tiny so GraphX shuffles only ids, and results join
  * back to label tables by packed graphid when properties are needed.
  */
object Algorithms {

  def toGraphX(pg: PropertyGraph): Graph[Int, Int] = {
    val vertexRdd: RDD[(VertexId, Int)] = pg.vertexLabels.toSeq.sortBy(_._1).map {
      case (label, df) =>
        val lid = pg.labelIdOf(label)
        df.select("id").rdd.map(r => (r.getLong(0), lid))
    }.reduce(_ union _)
    val edgeRdd: RDD[Edge[Int]] = pg.edgeLabels.toSeq.sortBy(_._1).map {
      case (label, df) =>
        val lid = pg.labelIdOf(label)
        df.select("start_id", "end_id").rdd
          .map(r => Edge(r.getLong(0), r.getLong(1), lid))
    }.reduce(_ union _)
    Graph(vertexRdd, edgeRdd)
  }

  /** Connected components (undirected min-id propagation): (id, component). */
  def connectedComponents(pg: PropertyGraph): DataFrame = {
    val spark = pg.spark
    import spark.implicits._
    toGraphX(pg).connectedComponents().vertices
      .toDF("id", "component")
  }

  /** Static PageRank with `iters` iterations: (id, rank).
    *
    * A deterministic DataFrame loop (not GraphX staticPageRank) with the
    * textbook recurrence r₀ = 1, rₖ₊₁(v) = reset + (1−reset)·Σ rₖ(u)/deg(u)
    * over in-edges, no dangling redistribution — exactly the recurrence a
    * SQL recursive CTE can replay, which makes the result ORACLE-checkable
    * (GraphX's internal message order + normalization choices aren't).
    * Per iteration: one join on the out-weighted edge list + one aggregate
    * (2 shuffles); localCheckpoint keeps the plan flat across iterations —
    * the same shape scales as Pregel at 100 TB (shuffle keyed on dst).
    */
  def pageRank(pg: PropertyGraph, iters: Int, resetProb: Double = 0.15): DataFrame = {
    val e = pg.allEdges.select(col("start_id").as("src"), col("end_id").as("dst"))
    // out-degree-weighted edges, built once: (src, dst, w = 1/outdeg(src))
    val w = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint()
    // Iterate over CONTRIBUTIONS only: C_k(v) = Σ_{u→v} w(u,v)·r_{k-1}(u)
    // with r(u) = reset + (1-reset)·coalesce(C(u), 0). A vertex with no
    // in-edges has constant rank `reset` after step 1, so the all-vertices
    // relation joins exactly ONCE at the end — one join + one partial-agg
    // shuffle per iteration instead of two joins (the left_outer reset
    // re-join each step was the 3× r3 regression).
    def rank(inSum: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lit(resetProb) + lit(1 - resetProb) * coalesce(inSum, lit(0.0))
    // iteration 1 closed-form: every rank is 1.0
    var contribs = w.groupBy(col("dst")).agg(sum(col("w")).as("in_sum"))
    for (k <- 2 to iters) {
      contribs = w
        .join(contribs.select(col("dst").as("cid"), col("in_sum")),
          col("src") === col("cid"), "left_outer")
        .groupBy(col("dst")).agg(sum(col("w") * rank(col("in_sum"))).as("in_sum"))
      // flatten every few generations: each checkpoint is an eager job, but
      // unbounded lineage makes analysis superlinear — 4 balances the two
      // now that each generation is a single join+agg
      if (k % 4 == 0) contribs = contribs.localCheckpoint()
    }
    pg.allVertices.select(col("id"))
      .join(contribs, col("id") === col("dst"), "left_outer")
      .select(col("id"), rank(col("in_sum")).as("rank"))
  }

  /** Unweighted single-source shortest paths, level-synchronous BFS:
    * (id, d) for every vertex reachable from `src` within `maxHops`. One
    * join + one distinct + one anti join per level, frontier checkpointed —
    * the same shuffle-on-dst shape as the VLE expansion, with the visited
    * set as the only growing state. Level order gives minimal d by
    * construction, so a recursive CTE replays it exactly.
    */
  def sssp(pg: PropertyGraph, src: Long, maxHops: Int = 20): DataFrame = {
    val spark = pg.spark
    import spark.implicits._
    val edges = pg.allEdges
      .select(col("start_id").as("src"), col("end_id").as("dst"))
      .localCheckpoint()
    var dist = Seq((src, 0)).toDF("id", "d").localCheckpoint()
    var frontier = dist
    var level = 0
    var fCount = 1L
    while (level < maxHops && fCount > 0) {
      level += 1
      frontier = frontier.join(edges, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("d", lit(level))
        .localCheckpoint()
      // ONE driver action per level: the count runs over the partitions the
      // eager checkpoint just cached (the old double `frontier.isEmpty`
      // probes were two extra jobs per level — SCALE.md fixpoint rule)
      fCount = frontier.count()
      if (fCount > 0) {
        // dist's lineage stays a shallow union of checkpointed frontiers —
        // flatten only every few levels to keep analysis linear
        dist = dist.unionByName(frontier)
        if (level % 4 == 0) dist = dist.localCheckpoint()
      }
    }
    dist
  }

  /** In/out degrees joined back to the label: (id, label_id, in_deg, out_deg). */
  def degrees(pg: PropertyGraph): DataFrame = {
    val spark = pg.spark
    import spark.implicits._
    val g = toGraphX(pg)
    val in = g.inDegrees.toDF("id", "in_deg")
    val out = g.outDegrees.toDF("id", "out_deg")
    g.vertices.toDF("id", "label_id")
      .join(in, Seq("id"), "left_outer")
      .join(out, Seq("id"), "left_outer")
      .na.fill(0, Seq("in_deg", "out_deg"))
  }
}
