package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive-CTE analog (the reference inherits PostgreSQL's
  * `WITH RECURSIVE`, grammar cypher_gram.y:1335-1443 incl. SEARCH/CYCLE;
  * Spark has no native recursion, so the UNION-distinct fixpoint loop is a
  * driver-side iteration of DataFrame steps).
  *
  * Semantics = `WITH RECURSIVE ... UNION` (distinct accumulation): each
  * iteration applies `step` to the previous frontier, drops rows already
  * accumulated, and stops at an empty frontier or `maxIter`. Each hop is one
  * join + one anti join — at scale the frontier stays hash-partitioned on
  * its join key and the accumulated set is the only growing state (same
  * shape as the VLE expansion loop; deep recursions should use the GraphX
  * Pregel bridge instead of ever-growing plans).
  *
  * Rows with NULLs in them never equal their duplicates under the anti-join
  * (SQL equality), matching WITH RECURSIVE UNION's distinct-on-equality.
  */
object Recursive {

  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
      maxIter: Int = 100): DataFrame = {
    val cols = seed.columns.toSeq
    // localCheckpoint each generation: truncates lineage so the plan does
    // not grow with depth AND gives every generation fresh attribute ids
    // (step() usually re-joins the same relation — without the cut Spark
    // flags the self-join as ambiguous)
    var acc = seed.distinct().localCheckpoint()
    var frontier = acc
    var iter = 0
    // one driver action per generation: the step's localCheckpoint IS the
    // materialization, and the emptiness probe reads its cached blocks.
    // acc stays a lazy union of checkpointed frontiers (each leg cached, no
    // recompute) with a lineage-bounding flatten every few generations.
    var live = !frontier.isEmpty
    while (iter < maxIter && live) {
      val stepped = step(frontier).select(cols.map(org.apache.spark.sql.functions.col): _*)
      frontier = stepped.distinct().join(acc, cols, "left_anti").localCheckpoint()
      live = !frontier.isEmpty
      if (live) {
        acc = acc.unionByName(frontier)
        iter += 1
        if (iter % 3 == 0) acc = acc.localCheckpoint()
      }
    }
    require(iter < maxIter || !live,
      s"recursive fixpoint did not converge within $maxIter iterations")
    acc
  }
}
