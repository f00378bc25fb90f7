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
    // liveness probe = count() over the partitions the eager checkpoint
    // just cached (effectively free); `!isEmpty` would re-derive a
    // limit(1) plan and run a SECOND full job per generation (the same
    // VERDICT-r7-#4 pattern fixed in the BFS and unbounded-VLE loops).
    // Per-generation checkpoints are LAZY (r16): the count() right after
    // is the materializing action, so each generation runs ONE job, not a
    // checkpoint job plus a count job — on a deep small-frontier
    // recursion (q35's 25-hop ring) the job overhead IS the runtime.
    var live = frontier.count() > 0
    while (iter < maxIter && live) {
      val stepped = step(frontier).select(cols.map(org.apache.spark.sql.functions.col): _*)
      frontier = stepped.distinct().join(acc, cols, "left_anti").localCheckpoint(false)
      live = frontier.count() > 0
      if (live) {
        acc = acc.unionByName(frontier)
        iter += 1
        if (iter % 3 == 0) acc = acc.localCheckpoint(false) // materializes on next use
      }
    }
    require(iter < maxIter || !live,
      s"recursive fixpoint did not converge within $maxIter iterations")
    acc
  }

  import org.apache.spark.sql.functions._

  /** `WITH RECURSIVE … UNION ALL` accumulation WITHOUT dedup: every
    * generation lands in the result as-is and recursion ends only when a
    * step produces no rows (PG semantics — a cyclic step diverges there
    * too, bounded here by maxIter). Same per-generation materialization
    * discipline as [[fixpoint]].
    */
  def fixpointAll(seed: DataFrame, step: DataFrame => DataFrame,
      maxIter: Int = 100): DataFrame = {
    val cols = seed.columns.toSeq
    var acc = seed.localCheckpoint()
    var frontier = acc
    var iter = 0
    var live = frontier.count() > 0
    while (iter < maxIter && live) {
      frontier = step(frontier) // lazy checkpoint: count() materializes it
        .select(cols.map(org.apache.spark.sql.functions.col): _*).localCheckpoint(false)
      live = frontier.count() > 0
      if (live) acc = acc.unionByName(frontier)
      iter += 1
      if (iter % 3 == 0) acc = acc.localCheckpoint(false) // materializes on next use
    }
    require(iter < maxIter || !live,
      s"recursive fixpoint (UNION ALL) did not converge within $maxIter iterations")
    acc
  }

  /** `SEARCH {BREADTH|DEPTH} FIRST BY keyCols SET seqCol`
    * (cypher_gram.y:1394-1417): PG's ordering-column sugar over a recursive
    * CTE, re-expressed as a fixpoint combinator. BREADTH FIRST emits
    * `seqCol = struct(depth, keyCols…)`; DEPTH FIRST emits
    * `seqCol = array<struct(keyCols…)>` (the root-to-row path) — ordering
    * by seqCol then reproduces PG's breadth-/depth-first presentation
    * order. UNION ALL accumulation (PG requires it for SEARCH); `step`
    * receives the frontier INCLUDING seqCol and must carry it through to
    * each child row (a join naturally does), the combinator re-derives the
    * child's own seq from it.
    */
  def fixpointSearch(seed: DataFrame, step: DataFrame => DataFrame,
      keyCols: Seq[String], breadthFirst: Boolean, seqCol: String = "seq",
      maxIter: Int = 100): DataFrame = {
    def keyStruct = struct(keyCols.map(col): _*)
    val seed2 = (if (breadthFirst)
      seed.withColumn(seqCol, struct(lit(0L).as("depth"), keyStruct.as("key")))
    else seed.withColumn(seqCol, array(keyStruct))).localCheckpoint()
    var acc = seed2
    var frontier = seed2
    var iter = 0
    var live = frontier.count() > 0 // count over cached checkpoint — cheap
    while (iter < maxIter && live) {
      val children = step(frontier)
      val reseq =
        if (breadthFirst) children.withColumn(seqCol,
          struct((col(seqCol).getField("depth") + 1).as("depth"), keyStruct.as("key")))
        else children.withColumn(seqCol, concat(col(seqCol), array(keyStruct)))
      frontier = reseq // lazy checkpoint: count() materializes it
        .select(acc.columns.map(col).toSeq: _*).localCheckpoint(false)
      live = frontier.count() > 0
      if (live) acc = acc.unionByName(frontier)
      iter += 1
      if (iter % 3 == 0) acc = acc.localCheckpoint(false) // materializes on next use
    }
    require(iter < maxIter || !live,
      s"recursive fixpoint did not converge within $maxIter iterations")
    acc
  }

  /** `CYCLE keyCols SET markCol [TO v DEFAULT dv] USING pathCol`
    * (cypher_gram.y:1419-1443): cycle detection sugar — each row carries
    * the root-to-row path of its key struct in `pathCol`; a child whose
    * key already appears in its parent's path gets `markCol = true` and is
    * NOT expanded further (PG semantics), which also guarantees
    * termination on cyclic graphs. UNION ALL accumulation.
    */
  def fixpointCycle(seed: DataFrame, step: DataFrame => DataFrame,
      keyCols: Seq[String], markCol: String = "is_cycle",
      pathCol: String = "path", maxIter: Int = 100): DataFrame = {
    def keyStruct = struct(keyCols.map(col): _*)
    val seed2 = seed
      .withColumn(markCol, lit(false))
      .withColumn(pathCol, array(keyStruct))
      .localCheckpoint()
    var acc = seed2
    var frontier = seed2
    var iter = 0
    var live = frontier.count() > 0 // count over cached checkpoint — cheap
    while (iter < maxIter && live) {
      val children = step(frontier)
        .withColumn(markCol, array_contains(col(pathCol), keyStruct))
        .withColumn(pathCol, concat(col(pathCol), array(keyStruct)))
      // ONE job per generation: the LAZY checkpoint materializes inside
      // the counting agg below, and the filtered next frontier then reads
      // the checkpoint's cached blocks
      val stepped = children.select(acc.columns.map(col).toSeq: _*).localCheckpoint(false)
      // one job, two counts: total rows (for accumulation) and UNMARKED
      // rows (for liveness) — a generation of all-cycle rows still lands
      // in acc but must end the loop, else a converged run that hits
      // maxIter with marked leftovers trips the require below spuriously
      val cnts = stepped.agg(
        count(lit(1)).as("n"), count(when(!col(markCol), 1)).as("fresh")).head()
      if (cnts.getLong(0) > 0) acc = acc.unionByName(stepped)
      live = cnts.getLong(1) > 0
      // marked rows surface in the result but never recurse
      frontier = stepped.filter(!col(markCol))
      iter += 1
      if (iter % 3 == 0) acc = acc.localCheckpoint(false) // materializes on next use
    }
    require(iter < maxIter || !live,
      s"recursive cycle fixpoint did not converge within $maxIter iterations")
    acc
  }
}
