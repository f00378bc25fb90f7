package graft.operators

import graft.Tables.T
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. The scale story: every variant is a
  * per-row signature computation (codegen, linear) followed by ONE shuffle
  * keyed on signature/band/chunk; nothing is O(n²) except the final
  * verification restricted to candidate pairs.
  */
object Dedup {

  private val JaccardThreshold = 0.3
  private val LshThreshold = 0.3
  private val MinhashK = 63
  // 21 bands × 3 rows: P[candidate] = 1-(1-j^3)^21. Near-dups (j ≥ 0.8, the
  // only pairs this corpus has) miss with p ≈ 3e-7; unrelated word-salad
  // pairs (j ≈ 0.1) become candidates at only ~2% — keeps the verification
  // join ~50× smaller than r=1 banding at 100 TB-ish candidate rates.
  private val LshBands = 21

  /** ±1 vote for bit `i` of the token hash (simhash aggregation term). */
  private def bitVote(i: Int): org.apache.spark.sql.Column =
    sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L))

  /** (doc_id, shingle) exploded-distinct pairs. */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("shingle"))
      .distinct()

  /** Exact word-3gram Jaccard similarity for all pairs meeting the threshold
    * — the ground-truth near-dup set. Shuffle is keyed on shingle (scales
    * with corpus, hot shingles are the skew risk — mitigated by the
    * distinct() pre-aggregation).
    */
  private def jaccardPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val sh = docShingles(s, dir).persist() // scanned 3× (sizes + both join sides)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a")
    val b = sh.as("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: md5-of-normalized-text groups
    "d1_exact_dedup" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(fingerprintMd5(col("text")).as("fp"))
        .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("copies")).as("n_docs"),
          sum(when(col("copies") > 1, col("copies") - 1).otherwise(0L)).as("n_removed"))
    }),

    // ground-truth n-gram Jaccard near-dup pairs
    "d2_ngram_jaccard" -> ((s, dir) => jaccardPairs(s, dir, JaccardThreshold)),

    // MinHash+LSH candidates, then exact verification — same result as the
    // ground truth when recall holds; the LSH join replaces the all-pairs
    // shingle join with a band-key join (the 100 TB path).
    "d3_minhash_lsh" -> ((s, dir) => {
      // Signatures via explode + 63 codegen'd min() aggregates — NOT the
      // array-lambda minhash: higher-order functions evaluate interpreted
      // (no whole-stage codegen), measured 7.7 s just materializing
      // signatures at sf0.1; the relational shape runs the same math inside
      // codegen with map-side partial aggregation (~0.5 s), and is the form
      // that scales (shuffle carries 63 partial mins per doc, not arrays).
      val sh = T(s, dir, "documents")
        .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
        .persist()
      val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        .withColumn("h", xxhash64(col("s")))
      val sig = hashed.groupBy(col("doc_id"))
        .agg(min(xxhash64(lit(0), col("h"))).as("m0"),
          (1 until MinhashK).map(i =>
            min(xxhash64(lit(i), col("h"))).as(s"m$i")): _*)
        .select(col("doc_id"),
          array((0 until MinhashK).map(i => col(s"m$i")): _*).as("sig"))
      val docs = sig
        .withColumn("bands", lshBandKeys(col("sig"), MinhashK, LshBands))
        .join(sh, "doc_id")
        .persist()
      val banded = docs.select(col("doc_id"), explode(col("bands")).as("band"))
      val candidates = banded.as("a")
        .join(banded.as("b"), col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      // exact verify candidates only
      val withSets = candidates
        .join(docs.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
        .join(docs.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
      withSets
        .withColumn("i", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", col("i").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("i")))
        .filter(col("jaccard") >= LshThreshold)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("da"), col("db"))
    }),

    // embedding-cosine near-dup pairs, exact brute force (the gate
    // baseline; the corpus has no true dups — max pairwise cosine ≈ 0.51 —
    // so the threshold is data-calibrated). The scale path for this
    // operator is s3 (hyperplane LSH) / s4 (IVF): candidates ∝ corpus,
    // not corpus².
    "d5_cosine_neardup" -> ((s, dir) => {
      // Exact all-pairs cosine, fully columnar: normalize once, FLATTEN the
      // vector to `dim` scalar double columns, then the pair score is a
      // 64-term scalar multiply-add — plain codegen over flat columns.
      // Two rejected shapes, both measured at sf0.1 (2M pairs):
      //   · aggregate/zip_with lambda per pair — interpreted HOF, 80 s
      //   · unrolled element_at over the array column — the projection
      //     falls off codegen above the nested-loop join, 36 s
      // flat columns: 2.2 s for the pair job. localCheckpoints keep the
      // normalization from re-inlining above the join and the threshold
      // filter out of the nested-loop join condition (where it would
      // evaluate interpreted).
      val e0 = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dim = e0.select(size(col("embedding"))).head.getInt(0)
      val e = e0
        .withColumn("nrm", Similarity.l2norm(col("embedding")))
        .withColumn("nv", transform(col("embedding"), x => x.cast("double") / col("nrm")))
        .select(col("vec_id") +: (1 to dim).map(i => element_at(col("nv"), i).as(s"x$i")): _*)
        .localCheckpoint()
      val dot = (1 to dim).map(i => col(s"a.x$i") * col(s"b.x$i")).reduce(_ + _)
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), dot.as("c"))
        .localCheckpoint()
        .filter(col("c") >= 0.45)
        .select(col("va"), col("vb"), round(col("c"), 4).as("cos"))
        .orderBy(col("va"), col("vb"))
    }),

    // SimHash near-dup pairs via 16-bit chunk banding (hamming ≤ 3 complete
    // by pigeonhole; we report hamming ≤ 6 found through chunk collisions)
    "d4_simhash" -> ((s, dir) => {
      // same explode + codegen'd aggregate shape as d3 (HOF bit-vote
      // folding was interpreted); one sum per bit, then OR the sign bits
      val toks = T(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .withColumn("h", xxhash64(col("w")))
      val votes = toks.groupBy(col("doc_id"))
        .agg(bitVote(0).as("v0"), (1 until 64).map(i => bitVote(i).as(s"v$i")): _*)
      val sigCol = (0 until 64)
        .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _)
      val docs = votes.select(col("doc_id"), sigCol.as("sig"))
        .withColumn("chunks", simhashChunks(col("sig")))
        .persist()
      val chunked = docs.select(col("doc_id"), col("sig"), explode(col("chunks")).as("c"))
      chunked.as("a")
        .join(chunked.as("b"), col("a.c") === col("b.c") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          hamming64(col("a.sig"), col("b.sig")).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy(col("da"), col("db"))
    })
  )

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT count(*) AS n_unique, CAST(sum(copies) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN copies > 1 THEN copies - 1 ELSE 0 END) AS BIGINT) AS n_removed
        |FROM (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |         count(*) AS copies
        |  FROM documents GROUP BY 1)""".stripMargin,
    "d2_ngram_jaccard" -> jaccardOracle(JaccardThreshold),
    "d3_minhash_lsh" -> jaccardOracle(LshThreshold),
    "d5_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        |ORDER BY va, vb""".stripMargin
    // d4_simhash: rows-only (hash family not expressible in SQL)
  )

  private def jaccardOracle(threshold: Double): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |    for i in range(1, len(w) - 1)])) AS shingle
       |  FROM d WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db,
       |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
       |FROM inter
       |JOIN sz sa ON da = sa.doc_id
       |JOIN sz sb ON db = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= $threshold
       |ORDER BY da, db""".stripMargin
}
