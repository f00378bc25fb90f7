package graft

import graft.operators.{Dedup, Similarity, TextAnalysis, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-operator tests at sf0.001 plus cross-checks the DuckDB oracle
  * can't express: LSH-vs-brute-force consistency, simhash behavior.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds exactly the ground-truth jaccard pairs") {
    val exact = Dedup.queries("d2_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.queries("d3_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
  }

  test("simhash near-dup pairs overlap heavily with jaccard near-dups") {
    val jac = Dedup.queries("d2_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.queries("d4_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash(hamming≤6) should recover most 0.9+-jaccard near-dups
    if (jac.nonEmpty) {
      val recall = jac.count(sim.contains).toDouble / jac.size
      assert(recall >= 0.8, s"simhash recall $recall over ${jac.size} pairs")
    }
  }

  test("ANN LSH top-k hits are a subset of true candidates with decent recall") {
    val brute = Similarity.queries("s1_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.queries("s3_ann_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    assert(recall >= 0.5, s"ANN recall $recall (brute=${brute.size}, ann=${ann.size})")
  }

  test("IVF ANN recall vs brute force is high on clustered embeddings") {
    val brute = Similarity.queries("s1_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.queries("s4_ivf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall (brute=${brute.size}, ivf=${ivf.size})")
  }

  test("quality score is bounded and text-length monotone-ish") {
    import org.apache.spark.sql.functions._
    val scored = Tables.T(spark, sf, "documents")
      .select(graft.functions.TextFns.qualityScore(col("text")).as("s"))
      .agg(min(col("s")), max(col("s"))).collect().head
    assert(scored.getDouble(0) >= 0.0 && scored.getDouble(1) <= 1.0)
  }

  test("frame sampling stub covers every byte exactly once") {
    val rows = Multimodal.queries("m2_frame_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val meta = Multimodal.queries("m1_binary_meta")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nBytes = meta(r.getLong(0))
      assert(r.getLong(1) == math.ceil(nBytes / 64.0).toLong)
    }
  }

  test("token counts: regex tokens >= whitespace tokens") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns._
    val bad = Tables.T(spark, sf, "documents")
      .select(size(tokens(col("text"))).as("ws"), size(regexTokens(col("text"))).as("re"))
      .filter(col("re") < col("ws")).count()
    assert(bad == 0)
  }
}
