package graft.tools

import org.apache.spark.sql.SparkSession

/** Adversarial embedding-corpus generator (r15, VERDICT r14 #2): the ANN
  * recall floors were calibrated on the driver's near-uniform synthetic
  * embeddings; a real 100 TB corpus is CLUSTERED and near-duplicate-heavy,
  * which stresses every ANN path differently (LSH buckets collapse, IVF
  * lists go unbalanced, PQ codes quantize whole tight clusters to one
  * codeword). This writes an embeddings.parquet with:
  *
  *   - 70% tight Gaussian clusters (unit-sphere centroids, σ=0.02/coord —
  *     intra-cluster cosine ≈ 0.99, inter ≈ orthogonal)
  *   - 30% near-duplicate fans (bases + ε=0.003 perturbed copies, the
  *     dedup-corpus shape)
  *
  * Fully deterministic (fixed seed); query ids 0..19 round-robin across
  * clusters so the recall probe sees every regime.
  *
  * Usage: MakeAdversarial <dstDir> [n=20000] [dim=64] [clusters=8]
  */
object MakeAdversarial {
  def main(args: Array[String]): Unit = {
    val dst = args(0)
    val n = if (args.length > 1) args(1).toInt else 20000
    val dim = if (args.length > 2) args(2).toInt else 64
    val nClusters = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder().master(
        s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new java.util.Random(0x5eed15L)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val centroids = Array.fill(nClusters)(unit())
    val nClustered = (n * 7) / 10
    val nDup = n - nClustered
    val nBases = math.max(nDup / 10, 1)
    val bases = Array.fill(nBases)(unit())

    val rows = (0 until n).map { i =>
      val v: Array[Double] =
        if (i < nClustered) {
          val c = centroids(i % nClusters)
          c.map(_ + rnd.nextGaussian() * 0.02)
        } else {
          val b = bases((i - nClustered) % nBases)
          b.map(_ + rnd.nextGaussian() * 0.003)
        }
      (i.toLong, v.map(_.toFloat).toSeq, i % nClusters)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(8).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[makeadversarial] $dst: $n vectors, dim=$dim, " +
      s"$nClusters clusters (${nClustered} clustered + ${nDup} near-dups over $nBases bases)")
    spark.stop()
  }
}
