package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) vector index — the Spark-native re-expression of the
  * reference's IVFFlat access method (/root/reference/src/backend/access/
  * ivfbuild.c kmeans build, ivfscan.c probe-nearest-lists scan; defaults
  * lists=100, ivfflat.h:52). Here: deterministic Lloyd's k-means as
  * iterative DataFrame aggregation (per-iteration state = k×dim doubles on
  * the driver — nothing else leaves the executors), cluster id as a
  * partition-friendly column, and ANN search probing the `nprobe` nearest
  * clusters only.
  */
object Ivf {

  /** Squared L2 distance between a vector column and a literal centroid. */
  private def l2sqLit(vec: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(vec, typedlit(centroid.toSeq), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Distances from a vector column to every centroid, as an array column. */
  def distances(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map(c => l2sqLit(vec, c)): _*)

  /** Nearest-centroid index (0-based). */
  def assignCluster(vec: Column, centroids: Array[Array[Double]]): Column = {
    val d = distances(vec, centroids)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** `nprobe` nearest centroid indices, nearest first. */
  def probeClusters(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val d = distances(vec, centroids)
    val zipped = zip_with(d, sequence(lit(0), lit(centroids.length - 1)),
      (dist, i) => struct(dist.as("d"), i.cast("int").as("i")))
    transform(slice(array_sort(zipped), 1, nprobe), s => s.getField("i"))
  }

  /** Deterministic Lloyd's k-means: seeds are an id-stride sample (no RNG —
    * reruns give identical centroids), each iteration is one groupBy over
    * (cluster, dim) with only k×dim averages collected to the driver.
    */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Array[Array[Double]] = {
    val n = emb.count()
    require(n >= k, s"need at least $k vectors")
    val stride = math.max(n / k, 1)
    var centroids: Array[Array[Double]] = emb
      .filter(col(idCol) % stride === 0)
      .orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), _.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = emb.select(
        assignCluster(col(vecCol), centroids).as("cluster"),
        posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("pos", "v")))
      val means = assigned.groupBy(col("cluster"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next // empty clusters keep their previous centroid
    }
    centroids
  }

  /** ANN top-k by cosine: probe the `nprobe` nearest clusters per query,
    * exact-score candidates within those clusters only. The scan cost drops
    * from |corpus| to ~|corpus|·nprobe/k per query — the IVFFlat trade.
    */
  def annSearch(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      centroids: Array[Array[Double]], nprobe: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val indexed = emb.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      assignCluster(col(vecCol), centroids).as("cluster"))
    val probes = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      explode(probeClusters(col(qVecCol), centroids, nprobe)).as("cluster"))
    val scored = probes.join(indexed, "cluster")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(VectorFns.cosineSimilarity(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("cid"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }
}
