package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor index — the
  * learned-quantizer scale path, complementing the data-independent
  * sign-LSH in [[Similarity]].
  *
  * Build: fit k-means coarse centroids (MLlib, public Spark API), assign
  * every vector to its nearest centroid, and persist/partition the
  * assignment table by `cluster` — at 100 TB the assignment write is one
  * narrow pass and the partitioned layout makes each probe a partition
  * prune, not a scan.
  *
  * Query: rank centroids against the query ON THE DRIVER (k × dim floats —
  * trivially small), probe the nearest `nProbes` clusters, exact-rank
  * inside with the native cosine kernel. Recall/latency trades via
  * `nProbes` exactly as in classical IVF-Flat.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit the coarse quantizer and assign every row to a cluster. */
  def fit(df: DataFrame, embCol: String, idCol: String, k: Int,
          seed: Long = 42L): Model = {
    val withVec = df.withColumn("_vec", array_to_vector(col(embCol)))
    // Coarse quantizer, not a final model: random init + few iterations is
    // the standard IVF trade — assignment quality converges fast and the
    // probe stage re-ranks exactly anyway.
    val km = new KMeans().setK(k).setSeed(seed)
      .setInitMode("random").setMaxIter(8)
      .setFeaturesCol("_vec").setPredictionCol("cluster")
    val model = km.fit(withVec)
    val assigned = model.transform(withVec)
      .select(col(idCol), col(embCol), col("cluster"))
    Model(model.clusterCenters.map(_.toArray), assigned)
  }

  /** Probe the `nProbes` centroids nearest to the query (cosine), then
    * exact-rank within those clusters only. */
  def topK(model: Model, embCol: String, idCol: String, query: Seq[Double],
           k: Int, nProbes: Int = 3, roundTo: Int = 6): DataFrame = {
    model.centroids.headOption.foreach { c =>
      require(c.length == query.length,
        s"query dimension ${query.length} != index dimension ${c.length}")
    }
    // degenerate (zero-norm) centroid or query ranks last, never NaN-first
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
      else dot / math.sqrt(na * nb)
    }
    val probes = model.centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c.toSeq, query) }
      .take(nProbes).map(_._2)
    val spark = model.assigned.sparkSession
    model.assigned
      .filter(col("cluster").isin(probes.toSeq: _*))
      .select(col(idCol),
        round(GraftFunctions.cosineSim(spark, col(embCol), Similarity.vecLit(query)),
          roundTo).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
