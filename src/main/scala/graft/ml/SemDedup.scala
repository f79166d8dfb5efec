package graft.ml

import graft.functions.{vector, CentroidProbes}
import graft.operators.Dedup
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): cluster the embedding space
  * with k-means, then search for semantic duplicates WITHIN clusters only —
  * the published recipe's observation is that semantic duplicates land in
  * the same cluster, so the O(N²) pair search collapses to O(Σ cᵢ²) over
  * cluster sizes.
  *
  * Relationship to the other embedding-dedup tiers: [[graft.operators
  * .Dedup.embeddingNearDupLsh]] buckets by hyperplane signs (recall bound
  * by band luck), this buckets by learned cluster structure (recall bound
  * by cluster assignment); both verify candidates with the exact cosine
  * kernel. At 100 TB the cluster join co-locates work by cluster id, the
  * shuffle carries (id, cluster, vector) once, and oversized clusters cap
  * deterministically (lowest ids kept) exactly like the LSH bucket caps.
  */
object SemDedup {

  /** Duplicate pairs within clusters, given EXPLICIT centroids (the
    * deterministic variant — assignment is a pure argmax, so an external
    * engine can replay it; the q55 oracle does, on planted copies).
    * Output: (id_a, id_b) with id_a < id_b, cosine >= threshold, same
    * cluster.
    */
  def pairsWithCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      threshold: Double,
      metric: String = vector.MetricCosine,
      maxClusterSize: Int = 10000): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(threshold >= -1.0 && threshold <= 1.0, s"bad threshold $threshold")
    // cosine metric: normalized centroids, mirroring IvfIndex.build
    val cents =
      if (metric == vector.MetricCosine) centroids.map { c =>
        val n = math.max(math.sqrt(c.map(x => x * x).sum), 1e-8)
        c.map(_ / n)
      } else centroids
    val assigned = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).as("_v"),
      Bridge.column(CentroidProbes(Bridge.expression(col(vecCol)), cents,
        metric, 1)).getItem(0).as("cluster"))
    // deterministic cap: each cluster keeps its maxClusterSize lowest ids
    val w = Window.partitionBy(col("cluster")).orderBy(col("id"))
    val capped = assigned
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxClusterSize)
      .drop("_rn")
    capped.as("a").join(capped.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(vector.cosine_sim(col("a._v"), col("b._v")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** Production variant: k-means centroids trained on the corpus (Spark ML
    * distributed Lloyd), then [[pairsWithCentroids]].
    */
  def pairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nClusters: Int = 64,
      metric: String = vector.MetricCosine,
      maxClusterSize: Int = 10000,
      maxIter: Int = 10,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val trainVec =
      if (metric == vector.MetricCosine) vector.l2_normalize(col(vecCol))
      else col(vecCol)
    val features = df.select(array_to_vector(trainVec).as("features"))
    val model = new KMeans().setK(nClusters).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").fit(features)
    pairsWithCentroids(df, idCol, vecCol,
      model.clusterCenters.map(_.toArray), threshold, metric, maxClusterSize)
  }

  /** Full semantic-dedup pass: pairs -> connected groups -> per-row keep
    * flag (one representative per semantic-duplicate set, lowest id — the
    * deterministic stand-in for the paper's keep-farthest-from-centroid).
    * Output: df's id spine + (group_id, is_representative, keep).
    */
  def withSemDedupFlags(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nClusters: Int = 64,
      metric: String = vector.MetricCosine): DataFrame = {
    val p = pairs(df, idCol, vecCol, threshold, nClusters, metric)
    val groups = Dedup.dedupGroups(df, p, idCol)
      .select(col("id").as("_sd_id"), col("group_id"), col("is_representative"))
    df.join(groups, col(idCol).cast("long") === col("_sd_id"), "left")
      .drop("_sd_id")
      .withColumn("keep", coalesce(col("is_representative"), lit(true)))
  }
}
