package graft.ml

import graft.functions.vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTED SemDeDup state — the incremental form of [[SemDedup]]: the
  * k-means centroids and the cluster-partitioned corpus assignments are
  * written once at build, so a new batch is scoped to its OWN clusters
  * against stored rows without re-clustering or re-assigning the corpus —
  * the [[graft.operators.FingerprintIndex]]/[[graft.operators
  * .HyperplaneIndex]] discipline for the semantic-dedup family.
  *
  * The layout IS an [[IvfIndex]] (centroids + `data/list_id=*` where
  * list_id is the SemDeDup cluster): assignment, partition-pruned
  * cluster reads, O(batch) [[append]] and [[maintenance]] drift signals
  * (imbalance / appendedFraction = the re-cluster triggers) are all
  * inherited rather than re-implemented.
  *
  * Equivalence contract (spec-asserted): on a stationary corpus — same
  * frozen centroids — `dedupBatch(B)` ∪ `batchPairs(B)` equals
  * [[SemDedup.pairsWithCentroids]] over corpus ∪ B restricted to pairs
  * touching B, whenever no cluster exceeds `maxClusterSize` (the cap
  * truncates the CORPUS side deterministically, lowest ids kept, exactly
  * like the batch path caps).
  */
object SemDedupIndex {

  case class Index(ivf: IvfIndex, path: String) {
    def spark: SparkSession = ivf.spark
    def centroids: Array[Array[Double]] = ivf.centroids

    /** Which batch rows semantically duplicate a STORED row:
      * (batch_id, corpus_id, cosine) with cosine >= threshold and both
      * sides in the SAME cluster. The corpus scan is partition-pruned to
      * the clusters the batch actually lands in; corpus vectors are read
      * only there; nothing is re-clustered.
      */
    def dedupBatch(
        batch: DataFrame,
        idCol: String,
        vecCol: String,
        threshold: Double,
        maxClusterSize: Int = 10000): DataFrame = {
      val assigned = assignBatch(batch, idCol, vecCol)
      val clusters = assigned.select(col("cluster")).distinct()
        .collect().map(_.getInt(0)).toSeq // <= nClusters by construction
      val corpus = cappedCorpus(clusters, maxClusterSize)
      assigned.as("b")
        .join(corpus.as("c"), col("b.cluster") === col("c.cluster"))
        .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"),
          vector.cosine_sim(col("b._v"), col("c._cv")).as("cosine"))
        .filter(col("cosine") >= threshold)
    }

    /** Within-batch semantic duplicates, cluster-scoped like everything
      * else: (id_a, id_b, cosine), id_a < id_b, same cluster. The batch
      * side is never capped — a batch row must not lose its chance to
      * match ([[graft.operators.HyperplaneIndex]] discipline).
      */
    def batchPairs(
        batch: DataFrame,
        idCol: String,
        vecCol: String,
        threshold: Double): DataFrame = {
      val assigned = assignBatch(batch, idCol, vecCol)
      assigned.as("a")
        .join(assigned.as("b"),
          col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          vector.cosine_sim(col("a._v"), col("b._v")).as("cosine"))
        .filter(col("cosine") >= threshold)
    }

    /** Grow the stored corpus by a batch — O(batch) assignment + append
      * against the FROZEN centroids; no re-clustering. Watch
      * [[maintenance]] for when frozen clusters stop describing the data.
      */
    def append(rows: DataFrame, idCol: String = "id", vecCol: String = "vector"): Long =
      ivf.append(rows, idCol, vecCol)

    /** Cluster drift signals: imbalance and appended fraction are exactly
      * the SemDeDup re-cluster triggers.
      */
    def maintenance(): IvfIndex.Maintenance = ivf.maintenance()

    private def assignBatch(
        batch: DataFrame, idCol: String, vecCol: String): DataFrame =
      batch.select(
        col(idCol).cast("long").as("id"),
        col(vecCol).as("_v"),
        ivf.probes(col(vecCol), 1).getItem(0).as("cluster"))
        .localCheckpoint(true) // feeds the cluster prune AND the verify join

    private def cappedCorpus(clusters: Seq[Int], maxClusterSize: Int): DataFrame = {
      val pruned = ivf.storeDf
        .filter(col("list_id").isin(clusters: _*))
        .select(col("id"), col("vector").as("_cv"), col("list_id").as("cluster"))
      // deterministic corpus-side cap, lowest ids — SemDedup.pairsWithCentroids'
      // cap restricted to the stored side
      val w = Window.partitionBy(col("cluster")).orderBy(col("id"))
      pruned.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= maxClusterSize)
        .drop("_rn")
    }
  }

  /** Build from k-means on the corpus (the [[SemDedup.pairs]] quantizer,
    * persisted): trains, assigns, writes centroids + cluster-partitioned
    * rows in one pass over the corpus.
    */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nClusters: Int = 64,
      metric: String = vector.MetricCosine,
      maxIter: Int = 10,
      seed: Long = 42L): Index =
    Index(IvfIndex.build(df, idCol, vecCol, path, nClusters, metric, maxIter,
      seed), path)

  /** Deterministic twin: explicit centroids (the [[SemDedup
    * .pairsWithCentroids]] quantizer, persisted).
    */
  def buildWithCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      centroids: Array[Array[Double]],
      metric: String = vector.MetricCosine): Index =
    Index(IvfIndex.buildWithCentroids(df, idCol, vecCol, path, centroids,
      metric), path)

  /** Load previously persisted SemDeDup state (metric from buildmeta). */
  def load(spark: SparkSession, path: String): Index =
    Index(IvfIndex.load(spark, path), path)
}
