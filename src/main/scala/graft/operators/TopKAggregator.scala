package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** One (score, id) candidate row flowing into a top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregator: keeps at most `k` best candidates per group.
  *
  * This is the scale-path primitive for batch kNN (SURVEY.md §2.3 J2): with
  * `groupBy(query_id).agg(topK(...))` Spark runs it as a partial aggregation,
  * so each map task reduces its slice of the M x N score stream to <= k rows
  * per query BEFORE the shuffle. The shuffle then moves only M*k rows instead
  * of M*N — the difference between feasible and not at 100 TB.
  *
  * `ascending = false` keeps the highest scores (cosine/dot similarity);
  * `ascending = true` keeps the lowest (raw distance metrics).
  *
  * Reference semantics: per-row top-k selection over the score matrix
  * (performance/mlx_optimized.py:235-248), re-expressed as a distributed
  * combine-merge tree instead of a single-node argsort.
  */
class TopKAggregator(k: Int, ascending: Boolean)
    extends Aggregator[ScoredId, ArrayBuffer[ScoredId], Array[ScoredId]] {

  require(k >= 1, s"k must be >= 1, got $k")

  // "a beats b" under the chosen direction, with id as a deterministic tiebreak.
  private def better(a: ScoredId, b: ScoredId): Boolean =
    if (a.score != b.score) { if (ascending) a.score < b.score else a.score > b.score }
    else a.id < b.id

  private def prune(buf: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(better)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def zero: ArrayBuffer[ScoredId] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[ScoredId], in: ScoredId): ArrayBuffer[ScoredId] = {
    buf += in
    // amortize the sort: let the buffer grow to 2k before pruning
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def merge(a: ArrayBuffer[ScoredId], b: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] =
    prune(a ++= b)

  override def finish(buf: ArrayBuffer[ScoredId]): Array[ScoredId] =
    buf.sortWith(better).take(k).toArray

  override def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] =
    Encoders.kryo[ArrayBuffer[ScoredId]]

  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}
