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

/** One (count, token) candidate row flowing into a per-key vocabulary top-k. */
case class CountedToken(cnt: Long, token: String)

/** Bounded top-k over (count, token) pairs: keeps the `k` highest-count
  * tokens per group, lexicographically-smallest token breaking count ties
  * (the deterministic, SQL-replayable order `cnt DESC, token ASC`).
  *
  * The string twin of [[TopKAggregator]], and the same scale argument: a
  * per-language heavy-hitter query over web-scale text has a vocabulary that
  * GROWS with the corpus (misspellings, ids, junk tokens — billions of
  * distinct strings at 100 TB), so a window `rank() OVER (PARTITION BY lang)`
  * would funnel every language's whole vocabulary into one task. As a typed
  * Aggregator Spark runs this as a partial aggregation — each map task
  * reduces its vocabulary slice to <= k rows per language BEFORE the final
  * shuffle, which then moves only `languages * k` rows.
  */
class TopKTokenAggregator(k: Int)
    extends Aggregator[CountedToken, ArrayBuffer[CountedToken], Array[CountedToken]] {

  require(k >= 1, s"k must be >= 1, got $k")

  private def better(a: CountedToken, b: CountedToken): Boolean =
    if (a.cnt != b.cnt) a.cnt > b.cnt else a.token < b.token

  private def prune(buf: ArrayBuffer[CountedToken]): ArrayBuffer[CountedToken] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(better)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def zero: ArrayBuffer[CountedToken] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[CountedToken], in: CountedToken): ArrayBuffer[CountedToken] = {
    buf += in
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def merge(a: ArrayBuffer[CountedToken], b: ArrayBuffer[CountedToken]): ArrayBuffer[CountedToken] =
    prune(a ++= b)

  override def finish(buf: ArrayBuffer[CountedToken]): Array[CountedToken] =
    buf.sortWith(better).take(k).toArray

  override def bufferEncoder: Encoder[ArrayBuffer[CountedToken]] =
    Encoders.kryo[ArrayBuffer[CountedToken]]

  override def outputEncoder: Encoder[Array[CountedToken]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[CountedToken]]()
}

/** One (sortKey, token) element flowing into a bounded first-k selection. */
case class KeyedToken(key: Long, token: String)

/** Bounded FIRST-k aggregator: keeps the `k` elements with the SMALLEST
  * (key, token) — key ascending, token ascending on ties — the "first k
  * events of a timeline" primitive behind path analysis.
  *
  * Same scale argument as [[TopKAggregator]]: a per-user
  * `collect_list(...)` holds the user's ENTIRE event history in one
  * aggregation buffer (a bot user with millions of events is an executor
  * OOM), while this buffer never exceeds 2k elements — each map task
  * reduces its slice to <= k per user BEFORE the shuffle.
  */
class FirstKAggregator(k: Int)
    extends Aggregator[KeyedToken, ArrayBuffer[KeyedToken], Array[KeyedToken]] {

  require(k >= 1, s"k must be >= 1, got $k")

  private def before(a: KeyedToken, b: KeyedToken): Boolean =
    if (a.key != b.key) a.key < b.key else a.token < b.token

  private def prune(buf: ArrayBuffer[KeyedToken]): ArrayBuffer[KeyedToken] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(before)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def zero: ArrayBuffer[KeyedToken] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[KeyedToken], in: KeyedToken): ArrayBuffer[KeyedToken] = {
    buf += in
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def merge(a: ArrayBuffer[KeyedToken], b: ArrayBuffer[KeyedToken]): ArrayBuffer[KeyedToken] =
    prune(a ++= b)

  override def finish(buf: ArrayBuffer[KeyedToken]): Array[KeyedToken] =
    buf.sortWith(before).take(k).toArray

  override def bufferEncoder: Encoder[ArrayBuffer[KeyedToken]] =
    Encoders.kryo[ArrayBuffer[KeyedToken]]

  override def outputEncoder: Encoder[Array[KeyedToken]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[KeyedToken]]()
}
