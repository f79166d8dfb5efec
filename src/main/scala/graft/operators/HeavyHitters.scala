package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

import scala.collection.mutable

/** Corpus-global heavy hitters: the EXACT set of items whose frequency
  * exceeds `minFrac` of the stream, found without a full-cardinality
  * shuffle.
  *
  * The naive formulation — `GROUP BY item HAVING count(*) > phi * n` —
  * shuffles one row per DISTINCT item. Over web-scale text the distinct
  * universe grows with the corpus (token bigrams, URLs, misspellings:
  * billions of keys at 100 TB), so the naive plan exchanges a key space
  * that is itself corpus-sized to find the handful of keys that matter.
  * The classical answer is the two-pass frequent-items recipe:
  *
  *   pass 1 — a Misra–Gries summary (Misra & Gries, "Finding repeated
  *     elements", Sci. Comput. Program. 1982) with `k` counters per
  *     partial buffer, combined across partitions with the mergeable-
  *     summaries rule (Agarwal, Cormode, Huang, Phillips, Wei, Yi,
  *     "Mergeable summaries", PODS 2012): any item with true count
  *     > n/(k+1) is GUARANTEED to survive as a candidate, regardless of
  *     partitioning or merge order. The exchange carries at most
  *     `partitions × k` counters, independent of the distinct universe.
  *   pass 2 — exact counts for the ≤ k candidates only (map-side partial
  *     aggregation over ≤ k distinct keys), filtered to the true
  *     threshold. False candidates die here; true heavy hitters cannot
  *     have been lost in pass 1. The output is therefore EXACT — the
  *     sketch bounds the candidate set, never the answer.
  *
  * The corpus is scanned twice (the unavoidable price of exact counts —
  * one pass yields only estimates) but nothing corpus-sized is ever
  * shuffled or collected: pass 1 moves `partitions × k` longs, pass 2
  * moves ≤ k counted items, and the driver holds one ≤ k-long candidate
  * array (`maxSketchSize`-guarded).
  *
  * Items are sketched as xxhash64 HASHES, not strings, so the sketch
  * buffers stay 16 bytes/counter however long the items are. A hash
  * collision can only ADD a false candidate (pass 2's exact count then
  * removes it unless it genuinely clears the threshold) — a heavy item's
  * own hash always survives pass 1, so collisions never cost recall.
  *
  * This engine extension has no reference-repo counterpart (the
  * reference profiles nothing corpus-global); the published recipe above
  * is the attribution.
  */
object HeavyHitters {

  /** Driver-side candidate-set guard: pass 1 collects at most this many
    * candidate hashes (8 bytes each; the default caps the collect at
    * ~8 MB). */
  val DefaultMaxSketchSize: Int = 1 << 20

  /** Misra–Gries frequent-items summary over 64-bit item hashes, as a
    * typed Aggregator so Spark runs it with map-side partial aggregation.
    *
    * `reduce` lets the buffer grow to `2k` distinct keys before pruning
    * (the amortization [[TopKAggregator]] uses for its sort); each prune
    * and each `merge` applies the PODS-2012 combine: sum counters
    * pointwise, subtract the (size−k)-th smallest count from every
    * counter, drop the non-positive. Viewing every prune as a merge, the
    * mergeable-summaries bound gives total undercount ≤ n/(k+1) for any
    * merge tree, which is exactly the candidate guarantee pass 2 needs.
    */
  class MisraGriesAggregator(k: Int)
      extends Aggregator[Long, mutable.HashMap[Long, Long], Array[Long]] {

    require(k >= 1, s"sketch size must be >= 1, got $k")

    // (LongMap would dodge key boxing, but its defaultEntry closure field
    // breaks Kryo buffer decoding; HashMap + getOrElse/update keeps the
    // hot path Option-free and serializes cleanly.)
    private def prune(m: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
      if (m.size <= k) return m
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(m.size - k - 1) // (size-k)-th smallest: zeroes ≥ size-k entries
      m.filterInPlace((_, c) => c > sub).mapValuesInPlace((_, c) => c - sub)
    }

    override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

    override def reduce(buf: mutable.HashMap[Long, Long], h: Long): mutable.HashMap[Long, Long] = {
      buf.update(h, buf.getOrElse(h, 0L) + 1L)
      if (buf.size >= 2 * k) prune(buf) else buf
    }

    override def merge(
        a: mutable.HashMap[Long, Long],
        b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
      b.foreachEntry((h, c) => a.update(h, a.getOrElse(h, 0L) + c))
      prune(a)
    }

    override def finish(buf: mutable.HashMap[Long, Long]): Array[Long] = {
      val out = buf.keys.toArray
      java.util.Arrays.sort(out) // deterministic candidate order
      out
    }

    override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
      Encoders.kryo[mutable.HashMap[Long, Long]]

    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Exact heavy hitters: every distinct value of `itemCol` (cast to
    * string; nulls dropped) whose count strictly exceeds `minFrac * n`,
    * n = the non-null item count. Output: (item STRING, cnt BIGINT) —
    * exact counts, exact membership, same rows as the naive
    * `GROUP BY ... HAVING` at a fraction of its exchange.
    *
    * `sketchSize` defaults to ceil(1/minFrac), the smallest size whose
    * n/(k+1) guarantee covers the threshold; pass a larger value to
    * shrink pass 2's false-candidate overcollection (candidates between
    * n/(k+1) and minFrac·n). Sizes below 1/minFrac − 1 would silently
    * lose recall, so they are rejected loudly.
    *
    * The threshold compare is `CAST(cnt AS DOUBLE) > minFrac * n` with
    * the product computed once as one IEEE double multiply — the
    * engine-portable formulation ([[Curation.removeBoilerplate]]'s
    * convention), replayed verbatim by the DuckDB twin.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: Column,
      minFrac: Double,
      sketchSize: Int = 0,
      maxSketchSize: Int = DefaultMaxSketchSize): DataFrame = {
    require(minFrac > 0.0 && minFrac < 1.0, s"minFrac must be in (0,1), got $minFrac")
    val k = if (sketchSize > 0) sketchSize else math.ceil(1.0 / minFrac).toInt
    require(k.toDouble >= 1.0 / minFrac - 1.0,
      s"sketchSize=$k cannot guarantee recall at minFrac=$minFrac " +
        s"(needs >= ${math.ceil(1.0 / minFrac - 1.0).toLong}); " +
        "a smaller sketch would silently drop true heavy hitters")
    require(k <= maxSketchSize,
      s"sketchSize=$k exceeds maxSketchSize=$maxSketchSize; the candidate " +
        "set is a driver collect — raise the cap explicitly if intended")

    val items = df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)

    // pass 1: one scan -> (n, candidate hashes). The MG buffers are the
    // only state; the exchange is `partitions x k` counters.
    val mg = udaf(new MisraGriesAggregator(k))
    val first = items
      .agg(count(lit(1)).as("n"), mg(xxhash64(col("item"))).as("cands"))
      .head()
    val n = first.getLong(0)
    val cands = first.getSeq[Long](1)

    exactFromCandidates(df, itemCol, minFrac, cands, n)
  }

  /** Pass 2 alone: exact counts over the candidate rows only, thresholded
    * at `minFrac * totalN`. `candidateHashes` must be a SUPERSET of the
    * true heavy hitters' xxhash64 values (the Misra–Gries guarantee from
    * [[heavyHitters]]'s pass 1, or the union of per-shard summaries from
    * [[graft.streaming.Streams.heavyHittersStream]] — whose `shard_n` sums
    * to `totalN`, so the stream needs no extra counting scan). Extra
    * candidates only cost counted rows; they cannot change the output.
    */
  def exactFromCandidates(
      df: DataFrame,
      itemCol: Column,
      minFrac: Double,
      candidateHashes: Seq[Long],
      totalN: Long): DataFrame = {
    require(minFrac > 0.0 && minFrac < 1.0, s"minFrac must be in (0,1), got $minFrac")
    val items = df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
    if (totalN == 0L || candidateHashes.isEmpty)
      return items.select(col("item"), lit(0L).as("cnt")).limit(0)

    // InSet over the hash set (the removeBoilerplate discipline — an
    // isin() would build a k-literal In tree); partial aggregation sees
    // <= |candidates| distinct keys.
    val hset: Set[Any] = candidateHashes.toSet
    val isCand = Bridge.column(catalyst.expressions.InSet(
      Bridge.expression(xxhash64(col("item"))), hset))
    val threshold = minFrac * totalN.toDouble // one IEEE multiply, oracle-replayable
    items.filter(isCand)
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(threshold))
  }
}
