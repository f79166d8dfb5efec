package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys.
  *
  * Prefer AQE first: `spark.sql.adaptive.skewJoin` already splits oversized
  * sort-merge partitions at runtime and is on in every session this engine
  * builds. Explicit salting is for the cases AQE cannot see or cannot split —
  * a skewed key feeding a single aggregation bucket, a broadcast-ineligible
  * dimension with one hot key, or a stage whose skew only materializes after
  * a UDF. The transform is the standard one: fact rows get a uniform salt in
  * [0, salts), the other side is replicated across every salt value, and the
  * join key becomes (key, salt) — splitting each hot key's row group across
  * `salts` reducers at the cost of replicating the smaller side `salts`
  * times.
  */
object Skew {

  /** Inner equi-join with a salted key. `left` is the large/skewed side
    * (salted uniformly); `right` is replicated across all salt values.
    * Result equals `left.join(right, keys, "inner")` row-for-row.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(keys.nonEmpty, "need at least one join key")
    val saltedLeft = left.withColumn("_salt",
      (rand(42) * salts).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, keys :+ "_salt")
      .drop("_salt")
  }

  /** Two-phase (salted partial + final) aggregation for skewed group keys:
    * count/sum-style aggregates compute per (key, salt) first — spreading a
    * hot key over `salts` reducers — then merge per key. `partialAggs` must
    * be algebraic (re-aggregatable): sums of sums, counts as sums, min/max.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(salts >= 1 && keys.nonEmpty && partialAggs.nonEmpty)
    df.withColumn("_salt", (rand(42) * salts).cast("int"))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
