package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape AQE's skew split targets
  private lazy val skewed = spark.range(10000)
    .select(
      when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999L)).as("k"),
      $"id".as("payload"))
    .cache()

  private lazy val dim = Seq(
    (999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
    (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "label").cache()

  test("saltedJoin equals the plain inner join row-for-row") {
    val plain = skewed.join(dim, Seq("k"))
      .select($"k", $"payload", $"label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select($"k", $"payload", $"label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("saltedAggregate equals the direct aggregation (algebraic aggs)") {
    val direct = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"payload").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val salted = Skew.saltedAggregate(
      skewed, Seq("k"), salts = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum($"payload").as("pt")),
      finalAggs = Seq(sum($"pn").as("n"), sum($"pt").as("total")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(salted == direct)
  }

  test("salted plan spreads the hot key across salt values") {
    // the salted left side must actually use > 1 distinct salt for the
    // hot key (else the rewrite did nothing)
    val saltsUsed = skewed.filter($"k" === 999L)
      .withColumn("_salt", (rand(42) * 8).cast("int"))
      .select($"_salt").distinct().count()
    assert(saltsUsed > 4, s"hot key only spread over $saltsUsed salts")
  }
}
