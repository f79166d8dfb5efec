package graft.ml

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class RetrievalEvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // q1: gold {a,b,c}; retrieved a@1, x@2, b@3  -> hits 2, first 1
  // q2: gold {d};     retrieved y@1, z@2, w@3  -> all miss
  // q3: gold {e,f};   not retrieved at all     -> scored as all-miss
  private val results = Seq(
    ("q1", "a", 1L), ("q1", "x", 2L), ("q1", "b", 3L),
    ("q2", "y", 1L), ("q2", "z", 2L), ("q2", "w", 3L),
    ("q4", "a", 1L) // q4 has no gold -> must not be scored
  ).toDF("query_id", "id", "rank")

  private val gold = Seq(
    ("q1", "a"), ("q1", "b"), ("q1", "c"),
    ("q2", "d"),
    ("q3", "e"), ("q3", "f")
  ).toDF("query_id", "id")

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("per-query metrics match hand-computed IR definitions") {
    val out = RetrievalEval.judge(results, gold, k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("q1", "q2", "q3"))

    val q1 = out("q1")
    assert(q1.getLong(1) == 3L && q1.getLong(2) == 2L) // n_gold, hits
    assert(q1.getLong(3) == 1L)                        // first_rank
    assert(q1.getDouble(4) == 2.0 / 3.0)               // recall
    assert(q1.getDouble(5) == 2.0 / 3.0)               // precision
    assert(q1.getDouble(6) == 1.0)                     // rr
    val dcg = 1.0 / log2(2.0) + 1.0 / log2(4.0)
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(q1.getDouble(7) - dcg) < 1e-12)
    assert(math.abs(q1.getDouble(8) - idcg) < 1e-12)
    assert(math.abs(q1.getDouble(9) - dcg / idcg) < 1e-12)

    val q2 = out("q2")
    assert(q2.getLong(2) == 0L && q2.isNullAt(3))
    assert(q2.getDouble(4) == 0.0 && q2.getDouble(6) == 0.0)
    assert(q2.getDouble(9) == 0.0)

    val q3 = out("q3") // judged query absent from results entirely
    assert(q3.getLong(1) == 2L && q3.getLong(2) == 0L && q3.getDouble(6) == 0.0)
  }

  test("rows beyond k are ignored, so one deep result set sweeps k") {
    // at k=1 only a@1 counts: hits 1, recall 1/3, precision 1
    val out = RetrievalEval.judge(results, gold, k = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val q1 = out("q1")
    assert(q1.getLong(2) == 1L)
    assert(q1.getDouble(4) == 1.0 / 3.0)
    assert(q1.getDouble(5) == 1.0)
  }

  test("graded relevance: gains 2^grade - 1 drive dcg and the ideal ordering") {
    val res = Seq(("q1", "b", 1L), ("q1", "a", 2L)).toDF("query_id", "id", "rank")
    // a is the highly-relevant doc (grade 3 -> gain 7) retrieved BELOW the
    // marginal b (grade 1 -> gain 1): dcg must pay for the inversion
    val g = Seq(("q1", "a", 3.0), ("q1", "b", 1.0), ("q1", "a", 1.0))
      .toDF("query_id", "id", "grade") // duplicate a keeps the max grade
    val row = RetrievalEval.judge(res, g, k = 3, gradeCol = Some("grade")).head()
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L) // n_gold, hits
    val dcg = 1.0 / log2(2.0) + 7.0 / log2(3.0)
    val idcg = 7.0 / log2(2.0) + 1.0 / log2(3.0)
    assert(math.abs(row.getDouble(7) - dcg) < 1e-12)
    assert(math.abs(row.getDouble(8) - idcg) < 1e-12)
    assert(row.getDouble(9) < 1.0, "the inversion must cost ndcg")
    // binary call on the same data reduces to gain 1 everywhere
    val bin = RetrievalEval.judge(res, g.drop("grade"), k = 3).head()
    assert(bin.getDouble(9) == 1.0, "binary: both gold retrieved in top k")
  }

  test("judged-irrelevant (grade 0) rows count for nothing; all-zero query " +
      "unscored, ndcg never NaN") {
    val res = Seq(("q1", "a", 1L), ("q1", "b", 2L), ("q2", "z", 1L))
      .toDF("query_id", "id", "rank")
    // q1: a relevant (2), b judged-IRRELEVANT (0) — retrieving b is a miss;
    // q2: every judgment grade 0 — no relevant set, must not be scored
    val g = Seq(("q1", "a", 2.0), ("q1", "b", 0.0), ("q1", "c", 1.0),
      ("q2", "z", 0.0), ("q2", "w", 0.0)).toDF("query_id", "id", "grade")
    val out = RetrievalEval.judge(res, g, k = 3, gradeCol = Some("grade"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("q1"), s"grade-0-only q2 must be unscored: $out")
    val q1 = out("q1")
    assert(q1.getLong(1) == 2L, "n_gold counts only grade>0 judgments")
    assert(q1.getLong(2) == 1L, "hit on b (grade 0) must not count")
    assert(q1.getDouble(4) == 0.5 && q1.getDouble(5) == 1.0 / 3.0)
    val dcg = 3.0 / log2(2.0)
    val idcg = 3.0 / log2(2.0) + 1.0 / log2(3.0)
    assert(math.abs(q1.getDouble(9) - dcg / idcg) < 1e-12)
    assert(!out.values.exists(r => !r.isNullAt(9) && r.getDouble(9).isNaN))
  }

  test("duplicate gold judgments collapse; summarize macro-averages") {
    val dupGold = gold.union(Seq(("q1", "a")).toDF("query_id", "id"))
    val per = RetrievalEval.judge(results, dupGold, k = 3)
    val q1 = per.collect().map(r => r.getString(0) -> r).toMap.apply("q1")
    assert(q1.getLong(1) == 3L) // still 3 gold, not 4

    val s = RetrievalEval.summarize(per).head()
    assert(s.getLong(0) == 3L)
    assert(math.abs(s.getDouble(2) - (1.0 + 0.0 + 0.0) / 3.0) < 1e-12) // mrr
  }
}
