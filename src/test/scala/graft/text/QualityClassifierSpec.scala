package graft.text

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // disjoint vocabularies make the boundary learnable; held-out docs reuse
  // the vocabularies with fresh seeds
  private def doc(vocab: IndexedSeq[String], seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }
  private val goodVocab = (0 until 80).map(i => s"good$i")
  private val spamVocab = (0 until 80).map(i => s"spam$i")

  private lazy val model = QualityClassifier.train(
    positives = (0 until 60).map(i => doc(goodVocab, i)).toDF("text"),
    negatives = (0 until 60).map(i => doc(spamVocab, 1000 + i)).toDF("text"),
    "text", numFeatures = 1 << 12, maxIter = 20)

  test("classifier separates held-out good from spam documents") {
    val heldOut = ((0 until 20).map(i => (i.toLong, doc(goodVocab, 5000 + i))) ++
      (0 until 20).map(i => (100L + i, doc(spamVocab, 6000 + i))))
      .toDF("doc_id", "text")
    val probs = QualityClassifier.score(heldOut, "doc_id", "text", model)
      .as[(Long, Double)].collect().toMap
    val good = (0 until 20).map(i => probs(i.toLong))
    val spam = (0 until 20).map(i => probs(100L + i))
    assert(good.forall(_ > 0.8), s"good doc scored low: ${good.min}")
    assert(spam.forall(_ < 0.2), s"spam doc scored high: ${spam.max}")
  }

  test("scoring is deterministic and shuffle-free") {
    val docs = (0 until 10).map(i => (i.toLong, doc(goodVocab, i))).toDF("doc_id", "text")
    val scored = QualityClassifier.score(docs, "doc_id", "text", model)
    val a = scored.as[(Long, Double)].collect().sortBy(_._1).toSeq
    val b = scored.as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    val plan = scored.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("pareto lottery keeps nearly all high scores, few low, deterministically") {
    val scored = ((0 until 500).map(i => (i.toLong, 0.999)) ++
      (0 until 500).map(i => (1000L + i, 0.01)))
      .toDF("doc_id", "quality_prob")
    val kept = QualityClassifier.paretoFilter(scored, "doc_id")
      .as[(Long, Double)].collect().map(_._1).toSet
    val keptHigh = kept.count(_ < 500)
    val keptLow = kept.count(_ >= 1000)
    // Pareto(9) exceeds 0.001 w.p. ~0.991, exceeds 0.99 w.p. ~0.002
    assert(keptHigh > 470, s"high-quality survival too low: $keptHigh/500")
    assert(keptLow < 25, s"low-quality survival too high: $keptLow/500")
    // deterministic: same ids survive on re-evaluation
    val again = QualityClassifier.paretoFilter(scored, "doc_id")
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(kept == again)
  }
}
