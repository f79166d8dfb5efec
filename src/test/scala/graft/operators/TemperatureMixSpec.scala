package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class TemperatureMixSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 3 sources with counts 400 / 100 / 25 — a 16:4:1 natural skew
  private def corpus = {
    val rows = (1L to 400L).map((_, "big")) ++
      (401L to 500L).map((_, "mid")) ++
      (501L to 525L).map((_, "small"))
    rows.toDF("id", "src")
  }

  test("alpha=0.5 rates are sqrt(n_min/n), smallest source kept whole") {
    val r = Curation.temperatureRates(corpus, "src", alpha = 0.5)
    assert(r("small") == 1.0)
    assert(r("mid") == math.sqrt(25.0 / 100.0))
    assert(r("big") == math.sqrt(25.0 / 400.0))
  }

  test("alpha=1 keeps the natural distribution (all rates 1)") {
    val r = Curation.temperatureRates(corpus, "src", alpha = 1.0)
    assert(r.values.forall(_ == 1.0))
    assert(Curation.temperatureMix(corpus, "id", "src", 1.0).count() == 525L)
  }

  test("alpha<1 flattens: expected sampled counts proportional to n^alpha") {
    val kept = Curation.temperatureMix(corpus, "id", "src", 0.5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected kept ~ n * sqrt(n_min/n) = sqrt(n * n_min): 100 / 50 / 25
    assert(kept("small") == 25L) // rate 1.0 keeps everything
    assert(math.abs(kept("mid") - 50L) <= 10, s"mid=${kept("mid")}")
    assert(math.abs(kept("big") - 100L) <= 20, s"big=${kept("big")}")
    // and the flattening is real: big/small ratio falls from 16x to ~4x
    assert(kept("big").toDouble / kept("small") < 8.0)
  }

  test("alpha>1 sharpens: anchor flips to the largest source") {
    val r = Curation.temperatureRates(corpus, "src", alpha = 1.5)
    assert(r("big") == 1.0)
    assert(r("small") == math.sqrt(25.0 / 400.0))
  }

  test("the kept set is deterministic and a fixed-point under re-run") {
    val a = Curation.temperatureMix(corpus, "id", "src", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.temperatureMix(corpus, "id", "src", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("maxSources guard trips loudly") {
    val ex = intercept[IllegalArgumentException] {
      Curation.temperatureRates(corpus, "src", 0.5, maxSources = 2)
    }
    assert(ex.getMessage.contains("maxSources"))
  }

  test("empty input yields no rates") {
    assert(Curation.temperatureRates(
      corpus.filter($"id" < 0), "src", 0.5).isEmpty)
  }
}
