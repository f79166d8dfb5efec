package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions register SQL functions at session build time") {
    // extensions only apply at session construction; clear the suite-shared
    // active/default session so getOrCreate builds a fresh one (the
    // underlying SparkContext is reused), then restore afterwards
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT vec_cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |       vec_norm(vec_l2_normalize(array(3.0F, 4.0F))) AS n,
          |       simhash64(array('a', 'b')) AS f,
          |       token_ngrams('a b c', 2) AS g""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
      assert(r.getLong(2) != 0L)
      assert(r.getSeq[String](3) == Seq("a b", "b c"))
    } finally {
      // do not stop(): the SparkContext is shared with the suite session
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
