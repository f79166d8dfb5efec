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
      // dedup primitives: hamming64 = popcount(xor); minhash_sig matches
      // the Scala-side kernel; winnow_fps matches operators.Dedup
      // .winnowingFingerprints' selection (q103 semantics)
      val d = spark.sql(
        """SELECT hamming64(11, 8) AS h,
          |       minhash_sig(array('a b c', 'b c d'), 16, 42) AS ms,
          |       winnow_fps('a b c d e f g h', 3, 4) AS wf,
          |       winnow_fps(CAST(NULL AS STRING), 3, 4) AS wfn""".stripMargin).head()
      assert(d.getInt(0) == 2, "11 xor 8 = 0b0011 -> 2 bits")
      assert(d.getSeq[Long](1).length == 16)
      import spark.implicits._
      val scalaFps = graft.operators.Dedup.winnowingFingerprints(
        Seq((1L, "a b c d e f g h")).toDF("id", "text"), "id", "text",
        shingleLen = 3, window = 4).as[(Long, String)].collect().map(_._2).toSet
      assert(d.getSeq[String](2).toSet == scalaFps,
        "SQL winnow_fps must match the operator's selection")
      assert(d.isNullAt(3), "null text yields NULL (explode drops it)")
      // table functions: the event/stats layer reachable from pure SQL.
      // Each TVF must equal its DataFrame operator on the same input.
      import spark.implicits._
      Seq((1L, 1000L, "a", 1.0), (1L, 2000L, "b", 2.0),
        (1L, 9000000L, "a", 4.0), (2L, 1000L, "c", 8.0))
        .toDF("user_id", "ts_ms", "event_type", "value")
        .createOrReplaceTempView("ext_events")
      val sess = spark.sql(
        """SELECT * FROM sessionize(TABLE(ext_events),
          |  'user_id', 'ts_ms', 'value', 600000)""".stripMargin)
      assert(sess.count() == 3, "user 1 splits on the 600s gap; user 2 one session")
      val tvfPr = spark.sql(
        """SELECT * FROM percent_ranks(TABLE(ext_events),
          |  'user_id', 'event_type', 'ts_ms') ORDER BY id, metric""".stripMargin)
        .collect().toSeq
      val opPr = graft.operators.Stats.percentRanks(
        spark.table("ext_events"), "user_id", "event_type", "ts_ms")
        .orderBy("id", "metric").collect().toSeq
      assert(tvfPr == opPr, "TVF must equal the DataFrame operator")
      val tvfZ = spark.sql(
        """SELECT * FROM robust_z(TABLE(ext_events),
          |  'user_id', 'event_type', 'ts_ms')""".stripMargin).count()
      assert(tvfZ == 4)
      val vz = spark.sql(
        "SELECT * FROM volume_z(TABLE(ext_events), 'event_type', 'ts_ms', 1000)")
      assert(vz.columns.toSeq == Seq("key", "bucket", "n", "z"))
      assert(vz.count() == 4)
      val tr = spark.sql(
        """SELECT * FROM transitions(TABLE(ext_events),
          |  'user_id', 'ts_ms', 'event_type', 3600000)""".stripMargin)
        .as[(String, String, Long)].collect().toSet
      assert(tr == Set(("a", "b", 1L), ("b", "a", 1L)),
        "user 1's timeline a->b->a; user 2 has no adjacency")
      val hh = spark.sql(
        """SELECT * FROM heavy_hitters(TABLE(ext_events), 'event_type', 0.3)
          |ORDER BY item""".stripMargin)
        .as[(String, Long)].collect().toSeq
      assert(hh == Seq(("a", 2L)), "only 'a' (2/4 = 0.5) clears 0.3")
      Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
        .toDF("id", "src").createOrReplaceTempView("ext_mix")
      val tmSql = spark.sql(
        "SELECT * FROM temperature_mix(TABLE(ext_mix), 'id', 'src', 0.5)")
        .as[(Long, String)].collect().toSet
      val tmOp = graft.operators.Curation.temperatureMix(
        spark.table("ext_mix"), "id", "src", 0.5)
        .as[(Long, String)].collect().toSet
      assert(tmSql == tmOp && tmSql.exists(_._2 == "b"),
        "TVF must equal the operator; the smallest source keeps everything")
      Seq(("q1", "a", 1L), ("q1", "x", 2L)).toDF("query_id", "id", "rank")
        .createOrReplaceTempView("ext_res")
      Seq(("q1", "a"), ("q1", "b")).toDF("query_id", "id")
        .createOrReplaceTempView("ext_gold")
      val ev = spark.sql(
        """SELECT query_id, n_gold, hits, rr
          |FROM retrieval_eval(TABLE(ext_res), TABLE(ext_gold), 2)""".stripMargin)
        .as[(String, Long, Long, Double)].collect().toSeq
      assert(ev == Seq(("q1", 2L, 1L, 1.0)),
        "two-TABLE-argument TVF must judge through the operator")
      // the LM-audit / telemetry layer (r13 advisory #8): token_entropy,
      // cardinality_profile, min_k_prob reachable from SQL like the dedup
      // primitives, each equal to its DataFrame operator
      Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
        .createOrReplaceTempView("ext_docs")
      val te = spark.sql(
        "SELECT * FROM token_entropy(TABLE(ext_docs), 'doc_id', 'text')")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(te(1L) == ((4L, 1L, 0L)),
        s"degenerate doc: 1 distinct token, zero entropy; got $te")
      assert(te(2L)._2 == 4L && te(2L)._3 > 13000L,
        s"uniform-4 doc: entropy ln(4)=1.386...; got $te")
      val cp = spark.sql(
        """SELECT key, n_rows, distinct_est
          |FROM cardinality_profile(TABLE(ext_events), 'user_id', 'event_type')
          |ORDER BY key""".stripMargin)
        .as[(String, Long, Long)].collect().toSeq
      assert(cp == Seq(("1", 3L, 2L), ("2", 1L, 1L)),
        s"small sets are exact under the HLL sketch; got $cp")
      val mk = spark.sql(
        """SELECT * FROM min_k_prob(TABLE(ext_docs), TABLE(ext_docs),
          |  'doc_id', 'text', 0.5)""".stripMargin)
      val mkOp = graft.text.NgramLm.minKProb(
        spark.table("ext_docs"), "doc_id", "text",
        graft.text.NgramLm.train(spark.table("ext_docs"), "text"), 0.5)
      assert(mk.collect().toSeq == mkOp.collect().toSeq,
        "min_k_prob TVF must equal the operator with the same-trained LM")
      // KN perplexity TVFs (r14 advisory #6): the actual quality-gate
      // scorer, reachable from SQL, equal to the operator column
      Seq((1L, "a b c a b c a b c"), (2L, "a b c x y z a b c"),
        (3L, "c b a c b a c b a")).toDF("doc_id", "text")
        .createOrReplaceTempView("ext_lm")
      val pk = spark.sql(
        """SELECT * FROM perplexity_kn(TABLE(ext_lm), TABLE(ext_lm),
          |  'doc_id', 'text') ORDER BY doc_id""".stripMargin)
        .as[(Long, Double)].collect().toSeq
      val pkOp = spark.table("ext_lm").select($"doc_id",
          graft.text.NgramLm.perplexityKn($"text",
            graft.text.NgramLm.trainKn(spark.table("ext_lm"), "text"))
            .as("perplexity"))
        .orderBy($"doc_id").as[(Long, Double)].collect().toSeq
      assert(pk == pkOp, "perplexity_kn TVF must equal the operator column")
      assert(pk.forall(_._2 > 0.0), "perplexities are positive")
      val pk3 = spark.sql(
        """SELECT * FROM perplexity_kn3(TABLE(ext_lm), TABLE(ext_lm),
          |  'doc_id', 'text') ORDER BY doc_id""".stripMargin)
        .as[(Long, Double)].collect().toSeq
      val pk3Op = spark.table("ext_lm").select($"doc_id",
          graft.text.NgramLm.perplexityKn3($"text",
            graft.text.NgramLm.trainKn3(spark.table("ext_lm"), "text"))
            .as("perplexity"))
        .orderBy($"doc_id").as[(Long, Double)].collect().toSeq
      assert(pk3 == pk3Op, "perplexity_kn3 TVF must equal the operator column")
      // the in-distribution doc scores lower (better) than the one with
      // the unseen x y z bridge under BOTH orders
      assert(pk.head._2 < pk(1)._2 && pk3.head._2 < pk3(1)._2,
        s"memorized text must score lower perplexity; got kn=$pk kn3=$pk3")
      val pkm = spark.sql(
        """SELECT * FROM perplexity_kn3_mod(TABLE(ext_lm), TABLE(ext_lm),
          |  'doc_id', 'text') ORDER BY doc_id""".stripMargin)
        .as[(Long, Double)].collect().toSeq
      val pkmOp = spark.table("ext_lm").select($"doc_id",
          graft.text.NgramLm.perplexityKn3Mod($"text",
            graft.text.NgramLm.trainKn3Mod(spark.table("ext_lm"), "text"))
            .as("perplexity"))
        .orderBy($"doc_id").as[(Long, Double)].collect().toSeq
      assert(pkm == pkmOp,
        "perplexity_kn3_mod TVF must equal the operator column")
      assert(pkm.head._2 < pkm(1)._2, s"memorized ordering holds: $pkm")

      // loud failures: wrong arity, and a TABLE-arg spec that would
      // otherwise be silently dropped
      val arityErr = intercept[Exception] {
        spark.sql(
          "SELECT * FROM sessionize(TABLE(ext_events), 'user_id', 'ts_ms', 'value')")
          .collect()
      }
      assert(arityErr.getMessage.contains("expects 5 arguments"),
        s"got: ${arityErr.getMessage}")
      val specErr = intercept[Exception] {
        spark.sql(
          """SELECT * FROM transitions(TABLE(ext_events) PARTITION BY (user_id),
            |  'user_id', 'ts_ms', 'event_type', 3600000)""".stripMargin)
          .collect()
      }
      assert(specErr.getMessage.contains("not supported"),
        s"got: ${specErr.getMessage}")
    } finally {
      // do not stop(): the SparkContext is shared with the suite session
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
