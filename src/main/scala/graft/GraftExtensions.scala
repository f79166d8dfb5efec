package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-extensions entry point: registers the engine's SQL functions at
  * session build time, so any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets `vec_cosine_sim` etc. in SQL
  * without touching the library's Scala API. The event/stats layer rides
  * along as TABLE functions (see [[GraftExtensions.tableFunctions]]);
  * already-running sessions get the same table functions via
  * [[GraftExtensions.registerTableFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("vec_cosine_sim", "cosine similarity of two numeric arrays (eps=1e-8 clamp)") {
      es => CosineSimilarity(es(0), es(1))
    }
    inject("vec_euclidean_dist", "euclidean distance of two numeric arrays") {
      es => EuclideanDistance(es(0), es(1))
    }
    inject("vec_dot_product", "raw inner product of two numeric arrays") {
      es => DotProduct(es(0), es(1))
    }
    inject("vec_norm", "L2 norm of a numeric array") { es => L2Norm(es(0)) }
    inject("vec_l2_normalize", "L2-normalize a numeric array (eps=1e-8)") {
      es => L2Normalize(es(0))
    }
    inject("simhash64", "64-bit SimHash fingerprint of an array<string>") {
      es => SimHash64(es(0))
    }
    inject("token_ngrams", "space-joined token n-grams of a string; n must be a literal") {
      es => TokenNgrams(es(0), intLit("token_ngrams", "n")(es(1)))
    }
    // dedup primitives — the near-dup building blocks reachable from pure
    // SQL like the vector kernels: minhash_sig + simhash64 feed banded
    // self-joins, hamming64 is the verify predicate, winnow_fps is the
    // MOSS shared-passage selection (the q103 semantics, identical column
    // chain as operators.Dedup.winnowFps)
    inject("minhash_sig",
      "MinHash signature (array<bigint>) of an array<string>; numHashes and seed must be literals") {
      es => MinHashSignature(es(0),
        intLit("minhash_sig", "numHashes")(es(1)),
        longLit("minhash_sig", "seed")(es(2)))
    }
    inject("hamming64", "Hamming distance between two 64-bit fingerprints") {
      es => org.apache.spark.sql.catalyst.expressions.BitwiseCount(
        org.apache.spark.sql.catalyst.expressions.BitwiseXor(es(0), es(1)))
    }
    inject("winnow_fps",
      "winnowing (MOSS) selected md5 fingerprints of a string; shingleLen and window must be literals") {
      es => WinnowFps(es(0),
        intLit("winnow_fps", "shingleLen")(es(1)),
        intLit("winnow_fps", "window")(es(2)))
    }

    tableFunctions.foreach { case (name, usage, arity, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info(name, usage),
        checkedArity(name, arity, builder)))
    }
  }
}

object GraftExtensions {

  private def intLit(fn: String, arg: String)(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }
  private def longLit(fn: String, arg: String)(e: Expression): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
      org.apache.spark.sql.types.LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }
  private def dblLit(fn: String, arg: String)(e: Expression): Double = e match {
    // SQL `0.0012` parses as a DECIMAL literal; accept the numeric trio
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal,
      _: org.apache.spark.sql.types.DecimalType) => v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double,
      org.apache.spark.sql.types.DoubleType) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got $other")
  }
  private def strLit(fn: String, arg: String)(e: Expression): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
      v: org.apache.spark.unsafe.types.UTF8String,
      org.apache.spark.sql.types.StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal naming a column, got $other")
  }
  private def tableArg(fn: String)(e: Expression): org.apache.spark.sql.DataFrame =
    e match {
      case t: org.apache.spark.sql.catalyst.expressions.FunctionTableSubqueryArgumentExpression =>
        // a PARTITION BY / ORDER BY / WITH SINGLE PARTITION spec on the
        // TABLE argument parses but would be silently DROPPED here (each
        // operator controls its own partitioning) — fail loudly instead
        require(t.partitionByExpressions.isEmpty && t.orderByExpressions.isEmpty &&
          !t.withSinglePartition,
          s"$fn: PARTITION BY / ORDER BY / WITH SINGLE PARTITION on the " +
            "TABLE argument are not supported — the operator plans its own " +
            "partitioning")
        org.apache.spark.sql.graftx.Bridge.ofRows(SparkSession.active, t.plan)
      case other => throw new IllegalArgumentException(
        s"$fn: the first argument must be TABLE(...), got $other")
    }

  /** Clean wrong-number-of-arguments failure instead of a raw
    * IndexOutOfBoundsException (too few) or silently ignored extras.
    */
  private def checkedArity(
      name: String, arity: Int,
      b: Seq[Expression] => LogicalPlan): Seq[Expression] => LogicalPlan =
    es => {
      require(es.length == arity,
        s"$name expects $arity arguments (TABLE(...) + ${arity - 1} " +
          s"literals), got ${es.length}")
      b(es)
    }
  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    org.apache.spark.sql.graftx.Bridge.plan(df)

  /** The round-two analytics layer as SQL TABLE functions (r12 advisory
    * #6): `SELECT * FROM sessionize(TABLE(events), 'user_id', 'ts_ms',
    * 'value', 1800000)`. Each builder receives the TABLE(...) child as a
    * FunctionTableSubqueryArgumentExpression, wraps it back into a
    * DataFrame (Bridge.ofRows on the ACTIVE session — builders run
    * during analysis, where one always exists), runs the ordinary
    * DataFrame operator, and returns ITS logical plan — SQL and Scala
    * share one implementation. Column arguments are string literals
    * (they name columns of the table argument, which SQL can't express
    * as references). One shared list so session-build injection and
    * live-session registration can't drift.
    */
  val tableFunctions: Seq[(String, String, Int, Seq[Expression] => LogicalPlan)] = Seq(
    ("sessionize",
      "sessionize(TABLE(t), userCol, tsMsCol, valueCol, gapMs): gap-closed sessions per user",
      5, es => plan(graft.operators.Sessionize.sessionize(
        tableArg("sessionize")(es(0)),
        strLit("sessionize", "userCol")(es(1)),
        strLit("sessionize", "tsMsCol")(es(2)),
        strLit("sessionize", "valueCol")(es(3)),
        longLit("sessionize", "gapMs")(es(4))))),
    ("percent_ranks",
      "percent_ranks(TABLE(t), idCol, keyCol, metricCol): per-key percent ranks (histogram form)",
      4, es => plan(graft.operators.Stats.percentRanks(
        tableArg("percent_ranks")(es(0)),
        strLit("percent_ranks", "idCol")(es(1)),
        strLit("percent_ranks", "keyCol")(es(2)),
        strLit("percent_ranks", "metricCol")(es(3))))),
    ("volume_z",
      "volume_z(TABLE(t), keyCol, tsCol, periodMs): per-key event-volume anomaly z-scores",
      4, es => plan(graft.operators.Stats.volumeZScores(
        tableArg("volume_z")(es(0)),
        strLit("volume_z", "keyCol")(es(1)),
        strLit("volume_z", "tsCol")(es(2)),
        longLit("volume_z", "periodMs")(es(3))))),
    ("robust_z",
      "robust_z(TABLE(t), idCol, keyCol, metricCol): median/MAD outlier z-scores",
      4, es => plan(graft.operators.Stats.robustZScores(
        tableArg("robust_z")(es(0)),
        strLit("robust_z", "idCol")(es(1)),
        strLit("robust_z", "keyCol")(es(2)),
        strLit("robust_z", "metricCol")(es(3))))),
    ("transitions",
      "transitions(TABLE(t), userCol, tsCol, typeCol, bucketMs): Markov transition counts",
      5, es => plan(graft.operators.Funnel.transitions(
        tableArg("transitions")(es(0)),
        strLit("transitions", "userCol")(es(1)),
        strLit("transitions", "tsCol")(es(2)),
        strLit("transitions", "typeCol")(es(3)),
        longLit("transitions", "bucketMs")(es(4))))),
    // EAGER builder: the two-pass sketch runs its jobs when the TVF is
    // analyzed (the candidate set is driver state by design) — an
    // EXPLAIN of a query over heavy_hitters therefore already pays
    // pass 1. Documented trade for having the exact-HH path in SQL.
    ("heavy_hitters",
      "heavy_hitters(TABLE(t), itemCol, minFrac): exact items above minFrac of the stream (two-pass Misra-Gries)",
      3, es => plan(graft.operators.HeavyHitters.heavyHitters(
        tableArg("heavy_hitters")(es(0)),
        org.apache.spark.sql.functions.col(strLit("heavy_hitters", "itemCol")(es(1))),
        dblLit("heavy_hitters", "minFrac")(es(2))))),
    // EAGER like heavy_hitters: the per-source counts are driver state
    ("temperature_mix",
      "temperature_mix(TABLE(t), idCol, sourceCol, alpha): alpha-sampled source mixing (keep-rates ~ n^(alpha-1))",
      4, es => plan(graft.operators.Curation.temperatureMix(
        tableArg("temperature_mix")(es(0)),
        strLit("temperature_mix", "idCol")(es(1)),
        strLit("temperature_mix", "sourceCol")(es(2)),
        dblLit("temperature_mix", "alpha")(es(3))))),
    ("retrieval_eval",
      "retrieval_eval(TABLE(results), TABLE(gold), k): recall/precision/MRR/nDCG per query",
      3, es => plan(graft.ml.RetrievalEval.judge(
        tableArg("retrieval_eval")(es(0)),
        tableArg("retrieval_eval")(es(1)),
        intLit("retrieval_eval", "k")(es(2))))),
    ("token_entropy",
      "token_entropy(TABLE(t), idCol, textCol): per-doc token Shannon entropy (lexical diversity)",
      3, es => plan(graft.text.TextAnalysis.tokenEntropy(
        tableArg("token_entropy")(es(0)),
        strLit("token_entropy", "idCol")(es(1)),
        strLit("token_entropy", "textCol")(es(2))))),
    ("cardinality_profile",
      "cardinality_profile(TABLE(t), keyCol, itemCol): per-key rows + HLL distinct estimate + mergeable sketch",
      3, es => plan(graft.operators.Stats.cardinalityProfile(
        tableArg("cardinality_profile")(es(0)),
        strLit("cardinality_profile", "keyCol")(es(1)),
        strLit("cardinality_profile", "itemCol")(es(2))))),
    // EAGER like heavy_hitters: training the reference LM is driver state
    // (distributed counts, deterministic prune, broadcast tables) paid at
    // analysis time — the trade for having the memorization audit in SQL
    ("min_k_prob",
      "min_k_prob(TABLE(docs), TABLE(ref), idCol, textCol, frac): Min-K% Prob membership audit against an add-k LM trained on ref",
      5, es => {
        val frac = dblLit("min_k_prob", "frac")(es(4))
        val textCol = strLit("min_k_prob", "textCol")(es(3))
        val model = graft.text.NgramLm.train(
          tableArg("min_k_prob")(es(1)), textCol)
        plan(graft.text.NgramLm.minKProb(
          tableArg("min_k_prob")(es(0)),
          strLit("min_k_prob", "idCol")(es(2)),
          textCol, model, frac))
      }),
    // EAGER like min_k_prob (training is driver state paid at analysis
    // time) — these close the r14 gap where the ACTUAL quality-gate
    // scorer (q145/q146 run perplexityKn) was unreachable from SQL while
    // the add-k audit already was
    ("perplexity_kn",
      "perplexity_kn(TABLE(docs), TABLE(ref), idCol, textCol): per-doc bigram Kneser-Ney perplexity against an LM trained on ref",
      4, es => {
        val textCol = strLit("perplexity_kn", "textCol")(es(3))
        val model = graft.text.NgramLm.trainKn(
          tableArg("perplexity_kn")(es(1)), textCol)
        val docs = tableArg("perplexity_kn")(es(0))
        plan(docs.select(
          org.apache.spark.sql.functions.col(strLit("perplexity_kn", "idCol")(es(2))),
          graft.text.NgramLm.perplexityKn(
            org.apache.spark.sql.functions.col(textCol), model).as("perplexity")))
      }),
    ("perplexity_kn3",
      "perplexity_kn3(TABLE(docs), TABLE(ref), idCol, textCol): per-doc trigram Kneser-Ney perplexity against an LM trained on ref",
      4, es => {
        val textCol = strLit("perplexity_kn3", "textCol")(es(3))
        val model = graft.text.NgramLm.trainKn3(
          tableArg("perplexity_kn3")(es(1)), textCol)
        val docs = tableArg("perplexity_kn3")(es(0))
        plan(docs.select(
          org.apache.spark.sql.functions.col(strLit("perplexity_kn3", "idCol")(es(2))),
          graft.text.NgramLm.perplexityKn3(
            org.apache.spark.sql.functions.col(textCol), model).as("perplexity")))
      }),
    ("perplexity_kn3_mod",
      "perplexity_kn3_mod(TABLE(docs), TABLE(ref), idCol, textCol): per-doc MODIFIED-KN trigram perplexity (estimated d1/d2/d3+ discounts) against an LM trained on ref",
      4, es => {
        val textCol = strLit("perplexity_kn3_mod", "textCol")(es(3))
        val model = graft.text.NgramLm.trainKn3Mod(
          tableArg("perplexity_kn3_mod")(es(1)), textCol)
        val docs = tableArg("perplexity_kn3_mod")(es(0))
        plan(docs.select(
          org.apache.spark.sql.functions.col(strLit("perplexity_kn3_mod", "idCol")(es(2))),
          graft.text.NgramLm.perplexityKn3Mod(
            org.apache.spark.sql.functions.col(textCol), model).as("perplexity")))
      }))

  /** Register the TABLE functions on an already-running session (the
    * extension path only applies at session build; Verify/notebooks run
    * on shared sessions). Idempotent — re-registration replaces.
    */
  def registerTableFunctions(spark: SparkSession): Unit =
    tableFunctions.foreach { case (name, _, arity, builder) =>
      org.apache.spark.sql.graftx.Bridge.registerTableFunction(
        spark, name, checkedArity(name, arity, builder))
    }
}
