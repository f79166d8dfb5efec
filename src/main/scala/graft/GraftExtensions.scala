package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: registers the engine's SQL functions at
  * session build time, so any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets `vec_cosine_sim` etc. in SQL
  * without touching the library's Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

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
    def intLit(fn: String, arg: String)(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
    def longLit(fn: String, arg: String)(e: Expression): Long = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
        org.apache.spark.sql.types.LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
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
  }
}
