package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation kernel: applies a trained merge table to text, one
  * whitespace word at a time (the classic Sennrich/Haddow/Birch 2016
  * algorithm — characters merge bottom-up in merge-priority order).
  * Single-pass per row against a broadcast-by-reference rank map, inside
  * whole-stage codegen via the static helper.
  */
object BpeUtil {

  /** End-of-word marker appended to each word's final symbol, as published
    * (distinguishes "low" as a suffix from "low " as a word).
    */
  val EndOfWord = "</w>"

  /** Merge ranks: (left, right) -> priority (0 = learned first). */
  type Ranks = java.util.HashMap[String, Integer]

  def rankKey(a: String, b: String): String = a + " " + b

  /** Segment one word (no whitespace) into BPE symbols. */
  def segmentWord(word: String, ranks: Ranks): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      syms(i) = String.valueOf(word.charAt(i))
      i += 1
    }
    syms(word.length - 1) = syms(word.length - 1) + EndOfWord
    // repeatedly merge the best-ranked adjacent pair (ties cannot happen:
    // ranks are unique by construction)
    var done = false
    while (!done && syms.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(rankKey(syms(j), syms(j + 1)))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, best)
        merged(best) = syms(best) + syms(best + 1)
        System.arraycopy(syms, best + 2, merged, best + 1,
          syms.length - best - 2)
        syms = merged
      }
    }
    syms
  }

  /** Segment whole text: whitespace-split words, each BPE-segmented. */
  def segment(text: UTF8String, ranks: Ranks): ArrayData = {
    val words = text.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val syms = segmentWord(words(w), ranks)
        var s = 0
        while (s < syms.length) {
          out += UTF8String.fromString(syms(s))
          s += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def count(text: UTF8String, ranks: Ranks): Long = {
    val words = text.toString.split("\\s+")
    var n = 0L
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) n += segmentWord(words(w), ranks).length
      w += 1
    }
    n
  }
}

/** bpe_segment(text) -> array<string> of BPE symbols. */
case class BpeSegment(child: Expression, ranks: BpeUtil.Ranks)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_segment"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BpeUtil.segment(v.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val ref = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeUtil.segment($str, $ref);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_count(text) -> bigint BPE token count (no array materialization). */
case class BpeCount(child: Expression, ranks: BpeUtil.Ranks)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BpeUtil.count(v.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val ref = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeUtil.count($str, $ref);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
