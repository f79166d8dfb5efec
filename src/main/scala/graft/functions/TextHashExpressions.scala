package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels for near-duplicate detection (scale extensions beyond the
  * reference — SURVEY.md §7.1 step 8).
  *
  * Both are single-pass Catalyst expressions over an array<string> column
  * (token or shingle sets). ANSI mode makes long-multiply overflow throw in
  * SQL arithmetic, so the classic (a*h + b) MinHash permutations live here in
  * Java-wrapping arithmetic instead of Column math.
  */
object TextHashUtil {

  /** Deterministic permutation constants for a given seed. */
  def permConstants(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd => bijective mod 2^64
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  /** MinHash signature of a string array: out[i] = min over elements of
    * (a_i * xxh64(elem, seed) + b_i), wrapping arithmetic.
    */
  def minhash(arr: ArrayData, a: Array[Long], b: Array[Long], seed: Long): ArrayData = {
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      var i = 0
      while (i < k) {
        val v = a(i) * base + b(i)
        if (v < out(i)) out(i) = v
        i += 1
      }
      e += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a string array: per-element xxh64, sum +1/-1 per bit,
    * sign of each bit-count forms the fingerprint.
    */
  def simhash(arr: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      e += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  private[functions] def checkStringArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string>, got ${other.simpleString}")
    }

  /** Distinct token n-gram shingles of a text string — the single-pass
    * kernel behind [[TokenShingles]]. Byte-for-byte equivalent to the
    * Column formula
    * `array_distinct(transform(sequence(1, size(toks)-(n-1)),
    *    i => array_join(slice(toks, i, n), " ")))` with
    * `toks = split(text, " ")` (falling back to the whole-text join when the
    * doc has fewer than n tokens) — but ~100x faster: `transform` is a
    * higher-order function Catalyst always evaluates INTERPRETED (lambda
    * expressions have no codegen), and per shingle it allocates a slice
    * array, a joined string and a distinct-scan, where this kernel emits
    * each shingle as a zero-copy substring view of the original bytes.
    *
    * Why substrings suffice: `split(text, " ")` (a literal single-space
    * regex, limit -1) cuts at EVERY space byte and keeps empty tokens, so
    * tokens are exactly the byte ranges between space bytes and
    * `array_join(slice(toks, i, n), " ")` reconstructs the contiguous
    * original byte range from token i's start to token i+n-1's end. A space
    * byte (0x20) never occurs inside a UTF-8 multibyte sequence, so byte
    * scanning is character-safe.
    */
  /** Occurrence count of array elements belonging to `set` (nulls skipped).
    * The kernel behind [[CountInSet]].
    */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  def shingles(str: UTF8String, n: Int): ArrayData =
    ngramCore(str, n, distinct = true, shortDocWhole = true)

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Winnowing (MOSS) fingerprint selection — the kernel behind
    * [[WinnowFps]] and [[graft.operators.Dedup.winnowingFingerprints]]:
    * md5-hex every positional n-gram, slide a window of `w` hashes, keep
    * each window's LEXICOGRAPHIC minimum, distinct in first-occurrence
    * order. Byte-for-byte the declarative
    * `array_distinct(<window minima over transform(token_ngrams, md5)>)`
    * formula (md5 = lowercase hex of the gram's UTF-8 bytes; hex-string
    * lexicographic order == unsigned digest order), with the same edge
    * rules: empty for a shingle-less doc, the single overall minimum for a
    * doc of fewer than `w` grams. One pass, one digest per gram — the
    * O(n²)-recompute trap of an inlined lambda chain can't exist here.
    */
  def winnowFps(str: UTF8String, n: Int, w: Int): ArrayData = {
    val grams = allNgrams(str, n)
    val len = grams.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      val digest = md.digest(grams.getUTF8String(i).getBytes)
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((digest(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexDigits(digest(j) & 0xf)
        j += 1
      }
      hashes(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    val lastStart = if (len < w) 0 else len - w
    val width = math.min(w, len)
    var s = 0
    while (s <= lastStart) {
      var m = hashes(s)
      var j = s + 1
      while (j < s + width) {
        if (hashes(j).compareTo(m) < 0) m = hashes(j)
        j += 1
      }
      out.add(m)
      s += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** All (non-distinct) n-grams, empty array for sub-n-token docs — the
    * kernel behind [[TokenNgrams]]; byte-equivalent to
    * `when(size(toks) >= n, transform(sequence(0, size(toks)-n),
    *    i => array_join(slice(toks, i+1, n), " "))).otherwise(array())`.
    */
  def allNgrams(str: UTF8String, n: Int): ArrayData =
    ngramCore(str, n, distinct = false, shortDocWhole = false)

  private def ngramCore(
      str: UTF8String, n: Int, distinct: Boolean, shortDocWhole: Boolean): ArrayData = {
    val bytes = str.getBytes // one materialization; n-grams are views into it
    // token boundaries: starts(i) .. ends(i) exclusive, empties kept
    val nBytes = bytes.length
    var nToks = 1
    var i = 0
    while (i < nBytes) { if (bytes(i) == 0x20) nToks += 1; i += 1 }
    val count = nToks - (n - 1)
    val out = new java.util.ArrayList[UTF8String]()
    if (count < 1) {
      // fewer than n tokens: whole-text fallback (shingles) or none (ngrams)
      if (shortDocWhole) out.add(UTF8String.fromBytes(bytes))
    } else {
      // starts(k) = byte offset of token k; n-gram i spans
      // starts(i) .. end of token i+n-1 (the byte before starts(i+n), or EOS)
      val starts = new Array[Int](nToks + 1)
      var k = 1
      i = 0
      while (i < nBytes) {
        if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
        i += 1
      }
      starts(nToks) = nBytes + 1 // virtual delimiter past the end
      val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
      var s = 0
      while (s < count) {
        val begin = starts(s)
        val end = starts(s + n) - 1
        val sh = UTF8String.fromBytes(bytes, begin, end - begin)
        if (seen == null || seen.add(sh)) out.add(sh)
        s += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** minhash_signature(shingles) -> array<bigint> of length numHashes. */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 1024, s"numHashes out of range: $numHashes")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashUtil.checkStringArray(child.dataType, prettyName)

  @transient private lazy val (aConsts, bConsts) =
    TextHashUtil.permConstants(numHashes, seed)

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.minhash(v.asInstanceOf[ArrayData], aConsts, bConsts, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", aConsts, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bConsts, "long[]")
      s"${ev.value} = graft.functions.TextHashUtil.minhash($arr, $aRef, $bRef, ${seed}L);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** token_shingles(text, n) -> array<string> of distinct n-gram shingles
  * (whitespace tokens, first-occurrence order). See [[TextHashUtil.shingles]]
  * for the exact split/join/distinct semantics this preserves.
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, s"shingle length out of range: $n")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.shingles(v.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.shingles($str, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** count_in_set(arr, values) -> int: occurrences (duplicates counted) of
  * array elements that belong to a fixed string set. Drop-in for
  * `size(filter(arr, t => t.isin(values)))`, whose lambda Catalyst can only
  * interpret — this is the hot kernel of stopword-ratio language ID, which
  * evaluates one such filter per candidate language per row.
  */
case class CountInSet(child: Expression, values: Seq[String]) extends UnaryExpression {
  require(values.nonEmpty, "empty value set")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in_set"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashUtil.checkStringArray(child.dataType, prettyName)

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.countInSet(v.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val setRef = ctx.addReferenceObj("countInSet", set, "java.util.HashSet")
      s"${ev.value} = graft.functions.TextHashUtil.countInSet($arr, $setRef);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** token_ngrams(text, n) -> array<string> of ALL n-grams in order
  * (duplicates kept; empty for sub-n-token docs). The multiplicity-
  * preserving sibling of [[TokenShingles]] — see [[TextHashUtil.allNgrams]].
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, s"ngram length out of range: $n")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.allNgrams(v.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.allNgrams($str, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_fps(text, shingleLen, window) -> array<string> of the winnowing
  * (MOSS) selected md5 fingerprints — see [[TextHashUtil.winnowFps]] for
  * the exact selection semantics (oracle-locked by q103/q106/q110). NULL
  * text -> NULL (explode drops it, preserving the "shingle-less document
  * contributes nothing" contract downstream).
  */
case class WinnowFps(child: Expression, shingleLen: Int, window: Int)
    extends UnaryExpression {
  require(shingleLen >= 1 && shingleLen <= 64,
    s"shingle length out of range: $shingleLen")
  require(window >= 1, s"window must be >= 1, got $window")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.winnowFps(v.asInstanceOf[UTF8String], shingleLen, window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.winnowFps($str, $shingleLen, $window);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(tokens) -> bigint fingerprint. */
case class SimHash64(child: Expression, seed: Long = 42L) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashUtil.checkStringArray(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.simhash(v.asInstanceOf[ArrayData], seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TextHashUtil.simhash($arr, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
