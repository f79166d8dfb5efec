package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (scale extension).
  *
  * Everything except the chunker is pure Column expressions (codegen'd, no
  * UDF). The chunker is inherently sequential per document, so it's a Scala
  * function lifted to a UDF and exploded — one row in, n chunk rows out
  * (SURVEY.md §2.10: generator shape).
  */
object TextAnalysis {

  // ------------------------------------------------------------- tokenizing

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword-boundary token count: word pieces plus standalone
    * punctuation, the usual pre-tokenization shape for byte-pair encoders.
    */
  def regexTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9_])|(?<=[^A-Za-z0-9_])"),
      t => length(t) > 0 && t =!= " ")).cast("long")

  // ---------------------------------------------------------- language id

  /** Tiny built-in stopword profiles (top function words per language). */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"))

  /** Fraction of tokens found in `stops` (duplicates counted). Codegen'd
    * kernel ([[graft.functions.CountInSet]]) — value-identical to
    * `size(filter(toks, t => t.isin(stops)))`, whose lambda Catalyst can
    * only interpret; language ID evaluates one such count per candidate
    * language per row, so this is the hot path of q21.
    */
  def stopwordRatio(toks: Column, stops: Seq[String]): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      graft.functions.CountInSet(
        org.apache.spark.sql.graftx.Bridge.expression(toks), stops))
      .cast("double") / greatest(size(toks), lit(1))

  /** Share of characters inside a script range (regex char class kept in
    * \\u escapes — a non-UTF-8 build locale must not mangle the class).
    */
  private def scriptRatio(text: Column, charClass: String): Column =
    length(regexp_replace(text, charClass, "")).cast("double") /
      greatest(length(text), lit(1))

  /** CJK Unified Ideographs (kanji/hanzi) share. */
  def cjkRatio(text: Column): Column = scriptRatio(text, "[^\u4E00-\u9FFF]")

  /** Hiragana + katakana share — kana presence separates ja from zh. */
  def kanaRatio(text: Column): Column = scriptRatio(text, "[^\u3040-\u30FF]")

  /** Hangul syllables share. */
  def hangulRatio(text: Column): Column = scriptRatio(text, "[^\uAC00-\uD7AF]")

  /** Japanese-script share (kana + kanji together). */
  def japaneseScriptRatio(text: Column): Column =
    scriptRatio(text, "[^\u3040-\u30FF\u4E00-\u9FFF]")

  /** Script-detection thresholds: above `CjkThreshold` total script share a
    * doc is labeled by script (ja needs `KanaThreshold` of kana on top —
    * kanji-only text is zh, kanji+kana is ja), before any stopword scoring.
    */
  val CjkThreshold = 0.3
  val KanaThreshold = 0.05

  /** n-gram-heuristic language ID: argmax of per-language stopword ratios.
    * Returns struct(lang: string, confidence: double); lang = "und"
    * (undetermined) when no profile matches at all.
    *
    * NOTE: fine for one-off use; inside a wide projection prefer
    * [[withLanguageId]] — this Column form inlines each per-language filter
    * into every `when` branch (HOF lambdas defeat subexpression elimination).
    */
  def languageId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      lang -> stopwordRatio(toks, stops)
    }
    val best = greatest(scored.map(_._2): _*)
    val latin = scored.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // script detection outranks stopwords; NOTE the confidence SCALE differs
    // by branch — script share for ja/ko/zh, stopword-token ratio for latin
    // languages — so confidence cutoffs must be per-language
    val jp = japaneseScriptRatio(text)
    val kana = kanaRatio(text)
    val hangul = hangulRatio(text)
    val kanji = cjkRatio(text)
    val isJa = jp > CjkThreshold && kana > KanaThreshold
    val isKo = hangul > CjkThreshold
    val isZh = kanji > CjkThreshold
    struct(
      when(isJa, lit("ja")).when(isKo, lit("ko")).when(isZh, lit("zh"))
        .otherwise(latin).as("lang"),
      when(isJa, jp).when(isKo, hangul).when(isZh, kanji)
        .otherwise(best).as("confidence"))
  }

  /** Staged language ID: per-language scores are materialized as aliased
    * columns in their own projection, so each stopword filter evaluates once
    * per row regardless of how many argmax branches reference it
    * (CollapseProject keeps non-cheap multi-referenced aliases staged).
    * Appends `langCol` and `confCol`.
    */
  def withLanguageId(
      df: DataFrame,
      textCol: String,
      langCol: String = "lang",
      confCol: String = "confidence"): DataFrame = {
    val toksCol = "_lid_toks"
    val profiles = StopwordProfiles.toSeq.sortBy(_._1)
    val scoreCols = profiles.map { case (l, _) => s"_lid_$l" }
    val scriptCols = Seq("_lid_jp", "_lid_kana", "_lid_hangul", "_lid_kanji")
    val staged = df
      .withColumn(toksCol, tokens(lower(col(textCol))))
      .select(col("*") +: (profiles.map { case (l, stops) =>
        stopwordRatio(col(toksCol), stops).as(s"_lid_$l")
      } ++ Seq(
        japaneseScriptRatio(col(textCol)).as("_lid_jp"),
        kanaRatio(col(textCol)).as("_lid_kana"),
        hangulRatio(col(textCol)).as("_lid_hangul"),
        cjkRatio(col(textCol)).as("_lid_kanji"))): _*)
    val best = greatest(scoreCols.map(col): _*)
    val latin = profiles.map(_._1).zip(scoreCols).foldLeft(lit("und")) {
      case (acc, (l, sc)) => when(col(sc) === best && best > 0, lit(l)).otherwise(acc)
    }
    // same branch order + confidence scales as [[languageId]]
    val isJa = col("_lid_jp") > CjkThreshold && col("_lid_kana") > KanaThreshold
    val isKo = col("_lid_hangul") > CjkThreshold
    val isZh = col("_lid_kanji") > CjkThreshold
    staged
      .withColumn(langCol,
        when(isJa, lit("ja")).when(isKo, lit("ko")).when(isZh, lit("zh"))
          .otherwise(latin))
      .withColumn(confCol,
        when(isJa, col("_lid_jp")).when(isKo, col("_lid_hangul"))
          .when(isZh, col("_lid_kanji")).otherwise(best))
      .drop(toksCol +: (scriptCols ++ scoreCols): _*)
  }

  // ------------------------------------------------------------ quality

  /** Quality heuristics bundle: length, token stats, punctuation density,
    * stopword density, uppercase ratio. A composite [0,1] score weights the
    * usual "looks like prose" signals (each component clamped to [0,1]).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val avgTokLen = (nChars - (nToks - 1)) / nToks
    // single-pass regexp counts — a per-character split + per-element regex
    // is ~5x slower at corpus scale
    val punct = length(regexp_replace(text, "[^.,!?;:]", "")).cast("double")
    val punctRatio = punct / greatest(nChars, lit(1.0))
    val stopRatio = stopwordRatio(toks, StopwordProfiles("en"))
    val upper = length(regexp_replace(text, "[^A-Z]", "")).cast("double")
    val upperRatio = upper / greatest(nChars, lit(1.0))
    val lenScore = least(nChars / 1000.0, lit(1.0))
    val tokLenScore = when(avgTokLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio.between(0.0, 0.1), 1.0).otherwise(0.5)
    val upperScore = when(upperRatio <= 0.3, 1.0).otherwise(0.4)
    struct(
      nChars.cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      avgTokLen.as("avg_token_len"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      upperRatio.as("upper_ratio"),
      ((lenScore * 0.25) + (tokLenScore * 0.25) + (punctScore * 0.2) +
        (upperScore * 0.1) + (least(stopRatio * 5.0, lit(1.0)) * 0.2)).as("quality"))
  }

  /** Per-document token-level Shannon entropy (nats) — the lexical-
    * diversity quality signal: near-zero entropy is a repeated-token
    * degenerate doc (keyword stuffing, boilerplate loops — the population
    * [[graft.operators.Curation.repetitionStats]] flags by ratio, here on
    * a calibrated information scale), entropy near ln(n_tokens) is
    * every-token-unique (id dumps, tables). The standard filter-band
    * companion to [[qualityScore]].
    *
    * Output: (id, n_tokens, distinct_tokens, entropy_x1e4 BIGINT) —
    * entropy = Σ −p_t·ln(p_t) over the doc's DISTINCT tokens in
    * lexicographic order (a fixed-order per-row fold, so the double is
    * deterministic), quantized ×1e4 (the q135 convention: libm `ln` can
    * differ by 1 ulp across engines; the quantization swallows it, and
    * the oracle replays the fold verbatim).
    *
    * Scale shape: ZERO shuffle — the histogram, the fold, everything runs
    * per row inside the scan stage (the token array materializes once in
    * a prior select so the higher-order lambdas reference a bound
    * attribute, not a recomputed split — the q103 O(n²) trap). Cost is
    * O(distinct · n_tokens) per doc, bounded by doc length.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // empty tokens (leading/double/trailing spaces) are dropped, so the
    // token universe agrees with the \s+-and-drop-empties convention of
    // NgramLm/LmUtil — q145/q146 compose this gate with the KN gate, and
    // the two must agree on what a token is
    val staged = df.select(col(idCol).cast("long").as("id"),
      filter(split(col(textCol), " ", -1), x => x =!= "").as("_t"))
    // per-distinct-token counts in lexicographic order, materialized once
    // per row; the entropy fold then touches each count exactly once
    val counted = staged.select(col("id"), col("_t"),
      transform(sort_array(array_distinct(col("_t"))),
        u => size(filter(col("_t"), x => x === u))).as("_c"))
    val n = size(col("_t")).cast("double")
    counted.select(
      col("id"),
      size(col("_t")).cast("long").as("n_tokens"),
      size(col("_c")).cast("long").as("distinct_tokens"),
      floor(aggregate(
        col("_c"),
        lit(0.0),
        (acc, c) => acc - (c.cast("double") / n) * log(c.cast("double") / n))
        * lit(10000.0) + lit(0.5))
        .cast("long").as("entropy_x1e4"))
  }

  /** Staged quality scoring: raw counts are materialized once, the composite
    * is computed from plain column refs (same rationale as [[withLanguageId]]).
    * Appends n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    * upper_ratio, quality.
    */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val staged = df.select(col("*"),
      length(text).cast("double").as("_q_chars"),
      size(tokens(text)).cast("double").as("_q_toks"),
      length(regexp_replace(text, "[^.,!?;:]", "")).cast("double").as("_q_punct"),
      org.apache.spark.sql.graftx.Bridge.column(
        graft.functions.CountInSet(
          org.apache.spark.sql.graftx.Bridge.expression(tokens(text)),
          StopwordProfiles("en")))
        .cast("double").as("_q_stop"),
      length(regexp_replace(text, "[^A-Z]", "")).cast("double").as("_q_upper"))
    val nToks = greatest(col("_q_toks"), lit(1.0))
    val nChars = greatest(col("_q_chars"), lit(1.0))
    val avgTokLen = (col("_q_chars") - (nToks - 1)) / nToks
    val punctRatio = col("_q_punct") / nChars
    val stopRatio = col("_q_stop") / nToks
    val upperRatio = col("_q_upper") / nChars
    staged.select(col("*"),
        col("_q_toks").cast("long").as("n_tokens"),
        avgTokLen.as("avg_token_len"),
        punctRatio.as("punct_ratio"),
        stopRatio.as("stopword_ratio"),
        upperRatio.as("upper_ratio"),
        ((least(col("_q_chars") / 1000.0, lit(1.0)) * 0.25) +
          (when(avgTokLen.between(3.0, 10.0), 1.0).otherwise(0.3) * 0.25) +
          (when(punctRatio.between(0.0, 0.1), 1.0).otherwise(0.5) * 0.2) +
          (when(upperRatio <= 0.3, 1.0).otherwise(0.4) * 0.1) +
          (least(stopRatio * 5.0, lit(1.0)) * 0.2)).as("quality"))
      .drop("_q_chars", "_q_toks", "_q_punct", "_q_stop", "_q_upper")
  }

  // ---------------------------------------------------------- vocabulary

  /** Per-key vocabulary heavy hitters: the `k` most frequent whitespace
    * tokens for every value of `keyCol` (language, source, domain...), the
    * corpus-profiling query behind stopword-list induction, junk-token
    * triage, and per-domain vocabulary drift checks.
    *
    * Output: (key, token, cnt BIGINT, rnk BIGINT), rnk 1..k per key in
    * `cnt DESC, token ASC` order — fully deterministic, so the whole result
    * is SQL-replayable (q90's oracle is a window rank over exact counts).
    *
    * Scale shape, two bounded stages: (1) `groupBy(key, token).count` runs
    * with map-side partial aggregation, so each task emits its distinct
    * (key, token) slice once; (2) the per-key top-k uses
    * [[graft.operators.TopKTokenAggregator]] — NOT a window rank — because
    * web-scale vocabulary grows with the corpus (ids, misspellings, junk:
    * billions of distinct tokens at 100 TB) and a
    * `rank() OVER (PARTITION BY key)` would funnel each key's entire
    * vocabulary through one task. The typed aggregator partial-aggregates,
    * so the final shuffle moves only `keys * k` rows. Empty tokens (from
    * leading whitespace) are dropped on both engines' definitions.
    */
  def topTokensPerKey(
      df: DataFrame,
      keyCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.operators.TopKTokenAggregator(k))
    df.select(col(keyCol).as("key"), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("key"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("key"))
      .agg(topk(col("cnt"), col("token")).as("topk"))
      .select(col("key"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("key"), col("hit.token").as("token"), col("hit.cnt").as("cnt"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Corpus collocations: pointwise mutual information of adjacent token
    * pairs — PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) with p(a,b) over the
    * bigram stream and p(a) over the unigram stream. The standard corpus
    * diagnostic for boilerplate phrases (high count, low PMI), named
    * entities and collocations (high PMI), and tokenizer-merge candidates;
    * `minCount` drops the noise floor (PMI of a 1-count pair is
    * meaningless and the pair table is dominated by them).
    *
    * Output: (gram, w_a, w_b, n_pair, n_a, n_b, lift DOUBLE, pmi DOUBLE)
    * for bigrams with n_pair >= minCount. Tokenization is the
    * engine-portable single-space split
    * ([[graft.operators.Curation.tokenNgrams]] bigrams == the DuckDB
    * `list_slice` formula byte-for-byte). `lift` is the raw probability
    * ratio p(a,b)/(p(a)p(b)) as ONE fixed-association IEEE expression —
    * `(np*Nu*Nu)/((Nb*na)*nb)` — bit-identical on any IEEE engine, and
    * what the oracle hashes; `pmi = ln(lift)` is the conventional scale
    * but libm `ln` is not correctly-rounded, so two engines can disagree
    * by 1 ulp on it (measured: JVM `Math.log` vs DuckDB `ln` at sf0.01) —
    * rank by either, hash-compare only lift.
    *
    * Scale shape: two token-keyed partial-aggregated counts (unigrams,
    * bigrams), the bigram->unigram equi-joins on the token key, and two
    * 1-row corpus totals broadcast — no window, no pairwise term, nothing
    * wider than (string, long) in any exchange. The minCount filter runs
    * BEFORE the unigram joins, so the joined stream is already the
    * heavy-pair subset.
    */
  def pmiBigrams(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val uni = df.select(explode(split(col(textCol), " ", -1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val biAll = df.select(
        explode(graft.operators.Curation.tokenNgrams(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_pair"))
    val totals = uni.agg(sum(col("n")).as("total_u")).crossJoin(
      biAll.agg(sum(col("n_pair")).as("total_b")))
    biAll.filter(col("n_pair") >= minCount)
      .withColumn("w_a", split(col("gram"), " ", -1).getItem(0))
      .withColumn("w_b", split(col("gram"), " ", -1).getItem(1))
      .join(uni.select(col("w").as("w_a"), col("n").as("n_a")), Seq("w_a"))
      .join(uni.select(col("w").as("w_b"), col("n").as("n_b")), Seq("w_b"))
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        col("n_pair").cast("double") * col("total_u").cast("double") *
          col("total_u").cast("double") /
          (col("total_b").cast("double") * col("n_a").cast("double") *
            col("n_b").cast("double")))
      .select(col("gram"), col("w_a"), col("w_b"),
        col("n_pair"), col("n_a"), col("n_b"),
        col("lift"), log(col("lift")).as("pmi"))
  }

  /** Per-document top-k terms by TF-IDF — the classic keyword-extraction /
    * document-summarization signal (what is this doc ABOUT), and the
    * routing feature behind topic-stratified sampling when no embedding
    * exists. Smooth sklearn-style weighting:
    * `score = tf * (ln((N + 1) / (df + 1)) + 1)` with tf = the term's
    * count in the doc, df = documents containing the term, N = corpus
    * size — the +1s keep corpus-universal terms at a positive floor
    * instead of exactly zero.
    *
    * Output: (id, term, tf, rnk BIGINT) — each doc's k highest-scoring
    * terms, rank by score desc / term asc. The score itself is NOT in the
    * output: libm `ln` differs by 1 ulp across engines (the q100/pmi
    * finding), so the replayable contract is the RANKING (the q39 BM25
    * precedent — score gaps dwarf ulp noise; exact ties have identical
    * tf/df on both engines and break on the term). Empty terms (leading/
    * double spaces under the single-space split) are dropped; a doc with
    * no terms is absent.
    *
    * Scale shape: one (id, term)-keyed partial-aggregated count for tf,
    * one term-keyed count over the distinct pairs for df, the tf->df
    * equi-join on the term key, a 1-row N broadcast, and a window
    * PARTITIONED BY DOC — per-partition work is one document's
    * vocabulary (doc-sized, never corpus-sized, so there is no hot-key
    * funnel to cap; contrast [[topTokensPerKey]], where the partition key
    * is a LANGUAGE and the bounded aggregator is mandatory).
    */
  def tfIdfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = df.select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), " ", -1)).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(col(idCol)).distinct().agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(docFreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) + 1.0))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("id"), col("term"), col("tf"), col("rnk"))
  }

  // ---------------------------------------------------------- fingerprints

  /** Content fingerprints: md5 hex (exact-dedup key) + xxhash64 (cheap 64-bit). */
  def fingerprint(text: Column): Column =
    struct(md5(text.cast("binary")).as("md5"), xxhash64(text).as("xx64"))

  // ------------------------------------------------------------- chunking

  /** Reference chunker semantics (integrations/mlx_lm_pipeline.py:696-723):
    * fixed character windows of `chunkSize`; within a window, break at the
    * last of ". ", "! ", "? ", "\n\n" if that keeps > 70% of the window
    * (first matching delimiter in that order wins); each chunk trimmed;
    * the window start advances by chunkSize - overlap regardless of where
    * the break landed (the reference's quirk, preserved deliberately).
    */
  def chunkText(text: String, chunkSize: Int, overlap: Int): Seq[String] = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"bad chunker params: chunkSize=$chunkSize overlap=$overlap")
    if (text.length <= chunkSize) return Seq(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var done = false
    while (!done && start < text.length) {
      val end = math.min(start + chunkSize, text.length)
      var chunk = text.substring(start, end)
      if (end < text.length) {
        val boundary = Seq(". ", "! ", "? ", "\n\n").iterator
          .map(p => (p, chunk.lastIndexOf(p)))
          .find { case (_, idx) => idx > chunk.length * 0.7 }
        boundary.foreach { case (p, idx) => chunk = chunk.substring(0, idx + p.length) }
      }
      out += chunk.trim
      start = math.max(start + chunkSize - overlap, start + 1)
      if (start >= text.length) done = true
    }
    out.toSeq
  }

  /** Explode documents into chunk rows with the reference's chunk metadata
    * (integrations/mlx_lm_pipeline.py:667-676): document_id, chunk_index,
    * chunk_text, chunk_length.
    */
  def chunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 512,
      overlap: Int = 50): DataFrame = {
    val chunkUdf = udf((t: String) =>
      if (t == null) Seq.empty[String] else chunkText(t, chunkSize, overlap))
    df.select(col(idCol).as("document_id"),
        posexplode(chunkUdf(col(textCol))).as(Seq("chunk_index", "chunk_text")))
      .withColumn("chunk_length", length(col("chunk_text")).cast("long"))
  }
}
