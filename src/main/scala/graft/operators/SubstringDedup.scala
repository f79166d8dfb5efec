package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

import graft.functions.TokenNgrams

/** Exact duplicated-substring dedup (the "ExactSubstr" recipe of Lee et
  * al. 2021, "Deduplicating Training Data Makes Language Models Better"):
  * find every token span that occurs at least `minCount` times across the
  * corpus and remove the duplicated spans from the text, rather than
  * dropping whole documents. The reference engine has no substring-level
  * operator (its dedup surface is document/paragraph-grained); this is
  * the span-grained member of the same family, included because real
  * training pipelines run it between paragraph dedup and near-dup.
  *
  * The paper's suffix-array formulation is inherently single-machine
  * (one sorted array over the concatenated corpus). The distributed
  * re-expression used here is the standard n-gram cover: a substring of
  * >= `n` tokens occurs >= `minCount` times iff every one of its length-`n`
  * windows does, so the union of duplicated-n-gram windows IS the union
  * of duplicated substrings of length >= `n` — identical output semantics
  * to suffix-array ExactSubstr with match threshold `n`, with only
  * groupBy/window shuffles.
  *
  * Scale shape (3 slim exchanges, all skew-resilient):
  *  1. one scan emits (gram-key, id, pos) triples — `hashed=true` (the
  *     default) keys by a 128-bit hash pair so the shuffle carries 16
  *     bytes per gram instead of the ~8n-byte gram string;
  *  2. duplicate detection is groupBy(count)-then-semi-join, NOT a COUNT
  *     window: map-side partial aggregation collapses a hot gram
  *     (boilerplate / stop-word runs) to one row per map partition before
  *     the count shuffle, and the gram-side semi-join is an equi-join AQE
  *     can skew-split — a window over the gram key would instead funnel
  *     every occurrence of a hot gram into ONE WindowExec task (spills
  *     but no parallelism, the classic 100 TB skew cliff);
  *  3. surviving (id, pos) hits shuffle once by id for the span merge;
  *     the merge itself is gaps-and-islands (lag + running sum) and the
  *     final per-(id, island) aggregation reuses the window's hash
  *     partitioning (HashPartitioning(id) satisfies the grouping's
  *     ClusteredDistribution(id, island) — no further exchange).
  * Nothing is ever collected to the driver and no state is corpus-wide:
  * at 100 TB the gram-key exchanges dominate and both are slim — the
  * count side is partial-aggregated (distinct grams per map partition),
  * the join side is 16 bytes/row.
  */
object SubstringDedup {

  private def tokenNgrams(text: Column, n: Int): Column =
    Bridge.column(TokenNgrams(Bridge.expression(text), n))

  /** Maximal duplicated spans per document: every token position covered
    * by some length-`n` token window occurring >= `minCount` times in the
    * corpus (counting repeats within one document — self-repetition is
    * duplication too, exactly as in the suffix-array formulation), with
    * overlapping/adjacent windows merged to maximal intervals.
    *
    * Output: (id BIGINT, span_start BIGINT, span_end BIGINT) — 1-based
    * inclusive token positions, one row per maximal span.
    *
    * `hashed=true` keys duplicate detection by a (xxhash64, seeded
    * xxhash64) pair — 128 collision bits, so a false merge needs two
    * independent 64-bit collisions on the SAME gram pair (~2^-128 per
    * pair; zero expected through ~2^60 grams, i.e. far past 100 TB).
    * `hashed=false` keys by the gram string itself (exact at any size,
    * ~8n bytes/row on the wire); SubstringDedupSpec asserts the two
    * produce identical spans on the test corpus.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minCount: Int = 2,
      hashed: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // null text never reaches TokenNgrams (null-intolerant): coalesce to ''
    // so null-text docs behave exactly like empty docs in BOTH entry points
    val grams = Dedup.widen(df).select(
        col(idCol).cast("long").as("id"),
        posexplode(tokenNgrams(coalesce(col(textCol), lit("")), n))
          .as(Seq("p0", "gram")))
      .select(col("id"), (col("p0") + 1).cast("long").as("p"),
        (if (hashed) struct(xxhash64(col("gram")), xxhash64(lit("ss2"), col("gram")))
         else struct(col("gram"))).as("k"))

    // two-pass heavy-hitter duplicate detection: partial-aggregated counts
    // (hot grams collapse map-side), then an AQE-skew-splittable semi-join
    // back onto the gram rows — see the scale-shape note above for why a
    // COUNT window over k would serialize hot grams into one task
    val dupKeys = grams.groupBy("k").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select("k")
    val dupHits = grams.join(dupKeys, Seq("k"), "left_semi")
      .select("id", "p")

    // gaps-and-islands: windows [p, p+n-1] merge while each start is within
    // n of the previous start (end+1 adjacency included)
    val byId = Window.partitionBy("id").orderBy("p")
    dupHits
      .withColumn("brk",
        when(lag("p", 1).over(byId).isNull, 1)
          .when(col("p") > lag("p", 1).over(byId) + n, 1)
          .otherwise(0))
      .withColumn("island", sum("brk").over(byId))
      .groupBy("id", "island")
      .agg(min("p").as("span_start"), (max("p") + (n - 1)).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"))
  }

  /** Remove the duplicated spans from every document: tokens inside any
    * [[duplicatedSpans]] interval are dropped (ALL copies — the paper's
    * ExactSubstr removes every occurrence of a duplicated substring) and
    * the survivors re-joined on single spaces.
    *
    * Output: (id BIGINT, n_tokens BIGINT, dup_tokens BIGINT, clean_text
    * STRING) — one row per input document, clean ones untouched with
    * dup_tokens = 0. NULL and empty text normalize identically in both
    * entry points: n_tokens = 0, dup_tokens = 0, clean_text = ''. For
    * non-empty text, n_tokens counts space-split cells (consecutive /
    * edge spaces count empty cells) — the same position space TokenNgrams
    * indexes, so span positions and token positions always agree.
    *
    * Scale shape: spans collapse to one array per id (tiny — spans per
    * doc, not tokens per doc), LEFT-join back onto the corpus by id, and
    * the removal itself is a single codegen-friendly higher-order
    * expression over (token, position) — no token-grained shuffle is ever
    * added beyond [[duplicatedSpans]]'s own two.
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minCount: Int = 2,
      hashed: Boolean = true): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, n, minCount, hashed)
      .groupBy("id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("spans"))
    // empty/null text -> empty token array (split('') yields [''], which
    // would report n_tokens = 1 for an empty document)
    val txt = coalesce(col(textCol), lit(""))
    df.select(col(idCol).cast("long").as("id"),
        when(length(txt) === 0, array().cast("array<string>"))
          .otherwise(split(txt, " ", -1)).as("t"))
      .join(spans, Seq("id"), "left")
      .select(
        col("id"),
        size(col("t")).cast("long").as("n_tokens"),
        when(col("spans").isNull, lit(0L)).otherwise(
          aggregate(col("spans"), lit(0L),
            (acc, sp) => acc + (sp.getField("e") - sp.getField("s") + 1L)))
          .as("dup_tokens"),
        when(col("spans").isNull, array_join(col("t"), " ")).otherwise(
          array_join(
            transform(
              filter(
                zip_with(col("t"),
                  sequence(lit(1), greatest(size(col("t")), lit(1))),
                  (tok, pos) => struct(tok.as("tok"), pos.as("pos"))),
                tp => !exists(col("spans"),
                  sp => tp.getField("pos") >= sp.getField("s") &&
                    tp.getField("pos") <= sp.getField("e"))),
              tp => tp.getField("tok")),
            " "))
          .as("clean_text"))
  }
}
