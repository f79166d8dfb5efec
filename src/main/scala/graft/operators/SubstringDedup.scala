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
  * Scale shape (the whole operator is 2 wide exchanges):
  *  1. one scan emits (gram-key, id, pos) triples — `hashed=true` (the
  *     default) keys by a 128-bit hash pair so the shuffle carries 16
  *     bytes per gram instead of the ~8n-byte gram string;
  *  2. duplicate detection is a COUNT window over the gram key — one
  *     shuffle, no second pass (a groupBy+join formulation would shuffle
  *     the gram rows twice);
  *  3. surviving (id, pos) hits shuffle once by id for the span merge;
  *     the merge itself is gaps-and-islands (lag + running sum) and the
  *     final per-(id, island) aggregation reuses the window's hash
  *     partitioning (HashPartitioning(id) satisfies the grouping's
  *     ClusteredDistribution(id, island) — no third exchange).
  * Nothing is ever collected to the driver and no state is corpus-wide:
  * at 100 TB the gram-key shuffle is the dominant cost and it is slim,
  * partial-aggregation-free by design but 16 bytes/row.
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
    val grams = Dedup.widen(df).select(
        col(idCol).cast("long").as("id"),
        posexplode(tokenNgrams(col(textCol), n)).as(Seq("p0", "gram")))
      .select(col("id"), (col("p0") + 1).as("p"),
        (if (hashed) struct(xxhash64(col("gram")), xxhash64(lit("ss2"), col("gram")))
         else struct(col("gram"))).as("k"))

    // one shuffle on the gram key; the count-over-partition window replaces
    // a groupBy + self-join (which would shuffle the gram rows twice)
    val dupHits = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy("k")))
      .filter(col("c") >= minCount)
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
    * dup_tokens = 0.
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
    df.select(col(idCol).cast("long").as("id"),
        split(col(textCol), " ", -1).as("t"))
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
