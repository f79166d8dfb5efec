package graft.operators

import graft.functions.{vector, AnnUtil, HyperplaneSignature, MinHashSignature, SimHash64}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (scale extension —
  * SURVEY.md §7.1 step 8; BASELINE.json north star).
  *
  * Exact dedup is a hash groupBy. Near-dup comes in three flavors:
  *  - MinHash + LSH banding: candidate pairs from band-bucket equi-joins
  *    (shuffle on (band, bucket-hash)), verified with exact n-gram Jaccard.
  *  - SimHash: 64-bit fingerprint, banded into 16-bit chunks for candidate
  *    generation, verified with Hamming distance.
  *  - Exact all-pairs Jaccard: the oracle-checkable baseline (O(N^2) — small
  *    inputs / correctness reference only).
  *
  * Scale notes: at 100 TB the only shuffles are (a) the band-bucket join,
  * whose width is |docs| * bands rows of (long, long, id), and (b) the
  * verify join, whose width is the candidate-pair count. Neither touches the
  * full text corpus more than once; signatures are computed in a single
  * codegen'd scan. Hot buckets (boilerplate docs) can skew (a) — cap bucket
  * width with `maxBucketSize` to bound the pair blow-up.
  */
object Dedup {

  /** Widen an under-partitioned input to the session's default parallelism.
    * A single small parquet file plans as ONE partition, which serializes
    * the tokenize/signature scan (and any eager localCheckpoint of it) onto
    * one core; at real scale inputs already carry >= defaultParallelism
    * partitions and this is the identity — no shuffle is ever added to an
    * already-wide plan.
    *
    * The check is two-tier because measuring width is not free in general:
    *  - a lineage whose PHYSICAL plan already contains a WIDE shuffle
    *    exchange (any partitioning but SinglePartition — a global limit's
    *    `Exchange SinglePartition` is exactly 1 partition and must NOT
    *    count as wide) is `spark.sql.shuffle.partitions` wide by
    *    construction — returned untouched WITHOUT consulting `.rdd`,
    *    which under AQE would materialize the upstream stages a whole
    *    execution early. The test
    *    is on the physical plan, not logical operator classes: a
    *    broadcast-hash join adds NO exchange on its streamed side, so a
    *    1-partition scan joined to a broadcast dimension used to slip
    *    through un-widened and run the downstream kernel on one core;
    *  - an exchange-free lineage (scan/project/filter, or those plus
    *    broadcast joins) is exactly as wide as its streamed-side scan, so
    *    `.rdd.getNumPartitions` reports the real width. For the pure
    *    narrow case that is pure planning (no jobs); a broadcast-join
    *    lineage additionally materializes its build side once here — by
    *    definition a small relation, and the price of not losing
    *    31/32 cores on the scan that follows.
    */
  private[operators] def widen(df: DataFrame): DataFrame = {
    // the test must run on the EXECUTED plan string: exchanges are inserted
    // by EnsureRequirements during execution preparation (sparkPlan carries
    // none), and under AQE the tree is wrapped in a leaf AdaptiveSparkPlanExec
    // that a typed exists() cannot see through — its toString, however,
    // prints the full initial plan. Shuffle exchanges print as
    // "Exchange <partitioning>"; the lookbehind keeps "BroadcastExchange"
    // (which widens nothing) from matching, and the lookahead keeps
    // "Exchange SinglePartition" (a global limit/sort-to-one lineage —
    // exactly 1 partition, the opposite of wide) from counting: such
    // frames fall through to the width probe below and get repartitioned.
    // (ReusedExchange can't hide a wide shuffle from this test: reuse
    // points at an Exchange printed elsewhere in the same plan, and AQE's
    // initial-plan toString prints exchanges un-reused.)
    val alreadyShuffled = "(?<![A-Za-z])Exchange (?!SinglePartition)".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined
    if (alreadyShuffled) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
    }
  }

  /** Distinct token n-gram shingles of a text column — a codegen'd kernel
    * ([[graft.functions.TokenShingles]]) byte-equivalent to the declarative
    * `array_distinct(transform(sequence(...), i => array_join(slice(...))))`
    * formula but ~100x faster: `transform`'s lambda is a higher-order
    * function Catalyst can only interpret (no codegen), and the kernel emits
    * shingles as zero-copy substring views instead of per-shingle
    * slice+join allocations.
    */
  def tokenShingles(text: Column, n: Int = 3): Column =
    Bridge.column(graft.functions.TokenShingles(Bridge.expression(text), n))

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** MinHash signature column (array<bigint> of length numHashes). */
  def minhashSignature(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes, seed))

  /** SimHash 64-bit fingerprint column. */
  def simhash(tokens: Column, seed: Long = 42L): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), seed))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact dedup: one representative row (min orderCol) per duplicate group.
    * Reference analog: none (it has no dedup) — north-star extension.
    */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Corpus-wide paragraph-level exact dedup, keep-first (the C4/Dolma
    * recipe): every occurrence of a repeated segment EXCEPT the first —
    * ordered by (doc id, position), across documents AND within one — is
    * removed, and documents are reassembled in original order.
    *
    * Output: (idCol, cleaned_text, n_removed) — one row per input doc,
    * `cleaned_text` empty when every segment lost. Segments shorter than
    * `minSegmentLen` are exempt — always kept, never counted as duplicates.
    *
    * Scale shape (the document text crosses the wire at most once):
    *  1. segment + hash in place — only (hash, id, pos) triples shuffle;
    *  2. winner per hash = min (id, pos) — a partial-aggregating groupBy
    *     over the slim triples;
    *  3. losers (occurrence != winner) fold to at most one (id, drop
    *     positions) row per AFFECTED doc — typically a tiny fraction of the
    *     corpus;
    *  4. docs left-join that drop-list on id and rewrite segments locally.
    *     The join is doc-id equi — broadcast when the loser set is small,
    *     one co-partitioning of the text otherwise (shuffle-free when the
    *     store is bucketed by id).
    *
    * Dedup identity is the 64-bit xxhash of the segment: two DISTINCT
    * paragraphs colliding would wrongly drop one occurrence. At 1e11
    * paragraphs that is ~e2 expected collisions corpus-wide — the same
    * trade every production paragraph-dedup (Dolma's bloom filter) makes,
    * and zero at oracle scale.
    */
  def dedupParagraphs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      delimiter: String = "\n",
      minSegmentLen: Int = 1): DataFrame = {
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    require(minSegmentLen >= 1, s"minSegmentLen must be >= 1, got $minSegmentLen")
    val quoted = java.util.regex.Pattern.quote(delimiter)
    val segments = split(col(textCol), quoted, -1)

    // segments below the length floor never participate: with newline
    // splitting, blank lines are structure, not content — dedup would strip
    // every blank line in the corpus but the globally first one
    val occ = widen(docs).select(
        col(idCol).cast("long").as("_id"),
        posexplode(segments).as(Seq("_pos", "_seg")))
      .filter(length(col("_seg")) >= minSegmentLen)
      .select(col("_id"), col("_pos"), xxhash64(col("_seg")).as("_h"))
    val winners = occ.groupBy(col("_h"))
      .agg(min(struct(col("_id"), col("_pos"))).as("_w"))
    val drops = occ.join(winners, Seq("_h"))
      .filter(struct(col("_id"), col("_pos")) =!= col("_w"))
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("_pos"))).as("_drop"))

    reassemble(docs, idCol, segments, drops, delimiter)
  }

  /** Rewrite each doc with its drop-list applied: the shared tail of
    * [[dedupParagraphs]] and [[dedupParagraphsAgainst]]. `drops` is at most
    * one (_id, _drop positions) row per AFFECTED doc; the join is doc-id
    * equi (broadcast when the loser set is small) and text is rewritten in
    * place.
    */
  private def reassemble(
      docs: DataFrame, idCol: String, segments: Column, drops: DataFrame,
      delimiter: String): DataFrame =
    docs.select(col(idCol), col(idCol).cast("long").as("_id"), segments.as("_segs"))
      .join(drops, Seq("_id"), "left")
      .select(col(idCol), col("_segs"),
        coalesce(col("_drop"), array().cast("array<int>")).as("_drop"))
      .select(
        col(idCol),
        array_join(
          filter(col("_segs"), (s, i) => array_position(col("_drop"), i) === 0),
          delimiter).as("cleaned_text"),
        size(col("_drop")).cast("long").as("n_removed"))

  /** Distinct segment hashes of a corpus slice — the standing-corpus state
    * [[dedupParagraphsAgainst]] consumes ([[SegmentIndex]] persists it).
    * One column `h`; segments under the length floor are structure, never
    * dedup state.
    */
  def segmentHashes(
      docs: DataFrame,
      textCol: String,
      delimiter: String = "\n",
      minSegmentLen: Int = 1): DataFrame = {
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    val quoted = java.util.regex.Pattern.quote(delimiter)
    widen(docs)
      .select(explode(split(col(textCol), quoted, -1)).as("_seg"))
      .filter(length(col("_seg")) >= minSegmentLen)
      .select(xxhash64(col("_seg")).as("h"))
      .distinct()
  }

  /** Incremental [[dedupParagraphs]]: clean a BATCH against a standing
    * corpus's segment-hash set (the Dolma bloom-filter shape, exact) —
    * tonight's crawl never rescans corpus text. A batch segment is dropped
    * iff it already occurs in the corpus OR earlier in the batch (by
    * (id, pos)); sub-floor segments are exempt, exactly [[dedupParagraphs]].
    * Equivalent to running the corpus-wide operator over corpus ∪ batch
    * (with every corpus id ordered first) and keeping the batch rows —
    * DedupSpec asserts that equivalence literally.
    *
    * Scale shape — the standing corpus is NEVER shuffled: the batch's
    * distinct segment hashes broadcast into a semi-join that scans the
    * corpus hash table in place, and the (small, <= batch-distinct) hit
    * set broadcasts back onto the batch triples. Batch text crosses the
    * wire once, in the final reassembly join; corpus cost per batch is one
    * in-place scan of 8-byte hashes (bucket/bloom the stored layout to cut
    * even that).
    */
  def dedupParagraphsAgainst(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      corpusSegHashes: DataFrame,
      delimiter: String = "\n",
      minSegmentLen: Int = 1): DataFrame = {
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    require(minSegmentLen >= 1, s"minSegmentLen must be >= 1, got $minSegmentLen")
    val quoted = java.util.regex.Pattern.quote(delimiter)
    val segments = split(col(textCol), quoted, -1)

    val occ = widen(batch).select(
        col(idCol).cast("long").as("_id"),
        posexplode(segments).as(Seq("_pos", "_seg")))
      .filter(length(col("_seg")) >= minSegmentLen)
      .select(col("_id"), col("_pos"), xxhash64(col("_seg")).as("_h"))
    // corpus membership without moving the corpus: probe hashes broadcast
    // OUT, the matched subset broadcasts BACK. The semi-join runs BEFORE
    // the distinct — distinct-first would hash-exchange the ENTIRE stored
    // table on every batch (the corpus-sized shuffle this operator exists
    // to avoid); semi-join-first prunes in place against the broadcast
    // probe set, so only the matched subset (bounded by the batch's
    // distinct hashes) pays the distinct shuffle
    val probes = occ.select(col("_h")).distinct()
    val hits = corpusSegHashes.select(col("h").as("_h"))
      .join(broadcast(probes), Seq("_h"), "left_semi")
      .distinct()
      .withColumn("_inc", lit(true))
    val winners = occ.groupBy(col("_h"))
      .agg(min(struct(col("_id"), col("_pos"))).as("_w"))
    val drops = occ.join(winners, Seq("_h"))
      .join(broadcast(hits), Seq("_h"), "left")
      .filter(coalesce(col("_inc"), lit(false)) ||
        struct(col("_id"), col("_pos")) =!= col("_w"))
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("_pos"))).as("_drop"))

    reassemble(batch, idCol, segments, drops, delimiter)
  }

  /** Cap pathological LSH buckets (boilerplate text / degenerate hyperplane
    * cells): keep at most `maxBucketSize` rows per (band, bucket) so the
    * banding self-join's pair count is bounded by
    * bands * buckets * maxBucketSize^2 / 2 instead of going quadratic in the
    * corpus. Trades recall only inside over-full buckets — and a bucket that
    * full is boilerplate, exactly what near-dup dedup is meant to collapse.
    */
  private[operators] def capBuckets(banded: DataFrame, maxBucketSize: Int): DataFrame = {
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("id"))
    banded
      .withColumn("_rn", row_number().over(wBucket))
      .filter(col("_rn") <= maxBucketSize)
      .drop("_rn")
  }

  /** Near-duplicate pairs via MinHash LSH banding + exact-Jaccard verify.
    *
    * Output: (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b.
    * Recall is probabilistic in the LSH stage (bands/rowsPerBand trade-off);
    * the verify stage makes precision exact.
    */
  def nearDupPairsMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rows = numHashes / bands

    // pin (id, shingles) once: it feeds the banding scan AND both sides of
    // the verify join — recomputing tokenization three times costs more than
    // materializing the slim two-column frame. localCheckpoint (not persist):
    // its blocks are released by the ContextCleaner once the frame is
    // unreferenced, where CacheManager entries would leak per call
    val shingleSets = widen(df).select(
      col(idCol).cast("long").as("id"),
      tokenShingles(col(textCol), shingleLen).as("shingles"))
      .localCheckpoint(true)
    val withSig = shingleSets
      .withColumn("sig", minhashSignature(col("shingles"), numHashes, seed))

    // (id, band, bucket) only — the shingle arrays stay OUT of the banding
    // explode and self-join (they dominate shuffle width otherwise) and are
    // re-joined just for the verify stage's candidate ids
    val bandStructs = array((0 until bands).map { j =>
      struct(lit(j).as("band"), hash(slice(col("sig"), j * rows + 1, rows)).as("bucket"))
    }: _*)
    val buckets = withSig
      .select(col("id"), explode(bandStructs).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // cap pathological buckets (boilerplate text) to bound the pair blow-up
    val capped = capBuckets(buckets, maxBucketSize)

    val candidates = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(shingleSets.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric near-dup: which BATCH documents near-duplicate an existing
    * CORPUS document — the incremental-ingest shape (dedup tonight's crawl
    * against everything already kept) that a symmetric all-pairs pass
    * wastes a corpus-squared term on. Same MinHash banding + exact-Jaccard
    * verify as [[nearDupPairsMinHash]], but the banding join is
    * batch x corpus only: the corpus side is banded ONCE (reusable across
    * batches in spirit; here recomputed per call), the candidate join keys
    * on (band, bucket) with the batch side, and nothing pairs corpus rows
    * with each other. Output: (batch_id, corpus_id, jaccard) with
    * jaccard >= threshold; a batch doc hitting several corpus docs yields
    * one row per hit (take min/any downstream as policy dictates).
    *
    * Ids may overlap between the two inputs (they are independent
    * keyspaces); a (batch_id == corpus_id) row means those two DISTINCT
    * documents collide, not self-pairing.
    */
  def nearDupAgainstMinHash(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rows = numHashes / bands

    def shingled(df: DataFrame): DataFrame = widen(df).select(
      col(idCol).cast("long").as("id"),
      tokenShingles(col(textCol), shingleLen).as("shingles"))
      .localCheckpoint(true)
    def banded(sh: DataFrame): DataFrame = {
      val withSig = sh.withColumn("sig",
        minhashSignature(col("shingles"), numHashes, seed))
      val bandStructs = array((0 until bands).map { j =>
        struct(lit(j).as("band"), hash(slice(col("sig"), j * rows + 1, rows)).as("bucket"))
      }: _*)
      withSig.select(col("id"), explode(bandStructs).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }

    val corpusSh = shingled(corpus)
    val batchSh = shingled(batch)
    val batchBuckets = banded(batchSh)
    // when the batch is smaller than the corpus (the normal ingest shape),
    // prune corpus banding to buckets the batch probes BEFORE the cap
    // window: capping sorts per bucket, and a small batch probes a
    // vanishing fraction of the corpus's buckets — unprobed ones can't
    // produce candidates anyway, and dropping whole buckets leaves each
    // surviving bucket's cap contents (lowest ids) unchanged. When the
    // batch dominates (it probes most buckets), the prune is pure
    // overhead — skip it. Both frames are checkpointed, so the counts are
    // cheap row counts, not lineage re-runs.
    val corpusBandsAll = banded(corpusSh)
    val preCap =
      if (batchSh.count() < corpusSh.count())
        // broadcast pinned: the probe set is batch-bounded, and a planner
        // misestimate would shuffle the ENTIRE corpus band table instead
        corpusBandsAll.join(
          broadcast(batchBuckets.select(col("band"), col("bucket")).distinct()),
          Seq("band", "bucket"), "left_semi")
      else corpusBandsAll
    // cap only the corpus side: a boilerplate-degenerate bucket is a corpus
    // property, and the batch side must never lose a doc's chance to match
    val corpusBuckets = capBuckets(preCap, maxBucketSize)

    val candidates = batchBuckets.as("b").join(corpusBuckets.as("c"),
        col("b.band") === col("c.band") && col("b.bucket") === col("c.bucket"))
      .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")

    candidates
      .join(batchSh.select(col("id").as("batch_id"), col("shingles").as("sh_b")),
        Seq("batch_id"))
      .join(corpusSh.select(col("id").as("corpus_id"), col("shingles").as("sh_c")),
        Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        jaccard(col("sh_b"), col("sh_c")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs n-gram Jaccard — O(N^2) correctness baseline and the
    * DuckDB-oracle-checkable form of near-dup detection.
    *
    * The size-ratio prefilter is a NECESSARY condition for the threshold
    * (jaccard >= t implies |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|),
    * so min/max >= t), so it prunes pairs before the set-intersection work
    * without changing the result — the candidate count drops from N²/2 to
    * only the size-compatible band. The scale path for this semantics is
    * [[nearDupPairsMinHash]] (oracle-verified against this exact form).
    */
  def nearDupPairsExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val s = df.select(col(idCol).cast("long").as("id"),
      tokenShingles(col(textCol), shingleLen).as("sh"))
      .withColumn("n", size(col("sh")))
    s.as("a").join(s.as("b"),
        col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * threshold)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard pairs via PREFIX FILTERING (AllPairs/PPJoin
    * family) — same output as [[nearDupPairsExact]] with NO recall loss, but
    * without the O(N^2) candidate join.
    *
    * Why it is lossless: jaccard(A,B) >= t implies |A∩B| >= t*max(|A|,|B|)
    * >= ceil(t*|A|). Under ANY global total order on shingles, if the
    * |A| - ceil(t*|A|) + 1 smallest shingles of A (its "prefix") and the
    * corresponding prefix of B were disjoint, the overlap could be at most
    * |A| - prefixLen(A) = ceil(t*|A|) - 1 < required — contradiction. So
    * every qualifying pair shares a prefix shingle and survives the
    * token-equi-join candidate stage; the exact-Jaccard verify then makes
    * precision exact. Ordering shingles rarest-document-frequency-first
    * minimizes candidate fan-out (frequent boilerplate shingles land outside
    * prefixes).
    *
    * Scale shape: one groupBy for document frequencies, one window per doc
    * to rank shingles, then an equi-join keyed on (rare) prefix shingles —
    * all hash-partitioned, no cross join anywhere. Candidate width is
    * sum over prefix tokens of df(token)^2, which the rare-first order keeps
    * near the true-pair count.
    */
  def nearDupPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val toks = shingleTokens(df, idCol, textCol, shingleLen).localCheckpoint(true)
    // rarest-first global order (ties broken by the token itself so the
    // order is total — required by the prefix-filter correctness argument),
    // materialized as a dense id. Ranking runs as a DISTRIBUTED range-
    // partitioned sort + zipWithIndex — an unpartitioned row_number window
    // would drag the whole vocabulary through one task, a real bottleneck
    // when the shingle vocabulary itself is large (Heaps' law slows vocab
    // growth but billions of shingles are billions of rows).
    val spark = df.sparkSession
    val dfAgg = toks.groupBy("tok").agg(count(lit(1)).as("df")).localCheckpoint(true)
    val tokIds = spark.createDataFrame(
      dfAgg.sort(col("df"), col("tok"))
        .select(col("tok")).rdd
        .zipWithIndex.map { case (r, i) => (r.getString(0), i + 1L) })
      .toDF("tok", "tid")

    // ADAPTIVE prefix depth l (AdaptJoin's insight, as a corpus-density
    // heuristic in place of its sampled cost estimator): a false candidate
    // survives the count filter only by sharing >= l prefix tokens, and the
    // chance of sharing any one token scales with how often tokens repeat
    // across docs — the mean document frequency. Sparse vocabularies
    // (avgDf ~ 1..8, natural text at scale) get l=3: prefixes are already
    // near-unique and deeper ones would only widen the candidate join.
    // Dense vocabularies (synthetic/boilerplate corpora where every shingle
    // is frequent) get l=4: one extra prefix row per doc cuts the
    // candidates surviving the count filter ~4x (measured on the sf0.1
    // corpus, avgDf=275: 119,807 @ l=3 -> 30,992 @ l=4 for 256 true pairs,
    // verify 1.6s -> 0.7s). Deeper l stops paying: the candidate JOIN's
    // matched-row width is dominated by the hottest prefix tokens and grows
    // with prefix length (21.2M @ l=3 -> 29.1M @ l=10), so the join loses
    // more than the verify saves (measured: l=6 and l=10 are net slower).
    // Output is l-invariant (the filter floor min(l, ceil(t*max(n))) keeps
    // every qualifying pair for ANY l — see the losslessness argument below).
    val stats = dfAgg.agg(count(lit(1)).as("vocab"), sum(col("df")).as("rows")).head()
    val avgDf = stats.getLong(1).toDouble / math.max(stats.getLong(0), 1L)
    val l = if (avgDf <= 8) 3 else 4

    // each doc as its tid-SORTED shingle array: ascending tid IS the global
    // rarest-first order, so the doc's prefix is just the array's head —
    // no per-doc window pass anywhere.
    val docArrs = toks.join(tokIds, Seq("tok"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("tid"))).as("arr"))
      .select(col("id"), size(col("arr")).as("n"), col("arr"))
      .localCheckpoint(true)

    // l-PREFIX scheme (AdaptJoin, Wang/Li/Feng SIGMOD'12): extend each
    // doc's prefix to n - ceil(t*n) + l. Then for any qualifying pair the
    // l smallest SHARED shingles (global order) sit inside BOTH prefixes:
    // a doc's suffix holds its largest elements, so if the i-th smallest
    // shared element fell in A's suffix, so would all later ones — that's
    // o-i+1 elements in a suffix of size ceil(t*n_a)-l <= o-l, forcing
    // i > l. Requiring >= l shared prefix tokens per pair is therefore
    // LOSSLESS for any l >= 1, and on dense vocabularies (where every
    // shingle is frequent and 1-token prefix sharing is near-certain) it
    // collapses the candidate count by orders of magnitude; l itself is
    // chosen adaptively from corpus density above.
    // LENGTH-BUCKETED join keys: a qualifying pair's sizes satisfy
    // min >= t*max, so with b(n) = floor(ln n / -ln t) the two docs' buckets
    // differ by at most 1 in exact arithmetic (one bucket spans a full 1/t
    // length ratio). Enumerating each unordered pair SHORTER-DOC-FIRST
    // (order by (n, id), not id alone) makes the relation one-directional —
    // b_y >= b_x — so the x side emits each prefix row under its own and the
    // next TWO buckets and the join key becomes (tid, bucket). The third
    // probe bucket makes the scheme robust to floating-point jitter in
    // ln/division at bucket boundaries: a qualifying pair 3 buckets apart
    // would need a length ratio >= (1/t)^2 * (1 - 1e-15), impossible while
    // the size predicate admits at most 1/t — so NO qualifying pair is ever
    // missed, for any t in (0,1). Effect: a hot token's match group splits
    // into per-length-class groups, cutting the candidate join width ~1.8x
    // on this corpus (21.2M -> 12.0M matched rows at l=3) and bounding
    // per-key skew at scale; cost is 3x the (slim) x-side prefix rows.
    // Every qualifying pair still meets on every shared prefix token
    // exactly once (y's bucket is a single value; x's three probes are
    // distinct keys, so at most one matches it).
    val bucketOf: Column => Column = n =>
      if (threshold < 1.0)
        floor(log(n.cast("double")) / -math.log(threshold)).cast("int")
      else n.cast("int") // t >= 1 degenerates to equal-size pairs
    val prefixes = docArrs.select(col("id"), col("n"),
        posexplode(slice(col("arr"), lit(1),
          (col("n") - ceil(col("n") * threshold) + l).cast("int"))))
      .select(col("id"), col("n"), (col("pos") + 1).as("pos"), col("col").as("tid"),
        bucketOf(col("n")).as("b"))
    val probes = prefixes // x side: probe own bucket and the two above
      .withColumn("jb", explode(array(col("b"), col("b") + 1, col("b") + 2)))

    // positional filter, relaxed for rank-l generations: the r-th smallest
    // shared token at positions (i, j) bounds overlap <= r + min(n_a-i,
    // n_b-j); r <= l makes l + min(...) a valid (loosest-needed) bound
    // against the required overlap t/(1+t)*(n_a+n_b).
    val alpha = threshold / (1 + threshold)
    val candidates = probes.as("x").join(prefixes.as("y"),
        col("x.tid") === col("y.tid") &&
          col("x.jb") === col("y.b") &&
          (col("x.n") < col("y.n") ||
            (col("x.n") === col("y.n") && col("x.id") < col("y.id"))) &&
          col("x.n").cast("double") >= col("y.n") * threshold &&
          (lit(l) + least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos")))
            .cast("double") >= (col("x.n") + col("y.n")) * alpha)
      .groupBy(col("x.id").as("id_x"), col("y.id").as("id_y"),
        col("x.n").as("n_x"), col("y.n").as("n_y"))
      .agg(count(lit(1)).as("shared_prefix"))
      // tiny docs can owe fewer than l shared tokens (their whole set is
      // the prefix and the true overlap may be < l): require min(l,
      // ceil(t*max(n))) — the guaranteed count in every qualifying case
      .filter(col("shared_prefix") >=
        least(lit(l), ceil(col("n_y") * threshold))) // n_y = max by enumeration order
      // restore the ascending-id output convention (jaccard only needs the
      // size SUM, so n_a/n_b need not follow the swap)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        col("n_x").as("n_a"), col("n_y").as("n_b"))

    // verify on the int arrays: two id-equi-joins gather (arr_a, arr_b) per
    // candidate and a codegen'd array_intersect counts the overlap. Join
    // width is |C| + 2|docs| slim int-array rows — the token-explosion
    // verify (|C| × tokens-per-doc rows) loses badly when the vocabulary is
    // dense and candidates share many shingles.
    candidates
      .join(docArrs.select(col("id").as("id_a"), col("arr").as("arr_a")), Seq("id_a"))
      .join(docArrs.select(col("id").as("id_b"), col("arr").as("arr_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("arr_a"), col("arr_b"))).as("inter"),
        col("n_a"), col("n_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard pairs via a plain INVERTED-INDEX join: the token
    * self-join emits one row per shared shingle per size-compatible pair and
    * a hash aggregate counts them — `|A∩B|` arrives as a count, never as an
    * `array_intersect` over shuffled arrays. jaccard = inter/(n_a+n_b-inter)
    * is then exact integer arithmetic in doubles.
    *
    * Versus [[nearDupPairsPrefix]]: this path's join width is
    * sum over tokens of df(token)^2 — unbeatable on DENSE vocabularies
    * (every token frequent, prefixes can't prune) but quadratic in the
    * hottest token's frequency, so on natural corpora with stopword-like
    * shingles prefer the prefix path, whose candidate stage only joins on
    * each doc's rarest shingles. Both return byte-identical results to
    * [[nearDupPairsExact]].
    */
  def nearDupPairsInverted(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val toks = shingleTokens(df, idCol, textCol, shingleLen)
    // identical subplans on both sides => Spark reuses the shuffle exchange
    countVerify(
      toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * threshold)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b")),
      threshold)
  }

  /** One row per (doc, distinct shingle), with the doc's shingle count. */
  private def shingleTokens(
      df: DataFrame, idCol: String, textCol: String, shingleLen: Int): DataFrame =
    widen(df).select(col(idCol).cast("long").as("id"),
        tokenShingles(col(textCol), shingleLen).as("sh"))
      .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("tok"))

  /** Shared-token rows -> exact Jaccard pairs. Input: one row per
    * (id_a, id_b, n_a, n_b) per SHARED shingle; the aggregate count IS the
    * intersection size (shingle sets are distinct by construction).
    */
  private def countVerify(sharedTokenRows: DataFrame, threshold: Double): DataFrame =
    sharedTokenRows
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Near-duplicate pairs via SimHash: 64-bit fingerprints banded into
    * `nBands` equal-width chunks; by pigeonhole, any pair with Hamming
    * distance < nBands shares at least one exact chunk, so recall is
    * GUARANTEED only for hamming < nBands. Wider nBands buys recall at the
    * cost of coarser buckets (64/nBands-bit keys => more candidate pairs);
    * the exact-Hamming verify keeps precision exact either way.
    */
  def nearDupPairsSimHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      nBands: Int = 4,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val withFp = widen(df).select(
      col(idCol).cast("long").as("id"),
      simhash(split(col(textCol), " "), seed).as("fp"))
    nearDupPairsHamming64(withFp, "id", "fp", maxHamming, nBands, maxBucketSize)
  }

  /** Near-duplicate pairs over ANY precomputed 64-bit fingerprint column —
    * the banding engine behind [[nearDupPairsSimHash]], exposed for other
    * fingerprint families (e.g. image perceptual hashes,
    * [[graft.multimodal.Multimodal.imageNearDupPairs]]). Same contract:
    * pigeonhole guarantees recall for hamming < nBands; the exact-Hamming
    * verify keeps precision exact; identical-fp groups beyond
    * `maxBucketSize` truncate deterministically (lowest ids kept).
    */
  def nearDupPairsHamming64(
      df: DataFrame,
      idCol: String,
      fpCol: String,
      maxHamming: Int = 3,
      nBands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    require(64 % nBands == 0, s"nBands must divide 64, got $nBands")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val withFp = df.select(
      col(idCol).cast("long").as("id"),
      col(fpCol).cast("long").as("fp"))

    // COLLAPSE IDENTICAL FINGERPRINTS FIRST: hamming distance and every
    // band bucket are functions of the fp alone, so candidate generation
    // runs over DISTINCT fps and duplicate groups expand only into OUTPUT
    // pairs. This is what makes coarse bands survivable: with 64/nBands-bit
    // buckets a duplicate-heavy corpus piles g copies into every bucket and
    // the doc-level self-join did g^2 work per group (measured: the q48
    // nBands=8 sweep leg spent 60+ s enumerating ~10^8 doc pairs for 7,100
    // results); fp-level banding does the same candidate work once per
    // DISTINCT fingerprint pair, making the operator output-bound.
    // Each fp's doc group keeps its maxBucketSize lowest ids (same
    // deterministic truncation contract the bucket cap always had —
    // boilerplate beyond the cap is dropped, and an identical-fp group that
    // large IS boilerplate).
    val wFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("id"))
    val fpGroups = withFp
      .withColumn("_rn", row_number().over(wFp))
      .filter(col("_rn") <= maxBucketSize)
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .localCheckpoint(true) // feeds banding, within- and cross-expansion

    // within-group pairs: identical fps are hamming 0 <= maxHamming always,
    // found regardless of banding (exact copies never depend on bucket luck)
    val within = fpGroups
      .select(col("ids"), posexplode(col("ids")).as(Seq("pa", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("pa") + 2, size(col("ids")))).as("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("hamming"))

    // cross-group candidates: band-bucket equi-join over DISTINCT fps, with
    // the bucket cap now bounding distinct fps per bucket (ordered by each
    // group's min id for determinism)
    val chunks = array((0 until nBands).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("fp"), j * width).bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
    val banded = fpGroups
      .select(col("fp"), element_at(col("ids"), 1).as("id"), explode(chunks).as("bb"))
      .select(col("fp"), col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val capped = capBuckets(banded, maxBucketSize)
    val candFps = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.fp") < col("y.fp")) // any total order dedupes unordered fp pairs
      .select(col("x.fp").as("fp_x"), col("y.fp").as("fp_y"))
      .dropDuplicates("fp_x", "fp_y")
      .withColumn("hamming", hamming64(col("fp_x"), col("fp_y")))
      .filter(col("hamming") <= maxHamming)

    val cross = candFps
      .join(fpGroups.select(col("fp").as("fp_x"), col("ids").as("ids_x")), Seq("fp_x"))
      .join(fpGroups.select(col("fp").as("fp_y"), col("ids").as("ids_y")), Seq("fp_y"))
      .select(explode(col("ids_x")).as("ia"), col("ids_y"), col("hamming"))
      .select(col("ia"), explode(col("ids_y")).as("ib"), col("hamming"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))

    within.unionAll(cross)
  }

  /** Connected components over near-dup pairs -> full duplicate GROUPS
    * (a-b + b-c must collapse to one group even if a-c was never emitted).
    * Iterative min-label propagation PLUS pointer jumping: each round every
    * node takes the min label among itself and its neighbors, then labels
    * are path-halved (component <- component's component), giving
    * O(log diameter) convergence instead of O(diameter) — a 30-node chain
    * collapses in ~6 rounds. Each round is two shuffle joins; lineage is
    * truncated with localCheckpoint so plans stay bounded. Throws if not
    * converged within maxIter (silently-partial components would poison a
    * dedup pipeline).
    *
    * Output: (id, component) where component = min id reachable.
    */
  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 25,
      smallGraphThreshold: Long = SmallGraphEdgeThreshold): DataFrame = {
    // both edge orientations from ONE pass over the (possibly expensive)
    // pairs lineage — a unionAll of two selects would compute it twice
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst")),
        struct(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val spark = pairs.sparkSession
    val nEdges = edges.count() // edges are checkpointed: metadata-cheap

    // Small graphs (the usual case: near-dup PAIRS are orders of magnitude
    // smaller than the corpus) are solved exactly on the driver — union-find
    // over <= threshold edges is milliseconds, where the iterative plan pays
    // ~30 scheduled jobs. Same adaptive logic as broadcast-join thresholds;
    // past the threshold the distributed rounds below take over unchanged.
    if (nEdges <= smallGraphThreshold) return unionFindLocal(spark, edges)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("ncomp"))
      val afterNeighbor = labels
        .withColumnRenamed("component", "prev")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("prev"),
          least(col("prev"), coalesce(col("ncomp"), col("prev"))).as("component"))
      // pointer jumping: follow the label one hop (component of component)
      val parents = afterNeighbor
        .select(col("id").as("pid"), col("component").as("pcomp"))
      val updated = afterNeighbor
        .join(parents, afterNeighbor("component") === parents("pid"), "left")
        .select(afterNeighbor("id"), col("prev"),
          least(afterNeighbor("component"), coalesce(col("pcomp"), afterNeighbor("component")))
            .as("component"))
        .localCheckpoint(true)
      // convergence check rides on the checkpointed round itself (the prev
      // label is carried through), replacing a per-round join-with-labels
      val nChanged = updated.filter(col("component") =!= col("prev")).count()
      labels = updated.drop("prev")
      converged = nChanged == 0
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds")
    labels
  }

  /** Edge-count cutoff for the driver-side exact path (~16 MB of longs). */
  val SmallGraphEdgeThreshold: Long = 1L << 20

  /** The online keep-vs-ACCEPTED sweep shared by
    * [[FingerprintIndex.ingestBatch]] / [[HammingIndex.ingestBatch]] /
    * [[HyperplaneIndex.ingestBatch]] / [[graft.ml.SemDedupIndex]]:
    * batch ids are considered ascending; an id is dropped iff it matched
    * the standing index (`matched`) or a KEPT lower-id batch neighbor
    * (`pairs`, each (lower, higher)). Matching only DROPPED ids does not
    * drop you — the property that makes the outcome independent of
    * micro-batch grouping under id-ordered arrival. Inputs are the
    * driver-collected, cap-guarded match/pair sets (output-bound by
    * near-dup density); returns the dropped id set.
    */
  private[graft] def acceptedSweepDropped(
      matched: Set[Long], pairs: Array[(Long, Long)]): Set[Long] = {
    val lowerNeighbors = pairs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val involved = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val kept = scala.collection.mutable.Map.empty[Long, Boolean]
    involved.foreach { id =>
      kept(id) = !matched(id) &&
        !lowerNeighbors.getOrElse(id, Array.empty[Long]).exists(kept(_))
    }
    matched ++ involved.filterNot(kept(_))
  }

  /** Exact min-label components via union-find with path compression —
    * identical output contract to the distributed rounds.
    */
  private def unionFindLocal(
      spark: org.apache.spark.sql.SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent.getOrElse(root, root)
      var cur = x // path compression
      while (parent.getOrElse(cur, cur) != root) {
        val next = parent.getOrElse(cur, cur); parent(cur) = root; cur = next
      }
      root
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
    }
    val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
    parent.keys.foreach { id =>
      val r = find(id)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, id), id)
    }
    parent.keys.toSeq.sorted
      .map(id => (id, minOfRoot(find(id))))
      .toDF("id", "component")
  }

  /** Full dedup grouping for a corpus: every row gets a group id (the min
    * doc id of its near-dup component; singletons keep their own id) and a
    * representative flag — the shape a dedup-then-keep-one pipeline consumes.
    */
  def dedupGroups(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val comps = connectedComponents(pairs)
    df.select(col(idCol).cast("long").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("group_id"))
      .withColumn("is_representative", col("id") === col("group_id"))
  }

  /** Quality-aware representative selection: [[dedupGroups]] with the
    * representative chosen as the cluster's BEST row by `scoreCol`
    * (highest score, ties on lowest id) — the keep-the-longest /
    * keep-highest-quality convention production dedup pipelines use
    * instead of keep-min-id (min-id keeps whatever crawled first;
    * score-argmax keeps the member worth training on). Output:
    * (id, group_id, score DOUBLE, is_representative), one row per input
    * row; singletons represent themselves.
    *
    * Scale shape: group ids ride [[dedupGroups]]' components unchanged;
    * the argmax is a `max_by` over a (score, -id) struct — partial
    * aggregation, one slim (group, best) row per cluster joined back by
    * group id. No window, no per-cluster sort. A NULL score never wins
    * while any scored member exists (it compares as -Inf), and an
    * all-NULL cluster falls back to the lowest id — every cluster always
    * has exactly one representative.
    */
  def bestPerGroup(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      scoreCol: String): DataFrame = {
    val groups = dedupGroups(df, pairs, idCol).select(col("id"), col("group_id"))
    val scored = df.select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"))
      .join(groups, Seq("id"))
    val best = scored.groupBy(col("group_id"))
      // highest score wins; the negated id breaks ties toward the LOWEST
      // id (ids are unique, so the struct ordering is total — max_by is
      // deterministic here). NULL scores coalesce to -Inf INSIDE the
      // ordering only: max_by skips rows whose ordering is NULL, so an
      // all-NULL cluster would otherwise get NO representative at all
      .agg(max_by(col("id"),
        struct(coalesce(col("score"), lit(Double.NegativeInfinity)),
          -col("id"))).as("_best"))
    scored.join(best, Seq("group_id"))
      .select(col("id"), col("group_id"), col("score"),
        (col("id") === col("_best")).as("is_representative"))
  }

  /** SOFT dedup — downweight duplicates instead of dropping them (the
    * ablation-standard alternative to hard dedup: every row survives with
    * sampling weight 1 / |dup cluster|, so each duplicate CLUSTER
    * contributes exactly one row's worth of probability mass and the
    * weighted corpus sums to the deduplicated size). Built on
    * [[dedupGroups]]'s connected components; singletons get weight 1.
    * Output: (id, group_id, cluster_size, weight). Slim by construction —
    * only (id, group_id) longs enter the size aggregation and join.
    */
  def duplicationWeights(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val groups = dedupGroups(df, pairs, idCol).select(col("id"), col("group_id"))
    val sizes = groups.groupBy(col("group_id"))
      .agg(count(lit(1)).as("cluster_size"))
    groups.join(sizes, Seq("group_id"))
      .select(col("id"), col("group_id"), col("cluster_size"),
        (lit(1.0) / col("cluster_size")).as("weight"))
  }

  /** Cross-source overlap matrix: for every pair of sources (domains,
    * crawls, dumps...) the exact Jaccard similarity of their DISTINCT
    * shingle sets — the corpus diagnostic behind "how much of crawl B is
    * already in crawl A", run before committing to an expensive pairwise
    * document dedup between corpora.
    *
    * Output: (source_a, source_b, shared, size_a, size_b, jaccard) for
    * ordered pairs source_a < source_b that share at least one shingle
    * (zero-overlap pairs are absent — inner-join semantics).
    *
    * Scale shape: text leaves the scan as 64-bit shingle hashes — the
    * distinct (source, hash) reduction partial-aggregates map-side and
    * nothing wider than (string, long) ever shuffles. The pairwise stage
    * joins that reduced set on hash, so its per-shingle cost is
    * |sources containing the shingle|², NOT |corpus|². The df² term is
    * why `maxSourcesPerShingle` DEFAULTS to the family's 1000 (the
    * [[nearDupPairsMinHash]] bucket-cap convention): shingles present in
    * more than the cap's worth of sources (ubiquitous boilerplate —
    * exactly the quadratic hot keys) are EXCLUDED from numerator AND
    * denominators consistently, leaving the overlap over discriminating
    * shingles — a well-defined and still oracle-replayable statistic.
    * Pass `Int.MaxValue` EXPLICITLY for the unbounded exact form (small
    * corpora / oracle twins); that opt-in admits a quadratic self-join
    * on natural text at scale.
    * Exactness caveat, same trade as [[Curation.removeBoilerplate]]: two
    * DIFFERENT shingles colliding in xxhash64 would merge; at 2^20 distinct
    * shingles the odds are ~2^-25.
    */
  def sourceOverlap(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      shingleLen: Int = 3,
      maxSourcesPerShingle: Int = 1000): DataFrame = {
    require(maxSourcesPerShingle >= 2,
      s"maxSourcesPerShingle must be >= 2 (pairs need two sources), got $maxSourcesPerShingle")
    val grams = df
      .select(col(sourceCol).as("source"),
        explode(tokenShingles(col(textCol), shingleLen)).as("sh"))
      .select(col("source"), xxhash64(col("sh")).as("h"))
      .distinct()
    val kept =
      if (maxSourcesPerShingle == Int.MaxValue) grams
      else grams.join(
        grams.groupBy(col("h")).agg(count(lit(1)).as("_nsrc"))
          .filter(col("_nsrc") <= maxSourcesPerShingle).select(col("h")),
        Seq("h"))
    val sizes = kept.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = kept.as("a")
      .join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("source").as("source_a"), col("n").as("size_a")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n").as("size_b")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared"),
        col("size_a"), col("size_b"),
        (col("shared").cast("double") /
          (col("size_a") + col("size_b") - col("shared"))).as("jaccard"))
  }

  /** Per-document novelty score: the fraction of a document's DISTINCT
    * shingles that appear in NO other document — the "how much of this is
    * new content" signal behind rare-content upweighting and
    * memorization-risk triage (a doc of df-1 shingles is unique prose; a
    * doc of high-df shingles is assembled from corpus boilerplate).
    *
    * Output: (id, n_shingles, n_unique, novelty DOUBLE = n_unique /
    * n_shingles) — one row per document; a shingle-less document scores 0.
    *
    * Scale shape, the [[sourceOverlap]] discipline: text leaves the scan
    * as (id, xxhash64) pairs, document frequency is one partial-aggregated
    * count over hashes, and the join back to documents carries only
    * (hash, df=1 flag) — three slim shuffles, no pairwise term at all.
    * Same xxhash64-collision caveat as [[sourceOverlap]] (odds ~2^-25 at
    * 2^20 distinct shingles; a collision can only LOWER a novelty score).
    */
  def noveltyScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).cast("long").as("id"),
        explode(tokenShingles(col(textCol), shingleLen)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
      .distinct()
    val docFreq = grams.groupBy(col("h")).agg(count(lit(1)).as("_df"))
    val perDoc = grams.join(docFreq, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("_df") === 1, lit(1))).as("n_unique"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty",
        when(col("n_shingles") > 0,
          col("n_unique").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Directed containment pairs: (id_a, id_b) where at least `threshold`
    * of document a's DISTINCT shingles also appear in document b — the
    * QUOTE / subset detector. Symmetric Jaccard (nearDup* families) misses
    * a short doc fully embedded in a long one (the union term swamps the
    * intersection); containment |A∩B| / |A| is the published fix
    * (Broder's resemblance-vs-containment split) and is what catches
    * article-quoting-article, doc-plus-appended-boilerplate, and
    * chunk-of-B-reposted-as-A in a crawl.
    *
    * Output: (id_a, id_b, shared, size_a, containment DOUBLE =
    * shared / size_a) for ordered pairs a != b meeting the threshold —
    * DIRECTED, so a doc contained in its superset appears as (sub, super)
    * with containment near 1 while (super, sub) usually does not survive.
    *
    * Scale shape, the [[sourceOverlap]] discipline: text leaves the scan
    * as (id, xxhash64) pairs; the pairwise term joins the distinct
    * (id, hash) set with itself on hash, so per-shingle cost is df², not
    * |corpus|². `maxDocsPerShingle` DEFAULTS to the family's 1000
    * ([[nearDupPairsMinHash]] convention): shingles present in more than
    * the cap's worth of documents (ubiquitous boilerplate — exactly the
    * df² hot keys) are EXCLUDED from numerator and denominator
    * consistently, leaving containment over discriminating shingles —
    * still well-defined, still oracle-replayable. Pass `Int.MaxValue`
    * EXPLICITLY for the unbounded exact form (small corpora / oracle
    * twins). Same xxhash64-collision caveat as [[sourceOverlap]].
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleLen: Int = 3,
      maxDocsPerShingle: Int = 1000): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(maxDocsPerShingle >= 2,
      s"maxDocsPerShingle must be >= 2 (pairs need two docs), got $maxDocsPerShingle")
    val grams = df.select(col(idCol).cast("long").as("id"),
        explode(tokenShingles(col(textCol), shingleLen)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
      .distinct()
    val kept =
      if (maxDocsPerShingle == Int.MaxValue) grams
      else grams.join(
        grams.groupBy(col("h")).agg(count(lit(1)).as("_ndoc"))
          .filter(col("_ndoc") <= maxDocsPerShingle).select(col("h")),
        Seq("h"))
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("size_a"))
    kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .withColumn("containment",
        col("shared").cast("double") / col("size_a").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("size_a"),
        col("containment"))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken's MOSS
    * algorithm): hash every positional k-gram shingle, slide a window of
    * `w` consecutive hashes, keep each window's MINIMUM — guaranteeing any
    * shared run of at least w+k-1 tokens between two documents shares at
    * least one selected fingerprint, while storing only ~2/(w+1) of the
    * hashes. The published middle ground between exact-substring dedup
    * (every gram) and MinHash (no locality guarantee).
    *
    * Output: (id, fp) — the DISTINCT selected fingerprints per document.
    * The hash is the md5 hex string and minima are LEXICOGRAPHIC on it —
    * md5 and string ordering are engine-portable, so the selection replays
    * exactly anywhere (a numeric cast would need a portable hex-to-int,
    * which engines disagree on). A document with fewer than w shingles
    * contributes its single overall minimum; an empty/shingle-less
    * document contributes nothing.
    *
    * Scale shape: selection is ONE codegen'd kernel expression
    * ([[winnowFps]]: positional grams -> md5 -> window minima -> distinct,
    * one digest per gram) inside the scan stage — zero shuffle; only the
    * slim (id, 32-char fp) pairs leave the row.
    */
  def winnowingFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      window: Int = 4): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      explode(winnowFps(col(textCol), shingleLen, window)).as("fp"))

  /** The winnowing selection as ONE codegen'd column over the text — the
    * per-row kernel behind [[winnowingFingerprints]], exposed separately
    * so the SQL surface (`winnow_fps` in [[graft.GraftExtensions]]) and
    * ad-hoc pipelines can fingerprint without the explode.
    *
    * Returns array<string> of the DISTINCT selected md5 fingerprints;
    * empty for shingle-less text, NULL for null text (explode drops
    * both, so a null-text doc contributes nothing downstream either way).
    * Selection semantics live in [[graft.functions.TextHashUtil
    * .winnowFps]], oracle-locked by q103/q106/q110; the kernel digests
    * each gram exactly once, so the O(n²)-recompute trap of an inlined
    * higher-order-function chain (measured 17 s -> sub-second at sf0.1)
    * is structurally gone.
    */
  def winnowFps(text: Column, shingleLen: Int, window: Int): Column =
    Bridge.column(graft.functions.WinnowFps(
      Bridge.expression(text), shingleLen, window))

  /** Winnowing match pairs: unordered document pairs sharing at least
    * `minShared` selected fingerprints — [[winnowingFingerprints]]'
    * consumer shape, the plagiarism / shared-passage detector. Same
    * pairwise discipline and `maxDocsPerFp` cap lever (DEFAULT 1000,
    * `Int.MaxValue` = explicit unbounded opt-in) as [[containmentPairs]],
    * but over a fingerprint set winnowing already thinned ~2/(w+1)×,
    * which shrinks the join's df² term by the square.
    */
  def winnowingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Long,
      shingleLen: Int = 3,
      window: Int = 4,
      maxDocsPerFp: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDocsPerFp >= 2,
      s"maxDocsPerFp must be >= 2 (pairs need two docs), got $maxDocsPerFp")
    val fps = winnowingFingerprints(df, idCol, textCol, shingleLen, window)
    val kept =
      if (maxDocsPerFp == Int.MaxValue) fps
      else fps.join(
        fps.groupBy(col("fp")).agg(count(lit(1)).as("_ndoc"))
          .filter(col("_ndoc") <= maxDocsPerFp).select(col("fp")),
        Seq("fp"))
    kept.as("a")
      .join(kept.as("b"), col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Edit-distance (Levenshtein) near-dup pairs for SHORT strings —
    * titles, questions, URLs, product names — where the token/shingle
    * families are blind (a one-character typo changes every 3-gram
    * around it, but ed = 1). Output: (id_a, id_b, dist BIGINT) for
    * unordered pairs with levenshtein <= maxEdits.
    *
    * Candidates, lossless on length: ed(a,b) <= k implies
    * |len(a) - len(b)| <= k, so pairs come from [[RangeJoin.selfWithin]]
    * over the length column (bucket-and-verify, delta = maxEdits — no
    * length-band is ever cross-compared beyond its neighbors). Within a
    * (block, length-bucket) the join is exact-quadratic, which is the
    * point at small block sizes and the cliff at large ones — so
    * `blockCol` is the recall/scale lever (block on a normalized prefix,
    * a sorted-token key, a source domain...; None = one global block,
    * exact but only safe on bounded inputs; a NULL block value never
    * equi-joins, so null-blocked docs pair with NOTHING — assign a
    * sentinel upstream if they must participate) and `maxDocsPerBlock` is the
    * [[containmentPairs]]-convention hot cap (lowest ids kept,
    * deterministic, replayable; Int.MaxValue = explicit unbounded
    * opt-in) applied per (block, length-bucket) — the candidate join's
    * OWN granularity (`floor(len / maxEdits)`), so a global block never
    * truncates the corpus to its overall-lowest ids (a doc only competes
    * with docs its length could even candidate-match) and the cap window
    * partitions by (block, bucket) instead of funnelling the whole input
    * through one task. A doc past its bucket's cap is out of the join
    * entirely (it pairs with nothing, the posting-cap convention — the
    * cap thins pairs, never invents them). Verify is exact `levenshtein`
    * on the joined texts — same semantics as DuckDB's, so the whole
    * operator replays (the cap replays as a `row_number() OVER
    * (PARTITION BY block, len DIV maxEdits ORDER BY id)` filter).
    *
    * Scale shape: the candidate join moves only (block, id, len)
    * triples; texts re-join by id for the verify only. At 100 TB: pick a
    * blockCol whose blocks are result-page sized — the operator's cost is
    * Σ_block min(|block|, cap)², never |corpus|².
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxEdits: Int,
      blockCol: Option[String] = None,
      maxDocsPerBlock: Int = 1000): DataFrame = {
    require(maxEdits >= 1, s"maxEdits must be >= 1, got $maxEdits")
    require(maxDocsPerBlock >= 2,
      s"maxDocsPerBlock must be >= 2 (pairs need two docs), got $maxDocsPerBlock")
    val block = blockCol.map(col).getOrElse(lit(0)).as("_block")
    val slim0 = df.select(col(idCol).cast("long").as("id"),
      length(col(textCol)).cast("long").as("_len"), block)
    val slim =
      if (maxDocsPerBlock == Int.MaxValue) slim0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_block"), col("_lb")).orderBy(col("id"))
        slim0
          .withColumn("_lb", RangeJoin.floorDiv(col("_len"), maxEdits.toLong))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= maxDocsPerBlock).drop("_rn", "_lb")
      }
    val cand = RangeJoin.selfWithin(slim, "_block", "id", "_len",
      delta = maxEdits.toLong)
    val texts = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("_txt"))
    cand
      .join(texts.select(col("id").as("id_a"), col("_txt").as("_ta")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("_txt").as("_tb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb")).cast("long"))
      .filter(col("dist") <= maxEdits)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Two-table form of [[editDistancePairs]] — which BATCH titles sit
    * within `maxEdits` of an already-ingested CORPUS title (the
    * incremental-dedup shape every `*Against` twin in the family serves).
    * Output: (batch_id, corpus_id, dist BIGINT), all qualifying pairs.
    *
    * Same candidate discipline: lossless |len| <= maxEdits prefilter via
    * [[RangeJoin.within]]'s bucket-and-verify, `blockCol` as the shared
    * recall/scale lever, and `maxDocsPerBlock` capping the CORPUS side
    * only (lowest ids kept — the batch never loses a match chance, the
    * [[WinnowIndex]] posting-cap rule), per (block, length-bucket) like
    * [[editDistancePairs]] — so a global block keeps the lowest ids OF
    * EACH LENGTH BUCKET, not the corpus's 1000 oldest titles overall,
    * and the cap window never owns the whole corpus in one task.
    */
  def editDistanceAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      maxEdits: Int,
      blockCol: Option[String] = None,
      maxDocsPerBlock: Int = 1000): DataFrame = {
    require(maxEdits >= 1, s"maxEdits must be >= 1, got $maxEdits")
    require(maxDocsPerBlock >= 1,
      s"maxDocsPerBlock must be >= 1, got $maxDocsPerBlock")
    def slim(df: DataFrame): DataFrame = {
      val block = blockCol.map(col).getOrElse(lit(0)).as("_block")
      df.select(col(idCol).cast("long").as("id"),
        length(col(textCol)).cast("long").as("_len"), block)
    }
    val b = slim(batch)
    val c0 = slim(corpus)
    val c =
      if (maxDocsPerBlock == Int.MaxValue) c0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_block"), col("_lb")).orderBy(col("id"))
        c0
          .withColumn("_lb", RangeJoin.floorDiv(col("_len"), maxEdits.toLong))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= maxDocsPerBlock).drop("_rn", "_lb")
      }
    val cand = RangeJoin.within(b, c, "_block", "id", "_len", "id", "_len",
        delta = maxEdits.toLong)
      .select(col("left_id").as("batch_id"), col("right_id").as("corpus_id"))
    val bTexts = batch.select(col(idCol).cast("long").as("batch_id"),
      col(textCol).as("_tb"))
    val cTexts = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(textCol).as("_tc"))
    cand.join(bTexts, Seq("batch_id")).join(cTexts, Seq("corpus_id"))
      .withColumn("dist", levenshtein(col("_tb"), col("_tc")).cast("long"))
      .filter(col("dist") <= maxEdits)
      .select(col("batch_id"), col("corpus_id"), col("dist"))
  }

  /** Embedding-cosine near-dup pairs, exact all-pairs baseline (O(N^2);
    * the oracle-checkable form). Output: (id_a, id_b) with cosine >= threshold.
    */
  def embeddingNearDupExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .filter(vector.cosine_sim(col("a.vec"), col("b.vec")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** Embedding-cosine near-dup via random-hyperplane LSH: nBits sign bits,
    * banded like SimHash; candidates verified with exact cosine. Recall
    * comes from band count (pairs within angle θ collide on a band w.h.p.);
    * precision is exact.
    */
  def embeddingNearDupLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      nBits: Int = 64,
      nBands: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    require(nBits % nBands == 0, s"nBits=$nBits not divisible by nBands=$nBands")
    val width = nBits / nBands
    require(width <= 64, s"band width $width exceeds one signature word")
    require(nBits <= 64 || 64 % width == 0,
      s"multi-word signatures need band width dividing 64, got $width")
    val mask = if (width == 64) -1L else (1L << width) - 1
    // signatures wider than one long span ceil(nBits/64) words — the
    // bucket-selectivity lever (2^width buckets per band); the default
    // 64-bit geometry takes the identical single-word path as before
    val nWords = (nBits + 63) / 64
    val planes = AnnUtil.randomPlanesWide(nBits, dim, seed)
    val sigCols = (0 until nWords).map { w =>
      Bridge.column(HyperplaneSignature(Bridge.expression(col("vec")),
        planes.slice(w * 64, math.min((w + 1) * 64, nBits)))).as(s"sig$w")
    }

    // (id, vec) feeds the signature scan and both sides of the verify join;
    // unlike MinHash's shingleSets (tokenization is worth pinning) this is a
    // cheap column-pruned scan, so recomputing beats a checkpoint
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))

    // (id, band, bucket) only — the vectors stay OUT of the banding explode
    // and self-join: shipping `vec` here would cross the exchange nBands
    // times and sit on both sides of the join, an nBands x shuffle-width tax
    // at 100 TB of embeddings. They re-join just for the cosine verify.
    val chunks = array((0 until nBands).map { j =>
      val w = (j * width) / 64
      val off = (j * width) % 64
      struct(lit(j).as("band"),
        shiftright(col(s"sig$w"), off).bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
    val banded = vecs
      .select((col("id") +: sigCols): _*)
      .select(col("id"), explode(chunks).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val capped = capBuckets(banded, maxBucketSize)
    val candidates = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(vecs.select(col("id").as("id_a"), col("vec").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("v_b")), Seq("id_b"))
      .filter(vector.cosine_sim(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
