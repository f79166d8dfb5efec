package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale design (README "Scale design")
  * depends on these plan shapes; losing one is a silent 100x at scale even
  * though results stay correct.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString()

  test("q2: filters and projection reach the parquet scan") {
    val p = plan("q2_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filters in:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range must push down")
    // column pruning: the 11-column lineitem scan must read only what's used
    assert(!p.contains("l_returnflag"), "unused columns must be pruned from the scan")
  }

  test("q4: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q4_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("q3: dimension joins broadcast (no shuffle join for nation)") {
    val p = plan("q3_join_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(p.contains("partial_sum"), "aggregation must have a map-side partial phase")
  }

  test("q14: batch kNN reduces map-side before the exchange") {
    val p = plan("q14_batch_knn")
    // blocked path: partial top-k happens in mapPartitions; the only wide op
    // is the final bounded-top-k aggregation
    assert(p.contains("partial_topkaggregator"),
      s"expected partial bounded top-k before shuffle in:\n$p")
  }

  test("q5: rank-limit filter is pushed into the window (WindowGroupLimit)") {
    val p = plan("q5_window_rank")
    assert(p.contains("WindowGroupLimit"),
      s"expected Spark's rank-limit pushdown in:\n$p")
  }

  test("q33: pruned ANN batch search carries a list_id partition filter") {
    val p = plan("q33_ann_ivf_pruned")
    val scanFilter = "PartitionFilters: \\[.*list_id.*IN".r
    assert(scanFilter.findFirstIn(p).isDefined,
      s"store scan must prune to probed lists:\n$p")
  }

  test("q34: typed metadata filter stays narrow (no shuffle)") {
    val p = plan("q34_typed_meta_filter")
    assert(!p.contains("Exchange"),
      s"scan -> project -> filter must not shuffle:\n$p")
  }

  test("q36: amortized batch kNN keeps the partial top-k shape") {
    val p = plan("q36_batch_knn_500")
    assert(p.contains("partial_topkaggregator"),
      s"expected partial bounded top-k before shuffle in:\n$p")
  }

  test("q11: kernel scores in-plan and top-k never globally sorts") {
    // (whole-stage codegen of the kernel itself is asserted in
    // VectorFunctionsSpec — under AQE the pre-execution plan string carries
    // no codegen markers)
    val p = plan("q11_knn_cosine")
    assert(p.contains("vec_cosine_sim"), s"kernel must appear in the plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"single-query kNN must plan as top-k, not sort:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,0)]"),
      "query-row lookup must push down")
  }

  test("q41: benchmark n-grams broadcast; corpus text is never shuffled") {
    val p = plan("q41_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast:\n$p")
    // the only hash exchanges carry (id)/(id, hits)-slim rows, never text:
    assert(!"Exchange hashpartitioning\\([^)]*text".r.findFirstIn(p).isDefined,
      s"corpus text must not enter a shuffle:\n$p")
  }

  test("q32: LSH banding exchanges carry no vector column") {
    // the banding explode + self-join must shuffle slim (id, band, bucket)
    // rows only; shipping `vec` through them is an nBands x shuffle-width
    // tax at scale (vectors re-join only for the cosine verify)
    val p = plan("q32_emb_neardup_lsh")
    assert(!"Exchange hashpartitioning\\([^)]*(vec|embedding)".r
      .findFirstIn(p).isDefined,
      s"vectors must not enter the banding shuffle:\n$p")
  }

  test("q37: prefix-join candidates stay equi-keyed — no product join, no text shuffle") {
    val p = plan("q37_ngram_jaccard")
    // the length-bucketed candidate stage and the verify gathers are all
    // (tid, bucket)/(id) equi-joins; a cartesian/nested-loop here is the
    // quadratic cliff the prefix filter exists to avoid
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate stage must stay an equi-join:\n$p")
    assert(!"Exchange hashpartitioning\\([^)]*text".r.findFirstIn(p).isDefined,
      s"document text must never enter a shuffle:\n$p")
  }

  test("q19: banded-Hamming pairs join distinct fingerprints, never doc text") {
    val p = plan("q19_hamming_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding must stay an equi-join:\n$p")
    assert(!"Exchange hashpartitioning\\([^)]*text".r.findFirstIn(p).isDefined,
      s"document text must never enter a shuffle:\n$p")
  }

  test("q57: paragraph-dedup winner stage shuffles hash triples, never segment text") {
    val p = plan("q57_paragraph_dedup")
    // the keep-first aggregation and loser fold exchange only
    // (_h, _id, _pos)/(_id, _drop) slim rows; segments are hashed in place
    // and the original text re-enters only at the final doc-id join
    assert(!"Exchange hashpartitioning\\([^)]*_seg".r.findFirstIn(p).isDefined,
      s"segment text must not enter the winner shuffle:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"winner-per-hash must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"drop-list join must stay an equi-join:\n$p")
  }

  test("q58: train-order manifest is one slim exchange plus per-shard sort") {
    val p = plan("q58_train_order")
    assert(!"Exchange hashpartitioning\\([^)]*text".r.findFirstIn(p).isDefined,
      s"manifest must shuffle (id, key) pairs, never text:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one exchange (shard partition):\n$p")
  }

  test("q59: stratified carve broadcasts group counts; rank window sees survivors only") {
    val p = plan("q59_stratified_take")
    assert(p.contains("BroadcastHashJoin"),
      s"group counts must broadcast to the cutoff filter:\n$p")
    // the cutoff filter must run BEFORE the window exchange (the whole
    // point: the rank sort never sees the full corpus)
    assert(!p.contains("CartesianProduct"), s"no product join:\n$p")
  }

  test("q62: sequence writer is one span shuffle, no joins at all") {
    val p = plan("q62_pack_materialize")
    // spans are derived in place from the scan (window + explode + slice);
    // assembly is one partial-less groupBy of (shard, seq) — any join here
    // means tokens moved twice
    assert(!p.contains("Join"), s"writer must not join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no product:\n$p")
  }

  test("q64: Hamming-index dedup joins stored fp layouts — slim longs, no products") {
    val p = plan("q64_hamming_index")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding must stay an equi-join:\n$p")
    assert(!"Exchange hashpartitioning\\([^)]*text".r.findFirstIn(p).isDefined,
      s"nothing textual may shuffle — this path is (id, fp) longs only:\n$p")
  }

  test("q65: incremental paragraph dedup never shuffles the corpus hash table") {
    val p = plan("q65_paragraph_dedup_incr")
    // the corpus membership probe must be broadcast-shaped: batch hashes
    // broadcast OUT (semi-join over the stored set scanned in place), hits
    // broadcast BACK — a hash-exchange of the stored segs is the corpus-
    // sized shuffle this operator exists to avoid
    assert(p.contains("BroadcastHashJoin"), s"probe/hits must broadcast:\n$p")
    assert(!"Exchange hashpartitioning\\([^)]*_seg".r.findFirstIn(p).isDefined,
      s"segment text must not enter a shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"no product join:\n$p")
    // STRUCTURAL guard (the string checks above can't see operator ORDER):
    // walking up from the stored-segs scan, the broadcast semi-join must
    // come before any shuffle exchange — distinct-before-semi-join would
    // hash-exchange the whole stored table on every batch, which the
    // textual asserts miss because the exchange carries longs, not text.
    // AQE's wrapper is an opaque leaf, so plan with it off for this test.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val exec = SparkEntry.queries("q65_paragraph_dedup_incr")(spark, sf)
        .queryExecution.executedPlan
      def isSegScan(n: SparkPlan): Boolean = n match {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("/segs"))
        case _ => false
      }
      def pathTo(n: SparkPlan): Option[List[SparkPlan]] =
        if (isSegScan(n)) Some(n :: Nil)
        else n.children.view.flatMap(pathTo(_)).headOption.map(n :: _)
      val path = pathTo(exec)
      assert(path.isDefined, s"no stored-segs scan found in:\n$exec")
      // nearest wide/broadcast ancestor of the scan decides the shape
      val firstWide = path.get.reverse.drop(1).find(n =>
        n.isInstanceOf[ShuffleExchangeExec] || n.isInstanceOf[BroadcastHashJoinExec])
      assert(firstWide.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "the stored segs must hit the broadcast semi-join BEFORE any " +
          s"shuffle exchange; nearest wide op was $firstWide in:\n$exec")
    } finally spark.conf.set(aqeKey, prev)
  }

  test("q67: the composed pipeline stays equi-joined end to end") {
    val p = plan("q67_pipeline_e2e")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no stage may degrade to a product join:\n$p")
    // raw text reaches exactly the per-row stages; the wide ops downstream
    // of cleaning shuffle ids/hashes/counts only
    assert(!"Exchange hashpartitioning\\([^)]*cleaned_text".r.findFirstIn(p).isDefined,
      s"cleaned text must not enter a shuffle:\n$p")
  }

  test("q45: as-of join is union-and-sweep — one shuffle, no product join") {
    val p = plan("q45_asof_join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one exchange:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"as-of must not plan as a join:\n$p")
  }

  test("q81: sessionize is one shuffle — windows AND the session aggregate " +
    "reuse the user partitioning") {
    val p = plan("q81_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"lag window, running-sum window and groupBy must share one user_id shuffle:\n$p")
  }

  test("q85/q86: range join is an equi-join on (key, bucket), never a product") {
    for (q <- Seq("q85_range_join", "q86_range_attrib")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not degrade to a product join:\n$p")
      assert(p.contains("_bucket"), s"$q must join on the derived bucket:\n$p")
    }
  }

  test("q98: containment joins shingle hashes only - document text never shuffles") {
    val p = plan("q98_containment")
    // text is consumed by the shingle kernel inside the scan stage; every
    // exchange downstream carries (id, hash) or slimmer
    val exchanges = p.split("\\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty, s"expected hash exchanges in:\n$p")
    assert(!exchanges.exists(_.contains("text")),
      s"document text must never enter an exchange:\n${exchanges.mkString("\\n")}")
  }

  test("q99/q101: per-key cap is a bounded partial aggregation, not a window") {
    for (q <- Seq("q99_cap_per_key", "q101_cluster_sample")) {
      val p = plan(q)
      assert(p.contains("partial_topkaggregator"),
        s"$q: expected the bounded aggregator's partial phase in:\n$p")
      // nodeName strips the Exec suffix: WindowExec prints as "Window "
      assert(!p.contains("Window"),
        s"$q: the cap must not plan a per-key window funnel:\n$p")
    }
  }

  test("q102: margin mining broadcasts the query side in both passes") {
    val p = plan("q102_margin_mining")
    assert(p.contains("partial_topkaggregator"),
      s"forward/reverse kNN must partial-aggregate:\n$p")
    val bcasts = p.split("\\n").count(_.contains("BroadcastExchange"))
    assert(bcasts >= 2,
      s"both kNN passes must broadcast the query set (saw $bcasts):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast cross product allowed:\n$p")
  }

  test("q114: edit-distance candidates join on (block, bucket); text never " +
    "enters the candidate exchange") {
    val p = plan("q114_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must not degrade to a product:\n$p")
    assert(p.contains("_bucket"), s"must join on the length bucket:\n$p")
    // title strings re-join by id for the verify only; the candidate join's
    // exchanges carry (block, id, len) triples
    val candExchanges = p.split("\\n")
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("_bucket"))
    assert(!candExchanges.exists(_.contains("title")),
      s"text must not ride the candidate exchange:\n${candExchanges.mkString("\n")}")
  }

  test("q115: transition windows partition by (user, bucket), never user alone") {
    val p = plan("q115_transitions")
    val winLines = p.split("\\n").filter(_.contains("windowspecdefinition"))
    assert(winLines.nonEmpty, s"expected window specs in:\n$p")
    // the raw-event window must include the bucket in its partition key;
    // only the summary-row window (<= 2 rows per (user, bucket)) may
    // partition by user alone
    val rawEventWins = winLines.filter(_.contains("_ts"))
    assert(rawEventWins.nonEmpty && rawEventWins.forall(_.contains("_b")),
      s"raw-event windows must be bucket-bounded:\n${winLines.mkString("\n")}")
  }

  test("q117: interval overlap is one equi-join on (key, bucket) — no product, " +
    "no dedup pass") {
    val p = plan("q117_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span matching must not degrade to a product:\n$p")
    assert(p.contains("_bucket"), s"must join on the span bucket:\n$p")
    // single-bucket pair attribution replaces the dropDuplicates an
    // explode-both-sides plan would otherwise need — distinct-style
    // aggregates over the pair stream would betray that regression
    assert(!p.contains("Deduplicate") && !p.contains("distinct"),
      s"no dedup pass — pairs attribute to exactly one bucket:\n$p")
  }

  test("q116: anomaly baseline rides the histogram — one scan, windows over " +
    "bucket counts only") {
    val p = plan("q116_volume_z")
    // the input is scanned ONCE: the per-key baseline is a window over the
    // (key, bucket) count rows, not a second aggregation branch re-reading
    // the source (each "Scan parquet" line is one scan operator)
    val scans = p.split("\\n").count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly one input scan, saw $scans:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"counts must partial-aggregate map-side:\n$p")
    // every window partitions by key over histogram rows (bounded by
    // buckets-per-key) — none may sort raw events
    val winLines = p.split("\\n").filter(_.contains("windowspecdefinition"))
    assert(winLines.nonEmpty && winLines.forall(_.contains("key")),
      s"windows must partition by key over the histogram:\n${winLines.mkString("\n")}")
  }

  test("q132: video near-dup shuffles only fingerprint longs — frame bytes " +
    "never ride an exchange") {
    val p = plan("q132_video_neardup")
    assert(!p.contains("CartesianProduct"),
      s"frame-overlap join must not degrade to a product:\n$p")
    // demux + xxhash64 run partition-local before the distinct exchange;
    // every exchange row is (id, fp) longs — a binary column on any
    // exchange means frame payloads are being shuffled
    val exchanges = p.split("\\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$p")
    assert(!exchanges.exists(l => l.contains("frame_bytes") || l.contains("bytes")),
      s"frame payloads must not ride an exchange:\n${exchanges.mkString("\n")}")
    assert(p.contains("partial_count"),
      s"df-cap and set-size counts must partial-aggregate map-side:\n$p")
  }

  test("q134: audio near-dup shuffles only fingerprint longs — PCM bytes " +
    "never ride an exchange") {
    val p = plan("q134_audio_neardup")
    assert(!p.contains("CartesianProduct"),
      s"window-overlap join must not degrade to a product:\n$p")
    val exchanges = p.split("\\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$p")
    assert(!exchanges.exists(l => l.contains("window") || l.contains("bytes")),
      s"PCM windows must not ride an exchange:\n${exchanges.mkString("\n")}")
  }

  test("q147: index-backed audio match shuffles only fingerprint longs — " +
      "corpus WAV bytes never re-read, PCM never rides an exchange") {
    val p = plan("q147_audio_index")
    assert(!p.contains("CartesianProduct"),
      s"index match must not degrade to a product:\n$p")
    val exchanges = p.split("\\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$p")
    assert(!exchanges.exists(l => l.contains("window") || l.contains("bytes")),
      s"PCM windows must not ride an exchange:\n${exchanges.mkString("\n")}")
    // the corpus side comes from the persisted fps layout, not the media
    // rows: the only LocalTableScan/media source in the plan is the batch
    assert(p.contains("Scan parquet") || p.contains("FileScan"),
      s"corpus side must read the persisted layout:\n$p")
  }

  test("q154: perceptual audio match — no product, media bytes never " +
      "ride an exchange, both corpus sides read persisted layouts") {
    val p = plan("q154_audio_perceptual")
    assert(!p.contains("CartesianProduct"),
      s"perceptual match must not degrade to a product:\n$p")
    val exchanges = p.split("\\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$p")
    assert(!exchanges.exists(l => l.contains("bytes") || l.contains("window")),
      s"media bytes / PCM windows must not ride an exchange:\n" +
        exchanges.mkString("\n"))
    assert(p.contains("Scan parquet") || p.contains("FileScan"),
      s"corpus sides must read the persisted fps layouts:\n$p")
  }

  test("q155: vacuumed-index match keeps the q63 shape — no product, " +
      "shingle arrays never shuffle") {
    val p = plan("q155_index_vacuum")
    assert(!p.contains("CartesianProduct"),
      s"index match must not degrade to a product:\n$p")
    val exchanges = p.split("\\n").filter(_.contains("Exchange"))
    assert(!exchanges.exists(_.contains("shingle")),
      s"shingle-hash arrays must not ride an exchange:\n" +
        exchanges.mkString("\n"))
  }

  test("q166: landmark audio match keeps the q154 shape — no product, " +
      "media bytes never ride an exchange") {
    val p = plan("q166_audio_landmark")
    assert(!p.contains("CartesianProduct"),
      s"landmark match must not degrade to a product:\n$p")
    val exchanges = p.split("\\n").filter(_.contains("Exchange"))
    assert(!exchanges.exists(l => l.contains("bytes") || l.contains("window")),
      s"media bytes must not ride an exchange:\n" + exchanges.mkString("\n"))
  }

  test("q164: pinned SemDedup match stays cluster-partition-pruned — " +
      "no product, list_id partition filter on the pinned corpus scan") {
    val p = plan("q164_semdedup_time_travel")
    assert(!p.contains("CartesianProduct"),
      s"pinned semantic match must not degrade to a product:\n$p")
    // the un-checkpointed pin3 phase's corpus read must prune clusters
    // at the directory level (the q55/q82 partition-pruning discipline,
    // now through layoutPathsAt)
    assert(p.contains("PartitionFilters") && p.contains("list_id"),
      s"expected a list_id partition filter on the pinned scan:\n$p")
  }

  test("q165: pinned edit match keeps the range-bucketed join shape — " +
      "no product across the mixed-schema pinned corpus") {
    val p = plan("q165_edit_time_travel")
    assert(!p.contains("CartesianProduct"),
      s"edit match must not degrade to a product:\n$p")
  }

  test("q151: trigram-KN scoring is one shuffle-free scan over the " +
      "target split") {
    val p = plan("q151_kn3_perplexity")
    assert(!p.contains("Exchange"),
      s"KN3 scoring must not shuffle (model is broadcast in-expression):\n$p")
    assert(p.contains("lm_kn3_perplexity"),
      s"the codegen'd kernel must appear in-plan:\n$p")
  }

  test("q157: modified-KN scoring keeps q151's shuffle-free scan shape") {
    val p = plan("q157_kn3_mod_perplexity")
    assert(!p.contains("Exchange"),
      s"mod-KN3 scoring must not shuffle (model is broadcast in-expression):\n$p")
    assert(p.contains("lm_kn3_mod_perplexity"),
      s"the codegen'd kernel must appear in-plan:\n$p")
  }

  test("q137: heavy-hitter pass 2 filters candidates scan-side (InSet), " +
      "then partial-aggregates a bounded key set") {
    val p = plan("q137_heavy_hitters")
    assert(p.contains("INSET") || p.contains("InSet"),
      s"candidate membership must run as an InSet filter in the scan stage:\n$p")
    assert(p.contains("partial_count"),
      s"exact counts must partial-aggregate map-side:\n$p")
  }

  test("q141: random projection is a pure per-row map — zero exchanges") {
    val p = plan("q141_random_projection")
    assert(!p.contains("Exchange"),
      s"projection must not shuffle anything:\n$p")
  }

  test("q142: bloom decontamination filters inside the scan stage; corpus " +
      "text never shuffles") {
    val p = plan("q142_decontam_bloom")
    assert(p.contains("might_contain"),
      s"the bloom membership test must appear as a scan-side filter:\n$p")
    assert(!"Exchange hashpartitioning\\([^)]*text".r.findFirstIn(p).isDefined,
      s"corpus text must not enter a shuffle:\n$p")
  }

  test("q168/q171/q178/q179: frames-route LM scoring stays equi-joined — " +
      "no product, no nested-loop term in any family's join chain") {
    // guarded at the SCORE plan: the SparkEntry rows eagerly checkpoint
    // their output (so the model frames can unpersist), which makes the
    // row-level executed plan a table scan — the join chain under guard
    // is the scorer's own plan, built here exactly as the rows build it
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val train = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 4 =!= 0)
    val target = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 4 === 0)
    def assertEquiJoined(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        s"$name scoring must stay equi-joined:\n$p")
    }
    val kn3 = graft.text.NgramLm.trainKn3Distributed(train, "text",
      maxVocab = 256, minTrigramCount = 2)
    assertEquiJoined("q168",
      graft.text.NgramLm.scoreKn3Distributed(target, "doc_id", "text", kn3))
    kn3.unpersist()
    val kn3m = graft.text.NgramLm.trainKn3ModDistributed(train, "text",
      maxVocab = 256)
    assertEquiJoined("q171",
      graft.text.NgramLm.scoreKn3ModDistributed(target, "doc_id", "text", kn3m))
    kn3m.unpersist()
    val kn = graft.text.NgramLm.trainKnDistributed(train, "text",
      maxVocab = 256, minBigramCount = 2)
    assertEquiJoined("q178",
      graft.text.NgramLm.scoreKnDistributed(target, "doc_id", "text", kn))
    kn.unpersist()
    val lm = graft.text.NgramLm.trainDistributed(train, "text",
      maxVocab = 256, minBigramCount = 2)
    assertEquiJoined("q179",
      graft.text.NgramLm.scoreDistributed(target, "doc_id", "text", lm))
    lm.unpersist()
  }

  test("q182: the frames quality gate's scoring plan stays equi-joined — " +
      "no product, no nested-loop term through mix/entropy/ppl joins") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("lang"))
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val frames = graft.text.NgramLm.trainKnDistributed(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4 =!= 0),
      "text", maxVocab = 256, minBigramCount = 2)
    try {
      val gate = graft.streaming.Streams.qualityGateFrames(docs, rates, frames)
      val p = gate.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        s"frames gate scoring must stay equi-joined:\n$p")
    } finally frames.unpersist()
  }

  test("q188: the TRIGRAM frames gate's scoring plan stays equi-joined — " +
      "no product, no nested-loop term through mix/entropy/five-join ppl") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("lang"))
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val frames = graft.text.NgramLm.trainKn3Distributed(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4 =!= 0),
      "text", maxVocab = 256, minTrigramCount = 2)
    try {
      val gate = graft.streaming.Streams.qualityGateKn3Frames(
        docs, rates, frames, maxPplX1e4 = 640000L)
      val p = gate.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        s"KN3 frames gate scoring must stay equi-joined:\n$p")
    } finally frames.unpersist()
  }

  test("q192: the MODIFIED-KN frames gate's scoring plan stays " +
      "equi-joined — no product, no nested-loop term") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("lang"))
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val frames = graft.text.NgramLm.trainKn3ModDistributed(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4 =!= 0),
      "text", maxVocab = 256)
    try {
      val gate = graft.streaming.Streams.qualityGateKn3ModFrames(
        docs, rates, frames)
      val p = gate.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        s"mod-KN frames gate scoring must stay equi-joined:\n$p")
    } finally frames.unpersist()
  }

  test("fleet-wide: no query in the whole SparkEntry surface plans a CartesianProduct") {
    // Every crossJoin in the engine is broadcast()-bounded (query vectors,
    // 1-row aggregates, centroid/cut tables), which plans as
    // BroadcastNestedLoopJoin; an UNBOUNDED CartesianProduct anywhere is a
    // silent corpus² term at 100 TB. Sweep the full query surface —
    // sparkPlan only (no execution of the final query), so the sweep costs
    // planning time plus the builder side effects the contract queries
    // already pay in every spec run.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan.toString()
      if (p.contains("CartesianProduct")) Some(q) else None
    }
    assert(offenders.isEmpty,
      s"queries planning an unbounded product: ${offenders.mkString(", ")}")
  }
}
