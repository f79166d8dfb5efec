package graft.tools

import graft.operators.{Dedup, EpochLog, FingerprintIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the retention-lever cost claim: vacuum folds only
  * the epochs BELOW the keep horizon (O(old slices)), where compact
  * rewrites the WHOLE index (O(index)) — so on an index whose recent
  * epochs hold most of the data, vacuum should cost a fraction of compact
  * while bounding directory growth the same way. Both paths must serve
  * the identical match set afterwards (asserted).
  *
  * Two shapes, timed on clone pairs (vacuum vs compact each):
  *  - MIXED: one large build epoch (80%) + 10 small tail appends.
  *    keepLast folds the oldest epochs, which includes the big build —
  *    vacuum's honest worst case (it must rewrite most of the index
  *    anyway, so expect rough parity with compact).
  *  - TAIL: 5 tiny old slices + 2 big recent appends. keepLast keeps the
  *    big epochs untouched on disk and folds only the tiny history —
  *    the long-lived-feed steady state autoVacuumKeepLast exists for,
  *    where the cost tracks FOLDED bytes, not index size.
  *
  * Run: sbt "runMain graft.tools.VacuumProbe [corpusDocs]"
  */
object VacuumProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~1 KB docs, the IndexSweepProbe text shape
    def textFor(idCol: org.apache.spark.sql.Column) = {
      val vocab = array((0 until 500).map(i => lit(s"w$i")): _*)
      array_join(transform(sequence(lit(1), lit(200)),
        w => element_at(vocab, pmod(hash(idCol * 1000 + w), lit(500)) + 1)), " ")
    }
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_vacprobe_corpus").toString
    spark.range(n.toLong).select(col("id"), textFor(col("id")).as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch = spark.range(1000).select((col("id") + n).as("id"),
        concat(textFor(col("id")), lit(" extra")).as("text"))
      .localCheckpoint(true)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // shape: 80% in the build epoch, 10 small tail appends of 2% each
    def makeIndex(tag: String): FingerprintIndex = {
      val p = java.nio.file.Files.createTempDirectory(s"graft_vacprobe_$tag").toString
      val idx = FingerprintIndex.build(
        corpus.filter(col("id") % 10 < 8), "id", "text", p)
      (0 until 10).foreach(i => idx.append(
        corpus.filter(col("id") % 10 >= 8 && col("id") % 100 / 10 === i),
        "id", "text"))
      idx
    }
    def matches(idx: FingerprintIndex): Set[(Long, Long)] =
      idx.dedupBatch(batch, "id", "text", threshold = 0.8)
        .select(col("batch_id"), col("corpus_id"))
        .as[(Long, Long)].collect().toSet

    println(s"[probe] corpus $n docs: build epoch 80% + 10 tail appends of 2%")
    val a = makeIndex("vac")
    val b = makeIndex("cmp")
    val before = matches(a)
    // vacuum keepLast=4: folds the build epoch + 7 tail epochs (8 of 11)
    val (folded, tVac) = time(a.vacuum(keepLast = 4))
    val (_, tCmp) = time(b.compact())
    println(f"[probe] vacuum(keepLast=4): folded $folded epochs in $tVac%.1f s; " +
      f"compact(): full rewrite in $tCmp%.1f s")
    require(matches(a) == before && matches(b) == before,
      "both retention paths must preserve the match set")

    // the tail-only case vacuum exists for: tiny old slices, big recent
    // epochs — keepLast keeps the big ones untouched on disk
    def makeTailIndex(tag: String): FingerprintIndex = {
      val p = java.nio.file.Files.createTempDirectory(s"graft_vacprobe_$tag").toString
      // 5 small old slices (2% each: id%100 >= 90 split by id%5), then
      // 2 big recent appends (45% each: id%100 < 90 split by id%2)
      val small = (i: Int) =>
        corpus.filter(col("id") % 100 >= 90 && col("id") % 5 === i)
      val idx = FingerprintIndex.build(small(0), "id", "text", p)
      (1 until 5).foreach(i => idx.append(small(i), "id", "text"))
      (0 until 2).foreach(i => idx.append(
        corpus.filter(col("id") % 100 < 90 && col("id") % 2 === i), "id", "text"))
      idx
    }
    val c = makeTailIndex("tailvac")
    val d = makeTailIndex("tailcmp")
    val beforeTail = matches(c)
    val (foldedT, tVacT) = time(c.vacuum(keepLast = 2))
    val (_, tCmpT) = time(d.compact())
    println(f"[probe] tail shape — vacuum(keepLast=2): folded $foldedT tiny " +
      f"epochs in $tVacT%.1f s; compact(): full rewrite in $tCmpT%.1f s " +
      f"(${tCmpT / tVacT}%.1fx — the cost tracks FOLDED bytes, not index size)")
    require(matches(c) == beforeTail && matches(d) == beforeTail,
      "both retention paths must preserve the match set")

    // ----- IVF (vector-side) leg: the r16 lever on the SemDedup layout,
    // same tail-feed steady state (5 tiny old slices + 2 big recent
    // epochs; keepLast=2 folds only the tiny history while compact
    // rewrites every cluster partition of the whole index)
    val vecPath = java.nio.file.Files
      .createTempDirectory("graft_vacprobe_vecs").toString
    spark.range(n.toLong).select(col("id"),
        transform(sequence(lit(1), lit(64)), j =>
          (pmod(hash(col("id") * 131 + j), lit(1000)).cast("double") / 500.0
            - 1.0).cast("float")).as("vector"))
      .write.mode("overwrite").parquet(vecPath)
    val vecs = spark.read.parquet(vecPath)
    val vecBatch = vecs.filter(col("id") % 400 === 0)
      .select((col("id") + n).as("id"),
        transform(col("vector"), x => x * lit(2.0f)).as("vector"))
      .localCheckpoint(true)
    def makeIvf(tag: String): graft.ml.SemDedupIndex.Index = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_vacprobe_$tag").toString
      val small = (i: Int) =>
        vecs.filter(col("id") % 100 >= 90 && col("id") % 5 === i)
      val idx = graft.ml.SemDedupIndex.build(small(0), "id", "vector", p,
        nClusters = 32, maxIter = 3)
      (1 until 5).foreach(i => idx.append(small(i)))
      (0 until 2).foreach(i => idx.append(
        vecs.filter(col("id") % 100 < 90 && col("id") % 2 === i)))
      idx
    }
    def ivfMatches(idx: graft.ml.SemDedupIndex.Index): Set[(Long, Long)] =
      // corpus-side cap lifted: at 800k rows / 32 clusters the 10k default
      // truncates sources away and the planted-copy equality check needs
      // the FULL corpus visible (the cap is a recall lever, not retention)
      idx.dedupBatch(vecBatch, "id", "vector", threshold = 0.999,
          maxClusterSize = n)
        .select(col("batch_id"), col("corpus_id"))
        .as[(Long, Long)].collect().toSet
    val e = makeIvf("ivfvac")
    val f = makeIvf("ivfcmp")
    val beforeIvf = ivfMatches(e)
    require(beforeIvf.size >= n / 400,
      s"every planted copy must match its source, got ${beforeIvf.size}")
    val (foldedI, tVacI) = time(e.vacuum(keepLast = 2))
    val (_, tCmpI) = time(f.compact())
    println(f"[probe] IVF tail shape — vacuum(keepLast=2): folded $foldedI " +
      f"tiny epochs in $tVacI%.1f s; compact(): full rewrite in $tCmpI%.1f s " +
      f"(${tCmpI / tVacI}%.1fx)")
    require(ivfMatches(e) == beforeIvf && ivfMatches(f) == beforeIvf,
      "both IVF retention paths must preserve the match set")
    println(f"""{"probe":"vacuum","corpus":$n,"mixed":{"vacuum_sec":$tVac%.1f,"compact_sec":$tCmp%.1f},"tail":{"vacuum_sec":$tVacT%.1f,"compact_sec":$tCmpT%.1f},"ivf_tail":{"vacuum_sec":$tVacI%.1f,"compact_sec":$tCmpI%.1f}}""")
    spark.stop()
  }
}
