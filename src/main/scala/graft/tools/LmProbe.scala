package graft.tools

import graft.text.NgramLm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the frames LM route (q168/q171). The expected
  * story was "broadcast map probe wins until the table outgrows
  * executors"; the measurement is sharper: broadcast wins only while
  * the table is SMALL (sf0.1 bench: q151 0.59 s vs q168 1.03 s — join
  * fan-out overhead dominates a tiny model), but once the table is
  * table-shaped the join route outruns the scorer expression — at 200k
  * docs / ~1M pruned trigram rows, frames trains 1.8× and scores 2.2×
  * faster (the expression pays per-token string-concat probes into a
  * 1M-entry driver-built HashMap; Tungsten hash joins beat that well
  * before the ceiling is even near). The probe also proves the
  * capability claim: under a 100k-row cap the collect route REFUSES
  * this corpus (fail-fast require) while frames trains and scores —
  * and asserts per-doc route agreement to 1e-9 relative, the q168
  * identity at probe scale.
  *
  * The r18 gate leg holds TWO full bigram models (broadcast map +
  * persisted frames) plus the gate pipeline at once — run with
  * SPARK_DRIVER_MEM=16g or more (the default 8g OOMs at 200k docs).
  * Measured (200k docs, ~2.2M pruned rows): gate broadcast 93.2 s vs
  * frames 24.6 s (3.8×), survivor checksums identical over all 200k.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.LmProbe [nDocs]"
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 50-token docs over a 100-word vocab: ~10M trigram instances over
    // 1M possible types — counts ~10 each, so the pruned table is
    // table-shaped (~1M rows), not a handful of survivors
    val vocab = array((0 until 100).map(i => lit(s"w$i")): _*)
    val corpusPath = java.nio.file.Files
      .createTempDirectory("graft_lmprobe").toString
    spark.range(nDocs.toLong).select(col("id"),
        array_join(transform(sequence(lit(1), lit(50)), w =>
          element_at(vocab, pmod(hash(col("id") * 37 + w), lit(100)) + 1)),
          " ").as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val train = docs.filter(col("id") % 4 =!= 0)
    val target = docs.filter(col("id") % 4 === 0)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (bm, tTrainB) = time(NgramLm.trainKn3(train, "text",
      maxTrigrams = 1 << 21))
    val (_, tScoreB) = time(target
      .agg(sum(NgramLm.perplexityKn3(col("text"), bm))).head())
    val (fm, tTrainF) = time(NgramLm.trainKn3Distributed(train, "text"))
    val framesScored = NgramLm.scoreKn3Distributed(target, "id", "text", fm)
    val (_, tScoreF) = time(framesScored.agg(sum(col("ppl"))).head())

    // route identity on a sample (the q168 contract at probe scale)
    val sample = target.filter(col("id") % 400 === 0)
    val joined = NgramLm.scoreKn3Distributed(sample, "id", "text", fm)
      .join(sample.select(col("id"),
        NgramLm.perplexityKn3(col("text"), bm).as("bppl")), "id")
      .select(col("ppl"), col("bppl")).collect()
    require(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getDouble(0); val b = r.getDouble(1)
      require(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"route divergence: frames=$a broadcast=$b")
    }

    // the capability leg: a cap far under this corpus's table makes the
    // collect route REFUSE (fail-fast), while frames trains and scores
    val refused =
      try { NgramLm.trainKn3(train, "text", maxTrigrams = 100000); false }
      catch { case _: IllegalArgumentException => true }
    require(refused, "collect route must refuse past its cap")
    val tableRows = fm.trigrams.count()
    fm.unpersist()

    // ── the BIGRAM family's crossover (q178) ─────────────────────────────
    // A 100-word vocab caps bigram types at 10k — never table-shaped — so
    // this leg uses a 2000-word vocab: ~10M bigram instances over 4M types
    // leaves a pruned table in the million-row class, the regime where the
    // trigram leg showed joins beating the broadcast map probe.
    val vocab2 = array((0 until 2000).map(i => lit(s"w$i")): _*)
    val corpus2 = java.nio.file.Files
      .createTempDirectory("graft_lmprobe_bi").toString
    spark.range(nDocs.toLong).select(col("id"),
        array_join(transform(sequence(lit(1), lit(50)), w =>
          element_at(vocab2, pmod(hash(col("id") * 53 + w), lit(2000)) + 1)),
          " ").as("text"))
      .write.mode("overwrite").parquet(corpus2)
    val docs2 = spark.read.parquet(corpus2)
    val train2 = docs2.filter(col("id") % 4 =!= 0)
    val target2 = docs2.filter(col("id") % 4 === 0)

    val (bm2, tTrainB2) = time(NgramLm.trainKn(train2, "text",
      maxBigrams = 1 << 22))
    val (_, tScoreB2) = time(target2
      .agg(sum(NgramLm.perplexityKn(col("text"), bm2))).head())
    val (fm2, tTrainF2) = time(NgramLm.trainKnDistributed(train2, "text"))
    val knScored = NgramLm.scoreKnDistributed(target2, "id", "text", fm2)
    val (_, tScoreF2) = time(knScored.agg(sum(col("ppl"))).head())

    // route identity on a sample (the q178 contract at probe scale)
    val sample2 = target2.filter(col("id") % 400 === 0)
    val joined2 = NgramLm.scoreKnDistributed(sample2, "id", "text", fm2)
      .join(sample2.select(col("id"),
        NgramLm.perplexityKn(col("text"), bm2).as("bppl")), "id")
      .select(col("ppl"), col("bppl")).collect()
    require(joined2.nonEmpty)
    joined2.foreach { r =>
      val a = r.getDouble(0); val b = r.getDouble(1)
      require(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"bigram route divergence: frames=$a broadcast=$b")
    }

    val refused2 =
      try { NgramLm.trainKn(train2, "text", maxBigrams = 100000); false }
      catch { case _: IllegalArgumentException => true }
    require(refused2, "bigram collect route must refuse past its cap")
    val tableRows2 = fm2.bigrams.count()

    // ── the GATE-LEVEL contrast (q182): the flagship consumer measured ──
    // end to end through both model routes on the same corpus and the
    // same million-row-class pruned table: temperature mix → entropy
    // floor → KN perplexity, with only the scorer differing. Per-doc
    // identity is asserted via survivor-set checksums (count + id sum +
    // entropy sum + ppl_x1e4 sum — byte-identical gate decisions imply
    // equal checksums; a single divergent doc breaks them). The ppl
    // ceiling is disabled (synthetic random text all scores high) so the
    // checksum covers EVERY mixed+entropy-gated doc's score, not a
    // handful of survivors.
    val gateDocs = docs2.select(col("id").as("doc_id"), col("text"),
      concat(lit("l"), pmod(col("id"), lit(5)).cast("string")).as("lang"))
    val rates = graft.operators.Curation.temperatureRates(
      gateDocs, "lang", 0.5)
    def gateSum(df: org.apache.spark.sql.DataFrame) = df.agg(
      count(lit(1)), sum(col("id")), sum(col("entropy_x1e4")),
      sum(col("ppl_x1e4"))).head()
    val (gb, tGateB) = time(gateSum(graft.streaming.Streams.qualityGate(
      gateDocs, rates, bm2, maxPplX1e4 = Long.MaxValue)))
    val (gf, tGateF) = time(gateSum(graft.streaming.Streams.qualityGateFrames(
      gateDocs, rates, fm2, maxPplX1e4 = Long.MaxValue)))
    require(gb.getLong(0) > 0, "the gate must pass something to compare")
    require(gb == gf, s"gate decisions must be byte-identical: $gb vs $gf")
    fm2.unpersist()

    println(f"""{"probe":"lm","docs":$nDocs,"pruned_table_rows":$tableRows,"broadcast":{"train_sec":$tTrainB%.2f,"score_sec":$tScoreB%.2f},"frames":{"train_sec":$tTrainF%.2f,"score_sec":$tScoreF%.2f},"cap_100k_refuses_collect_route":$refused,"bigram":{"pruned_table_rows":$tableRows2,"broadcast":{"train_sec":$tTrainB2%.2f,"score_sec":$tScoreB2%.2f},"frames":{"train_sec":$tTrainF2%.2f,"score_sec":$tScoreF2%.2f},"cap_100k_refuses_collect_route":$refused2},"gate":{"survivors":${gb.getLong(0)},"broadcast_sec":$tGateB%.2f,"frames_sec":$tGateF%.2f}}""")
    spark.stop()
  }
}
