package graft.tools

import graft.operators.FingerprintIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-ingest throughput probe at 20x+ the bench corpus: builds
  * the persisted MinHash fingerprint index over a standing corpus (default
  * 100k 1 KB docs; pass a bigger N to sweep), then times the nightly-crawl
  * shape — a FIXED 10k-doc batch with planted corpus dups and within-batch
  * copies — on the indexed path vs the recompute path, plus the full
  * `ingestBatch` (match + sweep + append) and a follow-up batch against
  * the grown index. The honest claim measured here: the indexed path's
  * residual corpus term is the SLIM stored-band scan (12-byte rows), while
  * the recompute path re-reads and re-minhashes corpus TEXT — measured
  * 0.9x at 100k docs and 9.4x at 400k, widening linearly with corpus
  * bytes. Prints [probe] lines and a final JSON.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    // batch size is FIXED as the corpus grows: the claim under test is that
    // per-batch cost is O(batch) on the indexed path but O(corpus) on the
    // recompute path — sweep `n` and watch which timing moves
    val batchN = 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic docs (DedupProbe's generator): 200-word docs (~1 KB, closer to real corpus rows)
    // over a 500-word vocab, keyed by id
    val vocab = array((0 until 500).map(i => lit(s"w$i")): _*)
    def textFor(idCol: org.apache.spark.sql.Column) = array_join(
      transform(sequence(lit(1), lit(200)),
        p => element_at(vocab, pmod(hash(idCol * 1000 + p), lit(500)) + 1)), " ")
    // the corpus is MATERIALIZED as parquet: the whole point of the index
    // is avoiding the corpus re-read/re-tokenize, so a generated-on-the-fly
    // corpus (free to "rescan") would flatter the recompute path
    val corpusPath = java.nio.file.Files.createTempDirectory("graft_probe_corpus")
      .toString
    spark.range(n.toLong).select(col("id"), textFor(col("id")).as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    // batch 1: half fresh docs, 30% near-copies of corpus docs, 20%
    // within-batch near-copies of the batch's own fresh half
    val freshN = batchN / 2
    val corpDupN = batchN * 3 / 10
    // text is computed in its own select BEFORE the id is re-keyed:
    // aliasing `(id + n) AS id` in the same projection would make later
    // expressions resolve col("id") to the new LATERAL alias and silently
    // re-key every planted copy
    val batch1 = spark.range(batchN.toLong).select(col("id"),
        when(col("id") < freshN, textFor(col("id") + n))
          .when(col("id") < freshN + corpDupN,
            concat(textFor(col("id") - freshN), lit(" extra")))
          .otherwise(concat(textFor(pmod(col("id"), lit(freshN)) + n), lit(" copy")))
          .as("text"))
      .select((col("id") + n).as("id"), col("text"))
      .localCheckpoint(true)
    // batch 2: near-copies of batch 1's fresh docs — must drop against the
    // GROWN index, proving appends take effect
    val batch2 = spark.range((batchN / 2).toLong)
      .select(col("id"), concat(textFor(col("id") + n), lit(" later")).as("text"))
      .select((col("id") + n + batchN).as("id"), col("text"))
      .localCheckpoint(true)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val path = java.nio.file.Files.createTempDirectory("graft_ingest_probe").toString
    val (idx, tBuild) = time {
      FingerprintIndex.build(corpus, "id", "text", path)
    }
    println(f"[probe] index build: $n corpus docs in $tBuild%.1f s " +
      f"(${n / tBuild}%.0f docs/s, one-time)")
    // apples to apples: the batch-vs-corpus MATCH alone, indexed (stored
    // slim layouts) vs recompute (re-scan + re-tokenize + re-minhash the
    // corpus parquet) — identical output, per-batch cost only
    val (nIndexed, tIndexed) = time {
      idx.dedupBatch(batch1, "id", "text", threshold = 0.8)
        .select(col("batch_id")).distinct().count()
    }
    val (nRecompute, tRecompute) = time {
      graft.operators.Dedup.nearDupAgainstMinHash(corpus, batch1,
        "id", "text", threshold = 0.8).select(col("batch_id")).distinct().count()
    }
    println(f"[probe] corpus match, indexed: $nIndexed docs in $tIndexed%.1f s; " +
      f"recompute: $nRecompute docs in $tRecompute%.1f s " +
      f"(${tRecompute / tIndexed}%.1fx — the corpus-sized term the index " +
      "paid once at build)")
    val (kept1, tB1) = time {
      idx.ingestBatch(batch1, "id", "text", threshold = 0.8).count()
    }
    println(f"[probe] batch 1 full ingest (match + within-batch sweep + " +
      f"append): $batchN docs -> $kept1 kept in $tB1%.1f s " +
      f"(${batchN / tB1}%.0f docs/s); corpus never rescanned")
    val (kept2, tB2) = time {
      idx.ingestBatch(batch2, "id", "text", threshold = 0.8).count()
    }
    println(f"[probe] batch 2: ${batchN / 2} docs -> $kept2 kept in $tB2%.1f s " +
      f"(${batchN / 2 / tB2}%.0f docs/s) against the grown index")
    val m = idx.maintenance()
    println(f"[probe] index: ${m.nDocs} docs, ${m.numEpochs} epochs, " +
      f"appended ${m.appendedFraction}%.3f, bucket skew ${m.bucketSkew}%.1f")
    println(f"""{"probe":"ingest","corpus":$n,"build_sec":$tBuild%.1f,"match_indexed_sec":$tIndexed%.1f,"match_recompute_sec":$tRecompute%.1f,"batch1_docs":$batchN,"batch1_kept":$kept1,"batch1_sec":$tB1%.1f,"batch2_sec":$tB2%.1f}""")
    spark.stop()
  }
}
