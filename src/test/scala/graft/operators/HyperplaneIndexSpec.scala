package graft.operators

import graft.SparkSpec
import graft.functions.vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperplaneIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // testdata embeddings: 64-dim float, 500 rows at sf0.001; background
  // pairs top out near cosine 0.51 (the q32 property), so planted
  // positively-scaled copies (cosine 1.0, bit-identical signatures —
  // sign(dot) is scale-invariant) are the only pairs at threshold 0.9 and
  // LSH recall on them is DETERMINISTIC, not probabilistic.
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding").cache()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def scaledCopies(
      src: org.apache.spark.sql.DataFrame, offset: Long, scale: Float) =
    src.select(($"vec_id" + offset).as("vec_id"),
      transform($"embedding", x => x * lit(scale)).as("embedding"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("batch_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet

  /** Exact batch x corpus cosine pairs — the brute-force truth. */
  private def brute(
      corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame,
      threshold: Double): Set[(Long, Long)] =
    batch.select($"vec_id".cast("long").as("batch_id"),
        $"embedding".as("v_b"))
      .crossJoin(corpus.select($"vec_id".cast("long").as("corpus_id"),
        $"embedding".as("v_c")))
      .filter(vector.cosine_sim($"v_b", $"v_c") >= threshold)
      .select($"batch_id", $"corpus_id")
      .as[(Long, Long)].collect().toSet

  test("indexed batch dedup equals brute-force cross cosine on planted copies") {
    val corpus = emb.filter($"vec_id" < 400)
    // batch: background (>= 400) + scaled copies of 50 corpus vectors
    val batch = emb.filter($"vec_id" >= 400)
      .unionAll(scaledCopies(emb.filter($"vec_id" < 50), 10000L, 2.0f))
    val idx = HyperplaneIndex.build(corpus, "vec_id", "embedding",
      tmp("graft_hpidx"), dim = 64)
    val got = pairs(idx.dedupBatch(batch, "vec_id", "embedding", threshold = 0.9))
    assert(got == brute(corpus, batch, 0.9))
    assert(got == (0L until 50L).map(i => (i + 10000L, i)).toSet,
      "each planted copy matches exactly its source")
  }

  test("gather-pruned verify returns identical pairs to the full-scan plan") {
    // gatherPruneMinCorpus = 0 forces the at-scale candidate-id prune of
    // the stored vecs scan on the small corpus; results must not change
    val corpus = emb.filter($"vec_id" < 400)
    val batch = emb.filter($"vec_id" >= 400)
      .unionAll(scaledCopies(emb.filter($"vec_id" < 50), 10000L, 2.0f))
    val idx = HyperplaneIndex.build(corpus, "vec_id", "embedding",
      tmp("graft_hpidx_gp"), dim = 64)
    val full = pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9))
    val pruned = pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9,
      gatherPruneMinCorpus = 0L))
    assert(pruned == full)
    assert(pruned == (0L until 50L).map(i => (i + 10000L, i)).toSet)
  }

  test("append is equivalent to building on the grown corpus") {
    val idx = HyperplaneIndex.build(emb.filter($"vec_id" < 200),
      "vec_id", "embedding", tmp("graft_hpidx_app"), dim = 64)
    val n = idx.append(emb.filter($"vec_id" >= 200 && $"vec_id" < 400),
      "vec_id", "embedding")
    assert(n == 200L, "append reports the rows it signed")
    val batch = scaledCopies(emb.filter($"vec_id" < 300), 10000L, 3.0f)
    val grown = pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9))
    val oneShot = HyperplaneIndex.build(emb.filter($"vec_id" < 400),
      "vec_id", "embedding", tmp("graft_hpidx_one"), dim = 64)
    assert(grown == pairs(oneShot.dedupBatch(batch, "vec_id", "embedding", 0.9)))
    assert(grown == (0L until 300L).map(i => (i + 10000L, i)).toSet,
      "copies of appended vectors match: the append landed in both layouts")
  }

  test("load restores the hyperplane geometry; a loaded index searches identically") {
    val p = tmp("graft_hpidx_load")
    HyperplaneIndex.build(emb.filter($"vec_id" < 100), "vec_id", "embedding",
      p, dim = 64, nBits = 32, nBands = 4, seed = 7L)
    val loaded = HyperplaneIndex.load(spark, p)
    assert(loaded.dim == 64 && loaded.nBits == 32 && loaded.nBands == 4 &&
      loaded.seed == 7L)
    val batch = scaledCopies(emb.filter($"vec_id" < 100), 10000L, 0.5f)
    assert(pairs(loaded.dedupBatch(batch, "vec_id", "embedding", 0.9)) ==
      (0L until 100L).map(i => (i + 10000L, i)).toSet)
  }

  test("a torn append is invisible; compact preserves results") {
    val p = tmp("graft_hpidx_torn")
    val idx = HyperplaneIndex.build(emb.filter($"vec_id" < 100),
      "vec_id", "embedding", p, dim = 64)
    // simulate a crash mid-append: data lands under the next epoch but the
    // commit row never does
    idx.writeSlice(emb.filter($"vec_id" >= 100 && $"vec_id" < 200),
      "vec_id", "embedding", epoch = 1L)
    val batch = scaledCopies(emb.filter($"vec_id" < 200), 10000L, 2.0f)
    val afterTorn = pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9))
    assert(afterTorn == (0L until 100L).map(i => (i + 10000L, i)).toSet,
      "the uncommitted epoch must be invisible")
    // the retry overwrites the orphan and commits; then compaction merges
    // epochs without changing results
    idx.append(emb.filter($"vec_id" >= 100 && $"vec_id" < 200),
      "vec_id", "embedding")
    val full = (0L until 200L).map(i => (i + 10000L, i)).toSet
    assert(pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9)) == full)
    assert(idx.maintenance().numEpochs == 2)
    idx.compact()
    assert(idx.maintenance().numEpochs == 1)
    assert(pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9)) == full)
  }

  test("ingestBatch: keep-vs-ACCEPTED sweep, replay self-heals, onKept seam") {
    val corpus = emb.filter($"vec_id" < 100)
    val idx = HyperplaneIndex.build(corpus, "vec_id", "embedding",
      tmp("graft_hpidx_ing"), dim = 64)
    // batch in ascending id order: 5000 = copy of corpus 0 (drops),
    // 10000/10001 = mutual copies of fresh vector 400 (first kept, second
    // drops against the KEPT first), 20000 = fresh vector 450 (kept)
    val batch = scaledCopies(emb.filter($"vec_id" === 0), 5000L, 2.0f)
      .unionAll(scaledCopies(emb.filter($"vec_id" === 400), 9600L, 1.5f))
      .unionAll(scaledCopies(emb.filter($"vec_id" === 400), 9601L, 2.5f))
      .unionAll(scaledCopies(emb.filter($"vec_id" === 450), 19550L, 1.0f))
    val kept = idx.ingestBatch(batch, "vec_id", "embedding", threshold = 0.9)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(10000L, 20000L), s"got $kept")
    assert(idx.maintenance().nDocs == 102L, "corpus + the 2 kept vectors")
    // a copy of KEPT 10000 must now drop against the index
    val next = idx.ingestBatch(
      scaledCopies(emb.filter($"vec_id" === 400), 29600L, 4.0f),
      "vec_id", "embedding", threshold = 0.9)
      .select($"vec_id").as[Long].collect()
    assert(next.isEmpty, "a copy of a kept vector must drop")
    // at-least-once replay self-heals
    val replay = idx.ingestBatch(batch, "vec_id", "embedding", threshold = 0.9)
      .select($"vec_id").as[Long].collect()
    assert(replay.isEmpty && idx.maintenance().nDocs == 102L)
    // onKept (the sink seam) runs BEFORE the append: a sink failure aborts
    val fresh = scaledCopies(emb.filter($"vec_id" === 499), 39499L, 1.0f)
    intercept[RuntimeException] {
      idx.ingestBatch(fresh, "vec_id", "embedding", threshold = 0.9,
        onKept = _ => throw new RuntimeException("sink down"))
    }
    assert(idx.maintenance().nDocs == 102L,
      "a failed sink write must abort the append")
    var sawDocs = -1L
    idx.ingestBatch(fresh, "vec_id", "embedding", threshold = 0.9,
      onKept = _ => sawDocs = idx.maintenance().nDocs)
    assert(sawDocs == 102L && idx.maintenance().nDocs == 103L,
      "onKept observes the pre-append index; the append lands after")
  }

  test("wide signatures (nBits > 64) match the brute-force truth and sharpen buckets") {
    val corpus = emb.filter($"vec_id" < 400)
    val batch = emb.filter($"vec_id" >= 400)
      .unionAll(scaledCopies(emb.filter($"vec_id" < 50), 10000L, 2.0f))
    // 128 bits / 8 bands = 16-bit buckets; planted copies still share every
    // word's sign bits, so recall on them stays deterministic
    val wide = HyperplaneIndex.build(corpus, "vec_id", "embedding",
      tmp("graft_hp_wide"), dim = 64, nBits = 128, nBands = 8)
    val got = pairs(wide.dedupBatch(batch, "vec_id", "embedding", 0.9))
    assert(got == brute(corpus, batch, 0.9))
    // the selectivity claim is measurable: 16-bit buckets spread the corpus
    // over strictly more distinct (band, bucket) keys than 8-bit buckets
    val narrow = HyperplaneIndex.build(corpus, "vec_id", "embedding",
      tmp("graft_hp_narrow"), dim = 64, nBits = 64, nBands = 8)
    val wideBuckets = wide.storedBands()
      .select($"band", $"bucket").distinct().count()
    val narrowBuckets = narrow.storedBands()
      .select($"band", $"bucket").distinct().count()
    assert(wideBuckets > narrowBuckets,
      s"expected sharper buckets: wide=$wideBuckets narrow=$narrowBuckets")
    // load restores the wide geometry and searches identically
    val loaded = HyperplaneIndex.load(spark, wide.path)
    assert(loaded.nBits == 128 && loaded.nBands == 8)
    assert(pairs(loaded.dedupBatch(batch, "vec_id", "embedding", 0.9)) == got)
  }

  test("bit-flip multi-probe recovers jittered near-dups exact buckets miss") {
    // wide geometry so buckets are SELECTIVE (16-bit): multiplicative
    // jitter flips the low-margin sign bits, breaking every band for some
    // pairs; probing each band's 1-bit neighbors recovers exactly the
    // pairs within hamming 1 per band. Deterministic: fixed corpus, fixed
    // planes (seed), hash-derived jitter.
    val idx = HyperplaneIndex.build(emb, "vec_id", "embedding",
      tmp("graft_hp_mp"), dim = 64, nBits = 128, nBands = 8)
    // jitter BEFORE re-keying (lateral-alias trap: the hash must see the
    // source vec_id, not the +10000 alias)
    val batch = emb.select($"vec_id",
        zip_with($"embedding",
          transform(sequence(lit(0), lit(63)), j =>
            ((pmod(hash($"vec_id" * 64 + j), lit(2001)) - lit(1000))
              .cast("float") / lit(1000.0f))),
          (x, r) => x * (lit(1.0f) + r * lit(0.2f))).as("embedding"))
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val truth = brute(emb, batch, 0.9)
    val single = pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9))
    val multi = pairs(idx.dedupBatch(batch, "vec_id", "embedding", 0.9,
      probeFlips = 16))
    assert(single.subsetOf(multi), "multi-probe buckets are a superset")
    assert(multi.subsetOf(truth), "precision stays exact (cosine verify)")
    assert(multi.size > single.size,
      s"multi-probe must rescue pairs: single=${single.size} " +
        s"multi=${multi.size} truth=${truth.size}")
    info(s"recall: single ${single.size}/${truth.size}, " +
      s"multi-probe ${multi.size}/${truth.size}")
  }

  test("ingestBatch: probeFlips reaches the within-batch sweep symmetrically") {
    // the exact-jitter construction (AnnUtilSpec): nBits == dim makes the
    // plane matrix square, so the twin's signature differs from its
    // source's in EXACTLY bit 0 of both bands — invisible to the base
    // within-batch scan, visible to every band's single-flip probe. The
    // vacuous threshold isolates candidate visibility (the thing
    // probeFlips changes); corpus-vs-batch collisions are absent at 2^32
    // buckets/band, so the verdicts are deterministic.
    val planes = graft.functions.AnnUtil.randomPlanesWide(64, 64, 42L)
    val corpus = emb.filter($"vec_id" < 100)
    val v450 = emb.filter($"vec_id" === 450).select($"embedding")
      .head().getSeq[Float](0).toArray.map(_.toDouble)
    val twin = graft.functions.AnnUtil.signatureJitter(planes, v450, Set(0, 32))
    val batch = Seq(
      (1000L, v450.map(_.toFloat).toSeq),
      (1001L, twin.map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    def ingestKept(name: String, flips: Int): Set[Long] =
      HyperplaneIndex.build(corpus, "vec_id", "embedding", tmp(name),
          dim = 64, nBits = 64, nBands = 2)
        .ingestBatch(batch, "vec_id", "embedding", threshold = -2.0,
          probeFlips = flips)
        .select($"vec_id").as[Long].collect().toSet
    assert(ingestKept("graft_hp_ing_mp0", 0) == Set(1000L, 1001L),
      "flips=0: the twin pair is invisible, both kept")
    assert(ingestKept("graft_hp_ing_mp1", 1) == Set(1000L),
      "flips=1: the within-batch sweep sees the pair, the higher id drops")
  }

  test("band width must divide the signature word for multi-word geometries") {
    intercept[IllegalArgumentException] {
      HyperplaneIndex(spark, "/tmp/x", dim = 64, nBits = 96, nBands = 4,
        seed = 42L) // width 24 spans word boundaries
    }
    intercept[IllegalArgumentException] {
      HyperplaneIndex(spark, "/tmp/x", dim = 64, nBits = 256, nBands = 2,
        seed = 42L) // width 128 > one word
    }
  }

  test("recommendedNBits: bucket space dwarfs the corpus, width stays legal") {
    // the probe-measured cases: 10M rows needs 32-bit buckets (256/8);
    // small corpora sit happily at 128/8; width never exceeds one word
    assert(HyperplaneIndex.recommendedNBits(10000000L) == 256)
    assert(HyperplaneIndex.recommendedNBits(1000L) == 128)
    assert(HyperplaneIndex.recommendedNBits(1L) == 64)
    assert(HyperplaneIndex.recommendedNBits(10000000000L) == 512)
    Seq(1L, 999L, 65536L, 10000000L, 10000000000L, Long.MaxValue / 128)
      .foreach { n =>
        val bits = HyperplaneIndex.recommendedNBits(n)
        val width = bits / 8
        // the recommendation must always satisfy the constructor contract
        assert(width >= 1 && width <= 64 && (width == 64 || 64 % width == 0))
        // and actually clear the headroom bar (or be pinned at the cap)
        assert(width == 64 ||
          math.pow(2.0, width) >= 64.0 * n.toDouble)
      }
  }
}
