package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hand-computed layout: offsets, blocks, boundary spans") {
    // one shard, token counts 3,4,2,5 into blocks of 5:
    // ends 3,7,9,14; starts 0,3,7,9
    val docs = Seq((0L, 3L), (8L, 4L), (16L, 2L), (24L, 5L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packConcatChunk(docs, "doc_id", "n_tokens",
        contextLen = 5, numShards = 8)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.forall(_._2 == 0L), "all ids are multiples of 8 -> shard 0")
    assert(out.map(r => (r._1, r._3, r._4, r._5)).toSeq == Seq(
      (0L, 0L, 0L, false),  // tokens [0,3)
      (8L, 0L, 3L, true),   // tokens [3,7) crosses block 0 -> 1
      (16L, 1L, 2L, false), // tokens [7,9)
      (24L, 1L, 4L, true))) // tokens [9,14) crosses block 1 -> 2
  }

  test("zero-token docs take the next offset without spanning") {
    val docs = Seq((0L, 5L), (1L, 0L), (2L, 3L)).toDF("doc_id", "n_tokens")
    val out = Packing.packConcatChunk(docs, "doc_id", "n_tokens",
        contextLen = 4, numShards = 1)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // ends 5,5,8; starts 0,5,5 — doc 2's tokens [5,8) sit inside block 1
    // ([4,8) exclusive end), so it does NOT span
    assert(out.map(r => (r._1, r._3, r._4, r._5)).toSeq == Seq(
      (0L, 0L, 0L, true), (1L, 1L, 1L, false), (2L, 1L, 1L, false)))
  }

  test("duplicate ids get per-row running sums (ROWS frame, not RANGE)") {
    // two docs share id 0 with 3 tokens each: a RANGE frame would hand BOTH
    // rows the merged cumulative sum 6 (both "starting" at offset 3); the
    // ROWS frame gives one slot per row — starts {0, 3}, like the oracle's
    // ROWS UNBOUNDED PRECEDING
    val docs = Seq((0L, 3L), (0L, 3L), (1L, 4L)).toDF("doc_id", "n_tokens")
    val out = Packing.packConcatChunk(docs, "doc_id", "n_tokens",
        contextLen = 100, numShards = 1)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.filter(_._1 == 0L).map(_._4).sorted.toSeq == Seq(0L, 3L))
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(6L))
  }

  test("materializeSequences renders the concatenated token windows") {
    // one shard; stream = a b c | d e | f g h -> L=4: [a b c d] [e f g h]
    val docs = Seq((0L, "a b c"), (1L, "d e"), (2L, "f g h"))
      .toDF("doc_id", "text")
    val out = Packing.materializeSequences(docs, "doc_id", "text",
        contextLen = 4, numShards = 1)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((0L, 0L, "a b c d", 4L), (0L, 1L, "e f g h", 4L)))
  }

  test("materializeSequences: a long doc spans several sequences; tail runs short") {
    val docs = Seq((0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (1L, "u0 u1"))
      .toDF("doc_id", "text")
    val out = Packing.materializeSequences(docs, "doc_id", "text",
        contextLen = 3, numShards = 1)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(
      "t0 t1 t2", "t3 t4 t5", "t6 t7 t8", "t9 u0 u1"))
    assert(out.forall(_._4 == 3L))
  }

  test("materializeSequences round-trips the per-shard token stream on testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val out = Packing.materializeSequences(docs, "doc_id", "text",
      contextLen = 512, numShards = 4)
    // reassembling sequences in order per shard must give exactly the
    // shard's docs concatenated in id order
    // collect_list order is not defined post-shuffle: sort inside the agg
    def joined(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column,
        ord: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      df.groupBy(key.as("shard"))
        .agg(array_join(transform(
          sort_array(collect_list(struct(ord.as("o"), v.as("v")))),
          x => x.getField("v")), " ").as("s"))
        .as[(Long, String)].collect().toMap
    val got = joined(out, $"shard", $"seq_index", $"seq_text")
    val want = joined(docs, pmod($"doc_id", lit(4L)), $"doc_id", $"text")
    assert(got == want)
  }

  test("shards pack independently and deterministically") {
    val docs = (0L until 100L).map(i => (i, 7L)).toDF("doc_id", "n_tokens")
    val a = Packing.packConcatChunk(docs, "doc_id", "n_tokens", 64, numShards = 4)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = Packing.packConcatChunk(docs, "doc_id", "n_tokens", 64, numShards = 4)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // 25 docs x 7 tokens per shard; doc at shard-position p starts at 7p
    a.foreach { case (id, shard, seq, off, _) =>
      assert(shard == id % 4)
      val pos = 7L * (id / 4)
      assert(seq == pos / 64 && off == pos % 64, s"doc $id")
    }
  }

  test("sequenceManifest orders spans within each block") {
    val docs = Seq((0L, 3L), (8L, 4L), (16L, 2L), (24L, 5L))
      .toDF("doc_id", "n_tokens")
    val layout = Packing.packConcatChunk(docs, "doc_id", "n_tokens", 5, numShards = 8)
    val manifest = Packing.sequenceManifest(layout)
      .as[(Long, Long, Long, Seq[(Long, Long, Boolean)])]
      .collect().sortBy(r => (r._1, r._2))
    // block 0: docs 0 (off 0) and 8 (off 3, spans); block 1: 16 (off 2), 24 (off 4, spans)
    assert(manifest.map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (0L, 2L, Seq((0L, 0L, false), (3L, 8L, true))),
      (1L, 2L, Seq((2L, 16L, false), (4L, 24L, true)))))
  }

  test("packingStats: sequence counts and tail waste per shard") {
    val docs = Seq((0L, 10L), (2L, 10L), (1L, 3L)).toDF("doc_id", "n_tokens")
    val layout = Packing.packConcatChunk(docs, "doc_id", "n_tokens", 8, numShards = 2)
    val stats = Packing.packingStats(layout, docs, "doc_id", "n_tokens", 8)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // shard 0: 20 tokens -> 3 seqs of 8, waste 4; shard 1: 3 tokens -> 1 seq, waste 5
    assert(stats.toSeq == Seq((0L, 2L, 20L, 3L, 4L), (1L, 1L, 3L, 1L, 5L)))
  }

  test("packByOrder: id-order shards reproduce packConcatChunk; epoch order reorders the stream") {
    val docs = Seq((0L, 5L), (1L, 3L), (2L, 7L), (3L, 4L), (4L, 6L), (5L, 2L))
      .toDF("id", "n")
    // degenerate composition: shard = id % 2, order = id — must equal the
    // id-ordered packer bit for bit
    val viaOrder = Packing.packByOrder(
        docs.select($"id", $"n", pmod($"id", lit(2)).as("sh"), $"id".as("pos")),
        "id", "n", "sh", "pos", contextLen = 8)
      .select($"id", $"shard", $"seq_index", $"start_offset", $"spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val viaChunk = Packing.packConcatChunk(docs, "id", "n", contextLen = 8,
        numShards = 2)
      .select($"id", $"shard".cast("long"), $"seq_index", $"start_offset",
        $"spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(viaOrder == viaChunk)
    // a REVERSED epoch order must lay the same tokens out differently:
    // one shard, order = -id -> doc 5 packs first
    val rev = Packing.packByOrder(
        docs.select($"id", $"n", lit(0).as("sh"), (-$"id").as("pos")),
        "id", "n", "sh", "pos", contextLen = 8)
      .select($"id", $"position", $"seq_index", $"start_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(rev.head._1 == 5L && rev.head._3 == 0L && rev.head._4 == 0L,
      "the first doc in epoch order starts the stream")
    // offsets are the running sum in the GIVEN order: 2,6,4,7,3,5 tokens
    val offs = rev.map(r => (r._1, r._3 * 8 + r._4)).toMap
    assert(offs == Map(5L -> 0L, 4L -> 2L, 3L -> 8L, 2L -> 12L, 1L -> 19L,
      0L -> 22L))
  }

  test("packing denominated in REAL tokenizer tokens: BpeCount feeds the layout") {
    // context budgets are what a training pipeline actually allocates in
    // BPE tokens, not whitespace words — packConcatChunk's nTokensCol is
    // deliberately pluggable, so the composition is one projection
    import graft.text.BpeTokenizer
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(64).cache()
    val model = BpeTokenizer.train(docs, "text", numMerges = 64)
    assert(model.merges.nonEmpty)
    val counted = docs.select($"doc_id",
      BpeTokenizer.bpeTokenCount($"text", model).as("n_bpe"))
    val layout = Packing.packConcatChunk(counted, "doc_id", "n_bpe",
        contextLen = 512, numShards = 4)
      .select($"doc_id", $"shard", $"seq_index", $"start_offset")
      .as[(Long, Long, Long, Long)].collect()
    // the layout's global offsets must be the running sums of the BPE
    // counts, shard by shard, in id order — i.e. the budget really is
    // denominated in tokenizer tokens
    val counts = counted.as[(Long, Long)].collect().toMap
    layout.groupBy(_._2).foreach { case (_, rows) =>
      var expect = 0L
      rows.sortBy(_._1).foreach { case (id, _, seq, off) =>
        assert(seq * 512 + off == expect,
          s"doc $id: offset ${seq * 512 + off}, expected $expect")
        expect += counts(id)
      }
    }
    // BPE merges make counts differ from whitespace words (fewer symbols
    // than characters, more than words is typical; equality would mean the
    // model learned nothing)
    val words = docs.select(size(split($"text", " ")).cast("long"))
      .as[Long].collect().sum
    assert(counts.values.sum != words,
      "BPE token total must differ from the whitespace-word total")
  }
}
