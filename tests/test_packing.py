"""Sequence-packing operator tests: concat-and-chunk offsets and greedy
no-split binning."""

from pyspark.sql import functions as F

from dqx_spark.pipeline import packing


def test_pack_offsets_contiguous_and_chunked(spark):
    rows = [(i, t) for i, t in enumerate([100, 500, 600, 0, 2048, 24])]
    df = spark.createDataFrame(rows, "doc_id long, tc long")
    out = packing.pack_offsets(df, "doc_id", "tc", 1024, num_shards=1).orderBy("id").collect()
    # offsets are the running sum of everything before
    assert [r.offset for r in out] == [0, 100, 600, 1200, 1200, 3248]
    # doc 2 (600 tokens at offset 600) straddles the cut at 1024
    assert (out[2].first_seq, out[2].last_seq) == (0, 1)
    # empty doc sits at its start sequence
    assert (out[3].first_seq, out[3].last_seq) == (1, 1)
    # the 2048-token doc spans three sequences: 1200 -> 3247
    assert (out[4].first_seq, out[4].last_seq) == (1, 3)


def test_pack_offsets_shards_pack_independently(spark):
    df = spark.createDataFrame([(i, 10) for i in range(40)], "doc_id long, tc long")
    out = packing.pack_offsets(df, "doc_id", "tc", 50, num_shards=4).collect()
    per_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.id)):
        per_shard.setdefault(r.shard, []).append(r.offset)
    # each shard restarts at 0 and steps by 10
    for offs in per_shard.values():
        assert offs == list(range(0, 100, 10))


def test_pack_greedy_respects_capacity(spark):
    rows = [(i, t) for i, t in enumerate([400, 400, 400, 2000, 100, 1024, 1])]
    df = spark.createDataFrame(rows, "doc_id long, tc long")
    out = {r.id: r.bin for r in packing.pack_greedy(df, "doc_id", "tc", 1024, num_shards=1).collect()}
    # 400+400 fit; third 400 overflows -> bin 1; oversized 2000 gets its own
    assert out[0] == out[1] == 0
    assert out[2] == 1
    assert out[3] == 2
    assert out[4] == 3
    # 100+1024 would overflow -> 1024 starts bin 4, exactly fills it
    assert out[5] == 4
    assert out[6] == 5
    # invariant: no bin exceeds capacity unless it holds a single outsized doc
    df2 = spark.createDataFrame([(i, (i * 37) % 700) for i in range(200)], "doc_id long, tc long")
    packed = packing.pack_greedy(df2, "doc_id", "tc", 1024, num_shards=4)
    sums = packed.groupBy("shard", "bin").agg(F.sum("n_tokens").alias("s"), F.count("*").alias("n")).collect()
    for r in sums:
        assert r.s <= 1024 or r.n == 1


def test_chunk_by_tokens(spark):
    from dqx_spark.pipeline import text as T

    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = T.chunk_by_tokens(df, "doc_id", "text", chunk_size=4, overlap=1).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.id, r.chunk_idx)):
        by_doc.setdefault(r.id, []).append(r)
    # doc 0: 10 tokens, step 3 -> starts 0,3,6,9
    assert [c.start_tok for c in by_doc[0]] == [0, 3, 6, 9]
    assert by_doc[0][0].chunk == "t0 t1 t2 t3"
    assert by_doc[0][1].chunk == "t3 t4 t5 t6"  # overlap of 1
    assert by_doc[0][3].chunk == "t9" and by_doc[0][3].n_toks == 1
    # short doc: one short chunk
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk == "a b"
    # empty / null docs produce no chunks
    assert 2 not in by_doc and 3 not in by_doc
