"""r8: trainable BPE — merge learning on the classic Sennrich fixture,
encode parity, Spark distributed-vs-local agreement."""

import pytest

from dqx_spark.pipeline import bpe


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_local_sennrich():
    merges = bpe.train_bpe_local(SENNRICH, 5)
    # (e,s) 9 > (l,o) 7 ... ranks follow frequency, ties break lexically
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    # min_pair_freq stops the loop before rare merges
    few = bpe.train_bpe_local(SENNRICH, 100, min_pair_freq=7)
    assert few == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    # num_merges=0 is the identity vocabulary
    assert bpe.train_bpe_local(SENNRICH, 0) == []
    with pytest.raises(ValueError, match="num_merges"):
        bpe.train_bpe_local(SENNRICH, -1)
    with pytest.raises(ValueError, match="min_pair_freq"):
        bpe.train_bpe_local(SENNRICH, 1, min_pair_freq=0)


def test_train_bpe_local_tiebreak_deterministic():
    # both pairs occur twice; (a,b) < (c,d) lexicographically
    merges = bpe.train_bpe_local({"ab": 2, "cd": 2}, 1, min_pair_freq=2)
    assert merges == [("a", "b")]


def test_encode_word_local():
    ranks = bpe.merge_ranks(bpe.train_bpe_local(SENNRICH, 5))
    assert bpe.encode_word_local("lowest", ranks) == ["low", "est</w>"]
    assert bpe.encode_word_local("newest", ranks) == ["n", "e", "w", "est</w>"]
    # unknown word falls back to characters + end marker
    assert bpe.encode_word_local("xyz", ranks) == ["x", "y", "z", "</w>"]
    # the trainer's own merged words reassemble fully under enough merges
    full = bpe.merge_ranks(bpe.train_bpe_local(SENNRICH, 100, min_pair_freq=1))
    assert bpe.encode_word_local("low", full) == ["low</w>"]
    assert bpe.encode_word_local("widest", full) == ["widest</w>"]


def test_train_bpe_spark_matches_local(spark):
    rows = [(0, "low low low low low lower lower"), (1, "newest " * 6 + "widest " * 3)]
    df = spark.createDataFrame(rows, "id long, text string")
    merges = bpe.train_bpe(df, "text", 5)
    assert merges == bpe.train_bpe_local(SENNRICH, 5)
    # word_frequencies is the bounded bridge: counts match, cutoffs apply
    wf = dict(bpe.word_frequencies(df, "text"))
    assert wf == SENNRICH
    top2 = bpe.word_frequencies(df, "text", max_word_types=2)
    assert [w for w, _ in top2] == ["newest", "low"]  # count desc, word asc
    assert dict(bpe.word_frequencies(df, "text", min_freq=3)) == {"low": 5, "newest": 6, "widest": 3}


def test_bpe_counts_and_encode_spark(spark):
    merges = bpe.train_bpe_local(SENNRICH, 5)
    ranks = bpe.merge_ranks(merges)
    rows = [
        (0, "low lowest"),
        (1, "NEWEST xyz"),  # lowercased by default; xyz unknown
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    counts = {r["id"]: r["bpe_tokens"] for r in bpe.bpe_token_counts(df, "id", "text", merges).collect()}
    expect = {
        0: len(bpe.encode_word_local("low", ranks)) + len(bpe.encode_word_local("lowest", ranks)),
        1: len(bpe.encode_word_local("newest", ranks)) + len(bpe.encode_word_local("xyz", ranks)),
        2: 0,
        3: 0,
    }
    assert counts == expect
    enc = {r["id"]: r["bpe"] for r in bpe.bpe_encode(df, "id", "text", merges).collect()}
    assert enc[0] == ["low", "</w>", "low", "est</w>"]
    assert enc[1] == ["n", "e", "w", "est</w>", "x", "y", "z", "</w>"]
    assert enc[2] == [] and enc[3] == []


def test_bpe_unicode_whitespace_train_encode_parity(spark):
    """r8 review: Java \\s+ (training) is ASCII-only — the encode path
    must treat a NBSP-joined pair as ONE word exactly like training does,
    not split it the Python str.split() way."""
    word = "foo\u00a0bar"  # NBSP: Unicode whitespace, NOT Java \\s
    df = spark.createDataFrame([(0, word)], "id long, text string")
    assert dict(bpe.word_frequencies(df, "text")) == {word: 1}
    merges = bpe.train_bpe(df, "text", 3, min_pair_freq=1)
    ranks = bpe.merge_ranks(merges)
    counts = {r["id"]: r["bpe_tokens"] for r in bpe.bpe_token_counts(df, "id", "text", merges).collect()}
    assert counts[0] == len(bpe.encode_word_local(word, ranks))
