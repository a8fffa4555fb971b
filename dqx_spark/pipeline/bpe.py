"""Trainable byte-pair encoding (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") for
corpus-scale token accounting.

Spark-first split, the same one every public BPE trainer uses
(subword-nmt, SentencePiece, HF tokenizers): corpus scale lives entirely
in the **word-frequency table** — one distributed ``groupBy(word)``
shuffle — while the merge LOOP runs driver-local over the bounded set of
distinct word TYPES (``max_word_types``, FAISS-style explicit sampling
discipline: the driver never holds the corpus, only its vocabulary).
A 100 TB corpus has millions of word types, not trillions; the cutoff is
loud and configurable.

Encoding back over the corpus is an Arrow-batched pandas UDF: the merge
ranks ride a broadcast closure, each batch keeps a word→tokens cache
(natural-language batches repeat words heavily), and the scan is
embarrassingly parallel — no shuffle, no driver involvement.

The merge loop maintains the standard incremental pair index
(pair → affected word types) so each merge touches only the words that
contain it — O(affected · |word|) per merge, not a full recount.

All driver-side pieces (:func:`train_bpe_local`,
:func:`encode_word_local`) are pure Python shared verbatim by the
correctness-gate oracle twin, so "distributed == local replay" is
falsifiable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqx_spark.rule import to_col

__all__ = [
    "END_OF_WORD",
    "train_bpe_local",
    "encode_word_local",
    "merge_ranks",
    "word_frequencies",
    "train_bpe",
    "bpe_token_counts",
    "bpe_encode",
]

#: end-of-word marker appended as its own symbol (Sennrich §3.2) — keeps
#: "low" the word distinct from "low" the prefix of "lower"
END_OF_WORD = "</w>"


# ---------------------------------------------------------------------------
# pure-Python core (shared with oracle twins)
# ---------------------------------------------------------------------------
def _merge_syms(syms: list[str], a: str, b: str, merged: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_local(
    word_counts: dict, num_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word→frequency table —
    pure Python, deterministic (ties on pair frequency break toward the
    lexicographically smallest pair; word iteration order is sorted), no
    Spark.  Stops early when the best remaining pair occurs fewer than
    ``min_pair_freq`` times.  Returns the merge list in rank order."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if min_pair_freq < 1:
        raise ValueError(f"min_pair_freq must be >= 1, got {min_pair_freq}")
    words: list[tuple[list[str], int]] = [
        ([*w, END_OF_WORD], int(c)) for w, c in sorted(word_counts.items()) if w
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def account(idx: int, sign: int) -> None:
        syms, c = words[idx]
        for p in zip(syms, syms[1:]):
            new = pair_counts.get(p, 0) + sign * c
            if new <= 0:
                # exact bookkeeping: subtraction only ever removes what was
                # added, so <= 0 means "gone" — drop it from the scan dict
                pair_counts.pop(p, None)
            else:
                pair_counts[p] = new
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)

    for i in range(len(words)):
        account(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_c = 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and c > 0 and (best is None or p < best)):
                best, best_c = p, c
        if best is None or best_c < min_pair_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        # stale indices in pair_words are harmless: subtract-rebuild-add is
        # a no-op for a word that no longer contains the pair
        for i in sorted(pair_words.get(best, ())):
            account(i, -1)
            words[i] = (_merge_syms(words[i][0], best[0], best[1], merged), words[i][1])
            account(i, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict:
    """merge list → pair→rank lookup (lower rank = earlier merge)."""
    return {tuple(p): r for r, p in enumerate(merges)}


def encode_word_local(word: str, ranks: dict) -> list[str]:
    """Segment one word with learned merges: repeatedly apply the
    lowest-rank pair present, at every position simultaneously (the
    standard greedy order — identical to how the trainer built the
    vocabulary).  Unknown characters simply stay single symbols."""
    syms = [*word, END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        best: tuple[str, str] | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        syms = _merge_syms(syms, best[0], best[1], best[0] + best[1])
    return syms


#: Java regex \s (default flags) = [ \t\n\x0B\f\r] — ASCII only.  The
#: encode path must split EXACTLY like the training path's F.split(r"\s+")
#: or a word containing e.g. U+00A0 would train as one type but encode as
#: two never-seen ones (r8 review; Python's str.split() is Unicode-aware
#: and would do exactly that)
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _encode_text_local(text: str | None, ranks: dict, cache: dict) -> list[str]:
    if not text:
        return []
    out: list[str] = []
    for w in _JAVA_WS.split(text):
        if not w:
            continue
        toks = cache.get(w)
        if toks is None:
            toks = encode_word_local(w, ranks)
            cache[w] = toks
        out.extend(toks)
    return out


# ---------------------------------------------------------------------------
# distributed pieces
# ---------------------------------------------------------------------------
def _norm_text(column: str | Column, lowercase: bool) -> Column:
    col = F.coalesce(to_col(column), F.lit(""))
    return F.lower(col) if lowercase else col


def word_frequencies(
    df: DataFrame,
    text_col: str,
    lowercase: bool = True,
    min_freq: int = 1,
    max_word_types: int = 200_000,
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, bounded for the driver: ONE
    shuffle (explode + groupBy word, map-side combined), then the top
    ``max_word_types`` types by (count desc, word asc) — a TakeOrdered
    heap, so the driver holds at most ``max_word_types`` rows no matter
    the corpus size.  Whitespace pre-tokenization matches ``text.tokens``
    (Java ``\\s+``); the encode UDF splits with the same ASCII class so a
    word can never train as one type and encode as another."""
    if max_word_types < 1:
        raise ValueError(f"max_word_types must be >= 1, got {max_word_types}")
    toks = F.filter(F.split(_norm_text(text_col, lowercase), r"\s+"), lambda t: t != "")
    wc = df.select(F.explode(toks).alias("w")).groupBy("w").count()
    if min_freq > 1:
        wc = wc.where(F.col("count") >= min_freq)
    rows = wc.orderBy(F.col("count").desc(), F.col("w").asc()).limit(max_word_types).collect()
    return [(r["w"], int(r["count"])) for r in rows]


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    lowercase: bool = True,
    min_freq: int = 1,
    max_word_types: int = 200_000,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Corpus-scale BPE training: distributed word counting
    (:func:`word_frequencies`) feeding the driver-local merge loop
    (:func:`train_bpe_local`).  Deterministic end to end — same corpus,
    same parameters, same merges."""
    counts = dict(word_frequencies(df, text_col, lowercase, min_freq, max_word_types))
    return train_bpe_local(counts, num_merges, min_pair_freq)


def _bpe_apply(df, id_col, text_col, merges, lowercase, out_col, as_tokens):
    ranks = merge_ranks(merges)

    if as_tokens:

        @F.pandas_udf("array<string>")
        def enc(s):
            cache: dict = {}
            return s.map(lambda t: _encode_text_local(t, ranks, cache))

    else:

        @F.pandas_udf("long")
        def enc(s):
            cache: dict = {}
            return s.map(lambda t: len(_encode_text_local(t, ranks, cache)))

    return df.select(
        F.col(id_col).alias("id"), enc(_norm_text(text_col, lowercase)).alias(out_col)
    )


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, bpe_tokens): per-document token count under the learned
    merges — the number that token-budget mixing and sequence packing
    should be fed once a real tokenizer exists.  Arrow-batched pandas
    UDF, scan-local (no shuffle, no driver participation); the merge
    table rides the serialized closure and each batch caches distinct
    words.  Null/empty text counts 0."""
    return _bpe_apply(df, id_col, text_col, merges, lowercase, out_col, as_tokens=False)


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    out_col: str = "bpe",
) -> DataFrame:
    """(id, bpe): the full subword token array per document (end-of-word
    marker attached to each word's final symbol) — same UDF machinery as
    :func:`bpe_token_counts`, materializing the segmentation itself."""
    return _bpe_apply(df, id_col, text_col, merges, lowercase, out_col, as_tokens=True)
