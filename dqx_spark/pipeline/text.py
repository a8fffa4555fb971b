"""Text-analysis operators: tokenization, quality scoring, language ID,
document fingerprinting — all pure Column expressions (JVM-side, codegen'd),
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dqx_spark.rule import to_col

__all__ = [
    "tokens",
    "token_count",
    "word_shingles",
    "exploded_shingle_hashes",
    "char_ngrams",
    "alpha_ratio",
    "digit_ratio",
    "whitespace_ratio",
    "punct_ratio",
    "upper_ratio",
    "avg_token_length",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "bpe_ish_token_count",
]

# Small per-language function-word sets for the n-gram/stopword heuristic.
# Public knowledge (most frequent function words per language).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": "the of and to in a is that it for on was with as be at by this have from or are not".split(),
    "de": "der die das und ist in den von zu mit sich des auf nicht ein eine als auch es an werden".split(),
    "fr": "le la les de des et un une dans est pour que qui sur se plus pas au avec par il ne ce".split(),
    "es": "el la los las de y un una en es para que por con no se del al como su lo mas pero".split(),
    "it": "il la le di e un una in che per non con del si da come su sono anche piu questo".split(),
    "pt": "o a os as de e um uma em que para com nao por mais se do da na no como mas foi".split(),
    "nl": "de het een en van in is dat op te zijn voor met als aan er niet om ook maar door".split(),
}


def tokens(column: str | Column) -> Column:
    """Whitespace tokens; empty/null text -> empty array."""
    col = to_col(column)
    trimmed = F.trim(F.coalesce(col, F.lit("")))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(F.split(trimmed, r"\s+"))


def token_count(column: str | Column) -> Column:
    return F.size(tokens(column))


def bpe_ish_token_count(column: str | Column) -> Column:
    """Sub-word-ish token count without a tokenizer dependency: split on
    whitespace, punctuation boundaries, and letter/digit transitions — a
    regex approximation of BPE pre-tokenization."""
    col = to_col(column)
    pieces = F.split(
        F.trim(F.coalesce(col, F.lit(""))),
        r"\s+|(?<=[\p{L}])(?=[\p{N}])|(?<=[\p{N}])(?=[\p{L}])|(?<=[\p{L}\p{N}])(?=[\p{P}])|(?<=[\p{P}])(?=[\p{L}\p{N}])",
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


def word_shingles(column: str | Column, k: int = 5, lowercase: bool = True) -> Column:
    """Distinct word k-grams (the MinHash/Jaccard input unit)."""
    col = to_col(column)
    toks = tokens(F.lower(col) if lowercase else col)
    n = F.size(toks)
    # sequence(1, 0) DESCENDS — guard short texts before building indices
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def exploded_shingle_hashes(df, id_col: str, text_col: str, k: int = 5, lowercase: bool = True):
    """(id, h) DataFrame: one row per distinct word-k-gram 64-bit hash per
    document, built without ever materializing shingle strings.

    Two projections on purpose: tokens are xxhash64'd once into an
    intermediate ``array<long>`` column, and the second projection hashes
    k-long *slices* of that array (``xxhash64(slice(th, i, k))``).  Keeping
    the token-hash array in its own projection stops Catalyst's
    CollapseProject from inlining it into the per-position lambda — inlined,
    the tokenizer re-runs for every shingle position (O(tokens²) per doc;
    benchmarked 9× slower at sf0.1).  Equivalent to hashing
    ``word_shingles`` output modulo negligible 64-bit collisions, and the
    dominant shingling cost at 100 TB drops from string-building to long
    hashing."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    th = F.transform(tokens(col), lambda t: F.xxhash64(t))
    step1 = df.select(F.col(id_col).alias("id"), th.alias("__th"))
    n = F.size(F.col("__th"))
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.xxhash64(F.slice(F.col("__th"), i, k)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return step1.select("id", F.explode(F.array_distinct(grams)).alias("h"))


def char_ngrams(column: str | Column, n: int = 3, lowercase: bool = True) -> Column:
    """Distinct character n-grams."""
    col = to_col(column)
    s = F.lower(col) if lowercase else col
    length = F.length(s)
    grams = F.when(
        length >= n,
        F.transform(F.sequence(F.lit(1), length - (n - 1)), lambda i: F.substring(s, i, n)),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def _ratio(matched_len: Column, total: Column) -> Column:
    return F.when(total > 0, matched_len.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def alpha_ratio(column: str | Column) -> Column:
    col = to_col(column)
    return _ratio(F.length(F.regexp_replace(col, r"[^\p{L}]", "")), F.length(col))


def digit_ratio(column: str | Column) -> Column:
    col = to_col(column)
    return _ratio(F.length(F.regexp_replace(col, r"[^0-9]", "")), F.length(col))


def whitespace_ratio(column: str | Column) -> Column:
    col = to_col(column)
    return _ratio(F.length(col) - F.length(F.regexp_replace(col, r"\s", "")), F.length(col))


def punct_ratio(column: str | Column) -> Column:
    col = to_col(column)
    return _ratio(F.length(col) - F.length(F.regexp_replace(col, r"[\p{P}]", "")), F.length(col))


def upper_ratio(column: str | Column) -> Column:
    col = to_col(column)
    letters = F.regexp_replace(col, r"[^\p{L}]", "")
    uppers = F.regexp_replace(col, r"[^\p{Lu}]", "")
    return _ratio(F.length(uppers), F.length(letters))


def avg_token_length(column: str | Column) -> Column:
    toks = tokens(column)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return _ratio(total, F.size(toks))


def stopword_ratio(column: str | Column, language: str = "en") -> Column:
    """Fraction of tokens that are function words of the given language."""
    if language not in LANG_STOPWORDS:
        raise ValueError(f"unsupported language {language!r}; have {sorted(LANG_STOPWORDS)}")
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[language]])
    toks = tokens(F.lower(to_col(column)))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return _ratio(hits, F.size(toks))


def quality_score(column: str | Column, language: str = "en") -> Column:
    """Composite 0..1 quality heuristic: length band + alpha density +
    moderate token length + stopword presence.  Weights are the usual
    pretraining-filter shape (length/punct/stopword ratios)."""
    col = to_col(column)
    n = F.length(F.coalesce(col, F.lit("")))
    length_component = F.when(n < 20, n.cast("double") / 20.0).when(n > 100000, F.lit(0.5)).otherwise(F.lit(1.0))
    alpha_component = F.least(alpha_ratio(col) / F.lit(0.7), F.lit(1.0))
    awl = avg_token_length(col)
    word_len_component = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.4))
    stop_component = F.least(stopword_ratio(col, language) / F.lit(0.2), F.lit(1.0))
    score = (
        length_component * 0.25 + alpha_component * 0.35 + word_len_component * 0.2 + stop_component * 0.2
    )
    return F.round(score, 6)


def lang_id(column: str | Column) -> Column:
    """Heuristic language ID: CJK script ratio short-circuits to zh/ja/ko;
    otherwise argmax of per-language stopword hit ratios; 'und' when no
    evidence.  Pure Column expression — at 100 TB this runs inside the scan.
    """
    col = to_col(column)
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    hangul = F.length(F.regexp_replace(col, r"[^가-힯]", ""))
    kana = F.length(F.regexp_replace(col, r"[^぀-ヿ]", ""))
    toks = tokens(F.lower(col))
    n_toks = F.size(toks)

    def hit_counter(words: list[str]) -> Column:
        stop = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))

    scores = [(lang, hit_counter(words)) for lang, words in LANG_STOPWORDS.items()]

    best = F.lit("und")
    best_hits = F.lit(0)
    for lang, hits in scores:
        is_better = hits > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, hits).otherwise(best_hits)

    total_chars = F.length(F.coalesce(col, F.lit("")))
    return (
        F.when(total_chars == 0, F.lit("und"))
        .when(kana > total_chars * 0.1, F.lit("ja"))
        .when(hangul > total_chars * 0.1, F.lit("ko"))
        .when(cjk > total_chars * 0.2, F.lit("zh"))
        .when((n_toks > 0) & (best_hits > 0), best)
        .otherwise(F.lit("und"))
    )


def doc_fingerprint(column: str | Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text.  md5 is engine-portable (same value in DuckDB/Trino),
    which makes exact-dedup oracle-checkable."""
    col = to_col(column)
    normalized = F.lower(F.trim(F.regexp_replace(F.coalesce(col, F.lit("")), r"\s+", " ")))
    return F.md5(normalized)
