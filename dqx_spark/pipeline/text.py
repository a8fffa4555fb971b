"""Text-analysis operators: tokenization, quality scoring, language ID,
document fingerprinting — all pure Column expressions (JVM-side, codegen'd),
no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from dqx_spark.rule import to_col

__all__ = [
    "tokens",
    "token_count",
    "portable_hash60",
    "word_shingles",
    "shingle_hash_array",
    "exploded_shingle_hashes",
    "winnowing_fingerprints",
    "char_ngrams",
    "alpha_ratio",
    "digit_ratio",
    "whitespace_ratio",
    "punct_ratio",
    "upper_ratio",
    "avg_token_length",
    "stopword_ratio",
    "quality_score",
    "sentence_count",
    "syllable_count",
    "flesch_reading_ease",
    "lang_id",
    "doc_fingerprint",
    "bpe_ish_token_count",
    "text_profile",
    "chunk_by_tokens",
    "top_distinctive_terms",
    "fix_mojibake",
    "strip_html",
    "normalize_text",
    "redact_pii",
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
    """Whitespace tokens; empty/null text -> empty array.

    Empty fragments are filtered out, so leading/trailing NON-SPACE
    whitespace (``"a\\n"``) cannot manufacture phantom "" tokens — Spark's
    ``trim`` strips only spaces, and a bare ``split`` leaves empty strings
    at the edges (semantics match Python's ``str.split()``)."""
    col = to_col(column)
    raw = F.split(F.coalesce(col, F.lit("")), r"\s+")
    return F.filter(raw, lambda t: t != "")


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


def portable_hash60(column: str | Column) -> Column:
    """Engine-portable 60-bit hash: the first 15 hex chars of md5, as a
    non-negative long (< 2^60, so it can never overflow a signed 64-bit on
    either engine).  DuckDB twin:
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT`` — bit-identical,
    which makes hash-seeded operators (MinHash, SimHash) oracle-checkable.
    xxhash64 stays the default hot-path primitive; this is the conformance/
    reproducibility path (md5 throughput is ~5× lower)."""
    return F.conv(F.substring(F.md5(to_col(column)), 1, 15), 16, 10).cast("long")


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


def shingle_hash_array(
    df, id_col: str, text_col: str, k: int = 5, lowercase: bool = True, hash_name: str = "xxhash64"
):
    """(id, hs) DataFrame: ``hs[p]`` is the hash of the word k-gram starting
    at 0-based token position ``p`` — the ONE shared per-position builder
    behind every shingle consumer (:func:`exploded_shingle_hashes`,
    :func:`winnowing_fingerprints`, span dedup), so the CSE-guard subtlety
    below lives in exactly one place.

    ``hash_name='xxhash64'`` (default, hot path) never materializes shingle
    strings: two projections on purpose — tokens are xxhash64'd once into an
    intermediate ``array<long>`` column, and the second projection hashes
    k-long *slices* of that array (``xxhash64(slice(th, i, k))``).  Keeping
    the token-hash array in its own projection stops Catalyst's
    CollapseProject from inlining it into the per-position lambda — inlined,
    the tokenizer re-runs for every shingle position (O(tokens²) per doc;
    benchmarked 9× slower at sf0.1).  The dominant shingling cost at 100 TB
    drops from string-building to long hashing.

    ``hash_name='md5'`` is the engine-portable path: the shingle STRING is
    built (``array_join`` of the token slice) and hashed with
    :func:`portable_hash60`, so DuckDB/Trino can reproduce every hash value
    bit-for-bit — the conformance-oracle mode.  Same CSE guard."""
    if hash_name not in ("xxhash64", "md5"):
        raise ValueError(f"hash_name must be 'xxhash64' or 'md5', got {hash_name!r}")
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    if hash_name == "md5":
        step1 = df.select(F.col(id_col).alias("id"), tokens(col).alias("__tk"))
        per_pos = lambda i: portable_hash60(F.array_join(F.slice(F.col("__tk"), i, k), " "))  # noqa: E731
    else:
        th = F.transform(tokens(col), lambda t: F.xxhash64(t))
        step1 = df.select(F.col(id_col).alias("id"), th.alias("__tk"))
        per_pos = lambda i: F.xxhash64(F.slice(F.col("__tk"), i, k))  # noqa: E731
    n = F.size(F.col("__tk"))
    grams = F.when(
        n >= k, F.transform(F.sequence(F.lit(1), n - (k - 1)), per_pos)
    ).otherwise(F.array().cast("array<long>"))
    return step1.select("id", grams.alias("hs"))


def exploded_shingle_hashes(
    df, id_col: str, text_col: str, k: int = 5, lowercase: bool = True, hash_name: str = "xxhash64"
):
    """(id, h) DataFrame: one row per distinct word-k-gram hash per document
    — ``array_distinct`` + explode over :func:`shingle_hash_array` (see it
    for the hash modes and the CollapseProject CSE guard).  Equivalent to
    hashing ``word_shingles`` output modulo negligible 64-bit collisions."""
    arr = shingle_hash_array(df, id_col, text_col, k=k, lowercase=lowercase, hash_name=hash_name)
    return arr.select("id", F.explode(F.array_distinct(F.col("hs"))).alias("h"))


def winnowing_fingerprints(
    df, id_col: str, text_col: str, k: int = 5, w: int = 4, lowercase: bool = True, hash_name: str = "xxhash64"
):
    """(id, h): distinct winnowing-selected fingerprints per document
    (Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm): hash every
    word k-gram, slide a window of ``w`` consecutive k-gram hashes, and
    select each window's MINIMUM hash.  ~``2/(w+1)`` of the k-gram hashes
    survive, with the paper's guarantee intact: any shared token run of
    at least ``w + k - 1`` tokens contains a full window on both sides,
    whose minimum is selected by both documents — so sufficiently long
    overlaps are NEVER missed, unlike uniform sampling.  Documents with
    fewer than ``w`` k-grams contribute the minimum of what they have
    (at least one fingerprint whenever a k-gram exists).

    Selection is by window-minimum VALUE (the classic rightmost-position
    tie rule only affects positions, not the fingerprint set — set-based
    matching is position-free).  Same hash modes, CSE-guarded projection
    shape, and scale behavior as :func:`exploded_shingle_hashes`; the
    payoff is a ~``(w+1)/2``× smaller fingerprint shuffle for pair
    detection over long documents.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    step2 = shingle_hash_array(df, id_col, text_col, k=k, lowercase=lowercase, hash_name=hash_name)
    m = F.size(F.col("hs"))
    fps = (
        F.when(
            m >= w,
            F.transform(
                F.sequence(F.lit(1), m - (w - 1)),
                lambda j: F.array_min(F.slice(F.col("hs"), j, w)),
            ),
        )
        .when(m >= 1, F.array(F.array_min(F.col("hs"))))
        .otherwise(F.array().cast("array<long>"))
    )
    return step2.select("id", F.explode(F.array_distinct(fps)).alias("h"))


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


def sentence_count(column: str | Column) -> Column:
    """Sentences = runs of terminal punctuation (``[.!?]+`` — an ellipsis
    or ``?!`` ends ONE sentence); text with words but no terminator counts
    as one.  Both the run-regex and the floor are engine-portable, so the
    gate's DuckDB twin re-derives the count exactly."""
    col = F.coalesce(to_col(column), F.lit(""))
    runs = F.regexp_count(col, F.lit(r"[.!?]+"))
    return F.when(token_count(col) == 0, F.lit(0)).otherwise(F.greatest(runs, F.lit(1)))


def syllable_count(column: str | Column) -> Column:
    """Heuristic syllables: vowel-group runs (``[aeiouy]+``) per lowercased
    token, floored at 1 per token — the standard dependency-free
    approximation used by readability formulas.  One scan, no UDF."""
    toks = tokens(F.lower(F.coalesce(to_col(column), F.lit(""))))
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.greatest(F.regexp_count(t, F.lit("[aeiouy]+")), F.lit(1)),
    )


def flesch_reading_ease(column: str | Column) -> Column:
    """Flesch reading ease (Flesch 1948; public formula):
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``, NULL
    for wordless text.  The arithmetic is written in one fixed order so a
    SQL twin reproduces it bit-for-bit before rounding."""
    col = to_col(column)
    w = token_count(col).cast("double")
    s = sentence_count(col).cast("double")
    syl = syllable_count(col).cast("double")
    score = F.lit(206.835) - F.lit(1.015) * (w / F.greatest(s, F.lit(1.0))) - F.lit(84.6) * (syl / w)
    return F.when(w > 0, score)


def _stopword_hits(toks_lower: Column, words: list[str]) -> Column:
    stop = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks_lower, lambda t: F.array_contains(stop, t)))


def stopword_ratio(column: str | Column, language: str = "en") -> Column:
    """Fraction of tokens that are function words of the given language."""
    if language not in LANG_STOPWORDS:
        raise ValueError(f"unsupported language {language!r}; have {sorted(LANG_STOPWORDS)}")
    toks = tokens(F.lower(to_col(column)))
    return _ratio(_stopword_hits(toks, LANG_STOPWORDS[language]), F.size(toks))


def _quality_score_from(col: Column, toks: Column, toks_lower: Column, language: str) -> Column:
    n = F.length(F.coalesce(col, F.lit("")))
    length_component = F.when(n < 20, n.cast("double") / 20.0).when(n > 100000, F.lit(0.5)).otherwise(F.lit(1.0))
    alpha_component = F.least(alpha_ratio(col) / F.lit(0.7), F.lit(1.0))
    awl = _ratio(F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)), F.size(toks))
    word_len_component = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.4))
    stop_ratio = _ratio(_stopword_hits(toks_lower, LANG_STOPWORDS[language]), F.size(toks_lower))
    stop_component = F.least(stop_ratio / F.lit(0.2), F.lit(1.0))
    score = (
        length_component * 0.25 + alpha_component * 0.35 + word_len_component * 0.2 + stop_component * 0.2
    )
    return F.round(score, 6)


def quality_score(column: str | Column, language: str = "en") -> Column:
    """Composite 0..1 quality heuristic: length band + alpha density +
    moderate token length + stopword presence.  Weights are the usual
    pretraining-filter shape (length/punct/stopword ratios)."""
    if language not in LANG_STOPWORDS:
        raise ValueError(f"unsupported language {language!r}; have {sorted(LANG_STOPWORDS)}")
    col = to_col(column)
    return _quality_score_from(col, tokens(col), tokens(F.lower(col)), language)


def _pick_lang(hits: list[Column]) -> tuple[Column, Column]:
    """(best_hits, best_lang) from per-language hit counts, duplicating each
    hit expression at most twice.

    An iterated ``F.when(hits > best_hits, ...)`` chain embeds every earlier
    hit subtree in the next comparison — 2^N copies of the first filter by
    the last language (Catalyst does not CSE these).  Instead each (hits,
    language) pair is packed into one integer ``hits*K + priority`` (earlier
    language = higher priority, so ties keep the original first-wins
    semantics) and ``array_max`` picks the winner in a single evaluation.
    """
    langs = list(LANG_STOPWORDS)
    k = len(langs) + 1
    enc = F.array_max(
        F.array(*[h * k + (len(langs) - i) for i, h in enumerate(hits)])
    )
    best_hits = F.floor(enc / k).cast("int")
    best = F.element_at(
        F.array(*[F.lit(la) for la in langs]), F.lit(len(langs) + 1) - (enc % k)
    )
    return best_hits, best


def _lang_verdict(col: Column, n_toks: Column, best_hits: Column, best: Column) -> Column:
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    hangul = F.length(F.regexp_replace(col, r"[^가-힯]", ""))
    kana = F.length(F.regexp_replace(col, r"[^぀-ヿ]", ""))
    total_chars = F.length(F.coalesce(col, F.lit("")))
    return (
        F.when(total_chars == 0, F.lit("und"))
        .when(kana > total_chars * 0.1, F.lit("ja"))
        .when(hangul > total_chars * 0.1, F.lit("ko"))
        .when(cjk > total_chars * 0.2, F.lit("zh"))
        .when((n_toks > 0) & (best_hits > 0), best)
        .otherwise(F.lit("und"))
    )


def _lang_id_from(col: Column, toks_lower: Column) -> Column:
    hits = [_stopword_hits(toks_lower, words) for words in LANG_STOPWORDS.values()]
    best_hits, best = _pick_lang(hits)
    return _lang_verdict(col, F.size(toks_lower), best_hits, best)


def lang_id(column: str | Column) -> Column:
    """Heuristic language ID: CJK script ratio short-circuits to zh/ja/ko;
    otherwise argmax of per-language stopword hit ratios; 'und' when no
    evidence.  Pure Column expression — at 100 TB this runs inside the scan.
    """
    col = to_col(column)
    return _lang_id_from(col, tokens(F.lower(col)))


# ---------------------------------------------------------------------------
# text_profile: Arrow fast path (r13, VERDICT r12 #7 / guide §4.2)
# ---------------------------------------------------------------------------
# Compiled once per Python worker PROCESS (module-level cache + worker reuse,
# guide §4.5).  `regex` (the C-backed third-party module) is required for
# \p{L}; both it and pyarrow are optional — text_profile falls back to the
# JVM expression chain when either is missing, so pyspark stays the only
# hard dependency.
_PROFILE_STATE: dict | None = None


def _profile_state() -> dict:
    global _PROFILE_STATE
    if _PROFILE_STATE is None:
        import regex

        _PROFILE_STATE = {
            # Java regex \s under default flags is EXACTLY [ \t\n\x0B\f\r];
            # Python \s on str is Unicode whitespace — use the literal class
            # so tokenization matches F.split(col, r"\s+") byte for byte.
            "ws": regex.compile(r"[ \t\n\x0B\f\r]+"),
            "nonletter": regex.compile(r"[^\p{L}]"),
            "cjk": regex.compile(r"[^一-鿿]"),
            "hangul": regex.compile(r"[^가-힯]"),
            "kana": regex.compile(r"[^぀-ヿ]"),
            "stop": {la: frozenset(ws) for la, ws in LANG_STOPWORDS.items()},
            "langs": list(LANG_STOPWORDS),
        }
    return _PROFILE_STATE


def _arrow_profile_available() -> bool:
    try:  # pragma: no cover - import probe
        import pyarrow  # noqa: F401
        import regex  # noqa: F401
    except Exception:  # noqa: BLE001
        return False
    return True


def _profile_arrow_batches(batches, language: str):
    """mapInArrow body for :func:`text_profile` — input batches of
    (id, __s non-null text), output (id passthrough, token_count int,
    lang, __q/__awl/__sr/__ar RAW doubles, fingerprint).

    Per-value arithmetic is plain IEEE-double Python, written in the same
    evaluation order as the JVM expression chain, so every raw double is
    bit-identical to the JVM path; the final HALF_UP round(.,6) is applied
    by F.round in the caller's JVM projection — NOT here — so the
    Java-vs-Python decimal-rounding boundary class cannot exist."""
    import hashlib

    import pyarrow as pa

    st = _profile_state()
    ws, nonletter = st["ws"], st["nonletter"]
    cjk_re, hangul_re, kana_re = st["cjk"], st["hangul"], st["kana"]
    stop, langs = st["stop"], st["langs"]
    for batch in batches:
        ids = batch.column(0)
        texts = batch.column(1).to_pylist()
        n_rows = len(texts)
        tc = [0] * n_rows
        lang_out = [""] * n_rows
        q = [0.0] * n_rows
        awl_out = [0.0] * n_rows
        sr_out = [0.0] * n_rows
        ar_out = [0.0] * n_rows
        fp = [""] * n_rows
        for i, s in enumerate(texts):
            toks = [t for t in ws.split(s) if t != ""]
            tl = [t for t in ws.split(s.lower()) if t != ""]
            n_toks, n_tl = len(toks), len(tl)
            wchars = sum(len(t) for t in toks)
            alpha_chars = len(nonletter.sub("", s))
            hits = {la: sum(1 for t in tl if t in stop[la]) for la in langs}
            # _pick_lang: max hits, ties to the EARLIER language in dict order
            best = min(langs, key=lambda la: (-hits[la], langs.index(la)))
            n = len(s)
            # _ratio(): 0.0 (not null) on a zero denominator
            awl = (wchars / n_toks) if n_toks else 0.0
            alpha = (alpha_chars / n) if n else 0.0
            stop_ratio = (hits[language] / n_tl) if n_tl else 0.0
            length_component = (n / 20.0) if n < 20 else (0.5 if n > 100000 else 1.0)
            alpha_component = min(alpha / 0.7, 1.0)
            word_len_component = 1.0 if 2.0 <= awl <= 12.0 else 0.4
            stop_component = min(stop_ratio / 0.2, 1.0)
            score = (length_component * 0.25 + alpha_component * 0.35
                     + word_len_component * 0.2 + stop_component * 0.2)
            # _lang_verdict: script-ratio short-circuits, then stopword argmax
            if n == 0:
                lang = "und"
            elif len(kana_re.sub("", s)) > n * 0.1:
                lang = "ja"
            elif len(hangul_re.sub("", s)) > n * 0.1:
                lang = "ko"
            elif len(cjk_re.sub("", s)) > n * 0.2:
                lang = "zh"
            elif n_tl > 0 and hits[best] > 0:
                lang = best
            else:
                lang = "und"
            # doc_fingerprint: md5(lower(trim(regexp_replace(s, \s+, ' ')))) —
            # Spark trim strips SPACES only, so strip(' '), not strip()
            tc[i] = n_toks
            lang_out[i] = lang
            q[i] = score
            awl_out[i] = awl
            sr_out[i] = stop_ratio
            ar_out[i] = alpha
            fp[i] = hashlib.md5(ws.sub(" ", s).strip(" ").lower().encode("utf-8")).hexdigest()
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array(tc, pa.int32()),
                pa.array(lang_out, pa.string()),
                pa.array(q, pa.float64()),
                pa.array(awl_out, pa.float64()),
                pa.array(sr_out, pa.float64()),
                pa.array(ar_out, pa.float64()),
                pa.array(fp, pa.string()),
            ],
            names=["id", "token_count", "lang", "__q", "__awl", "__sr", "__ar",
                   "fingerprint"],
        )


def _text_profile_arrow(df, id_col: str, text_col: str, language: str):
    from pyspark.sql import types as T

    col = to_col(text_col)
    src = df.select(
        F.col(id_col).alias("id"), F.coalesce(col, F.lit("")).alias("__s")
    )
    out_schema = T.StructType([
        T.StructField("id", src.schema["id"].dataType),
        T.StructField("token_count", T.IntegerType()),
        T.StructField("lang", T.StringType()),
        T.StructField("__q", T.DoubleType()),
        T.StructField("__awl", T.DoubleType()),
        T.StructField("__sr", T.DoubleType()),
        T.StructField("__ar", T.DoubleType()),
        T.StructField("fingerprint", T.StringType()),
    ])

    def gen(batches):
        return _profile_arrow_batches(batches, language)

    prof = src.mapInArrow(gen, out_schema)
    # the HALF_UP decimal rounding stays on the JVM so it is the SAME
    # implementation as the pre-r13 chain (see _profile_arrow_batches)
    return prof.select(
        "id",
        "token_count",
        "lang",
        F.round("__q", 6).alias("quality"),
        F.round("__awl", 6).alias("avg_token_length"),
        F.round("__sr", 6).alias("stopword_ratio"),
        F.round("__ar", 6).alias("alpha_ratio"),
        "fingerprint",
    )


def text_profile(df, id_col: str, text_col: str, language: str = "en",
                 impl: str = "auto"):
    """Every text signal in ONE pass: (id, token_count, lang, quality,
    avg_token_length, stopword_ratio, alpha_ratio, fingerprint).

    The point is plan shape, not new semantics.  Each signal function
    tokenizes internally, and Catalyst cannot CSE a subtree that is
    re-evaluated inside different higher-order-function lambdas — calling
    token_count + lang_id + quality_score on the same column tokenizes the
    text ~10×.  Here the two token arrays (raw + lowercased) are materialized
    once in their OWN projection; CollapseProject keeps the boundary because
    the aliases are non-cheap and multiply referenced, so every downstream
    lambda reads the array column instead of re-splitting the string.
    Benchmarked ~2× over composing the individual signal functions at sf0.1
    (warm JVM, full materialization) — on top of the ~3× the encoded
    ``_pick_lang`` argmax gained over the old when-chain inside lang_id.

    ``impl`` (r13, VERDICT r12 #7 / guide §4.2): ``'arrow'`` runs the whole
    per-document computation in ONE ``mapInArrow`` pass — C-backed ``regex``
    tokenization beats the JVM higher-order-function chain ~1.5× at sf0.1
    (committed A/B `scripts/ab_text_profile_arrow_result.json`: bit-identical
    on the bench corpus AND a unicode/whitespace edge fixture; parity also
    pinned in tests).  Only (id, text) cross the Python boundary and the
    decimal rounding stays on the JVM, so values are unchanged.  ``'jvm'``
    keeps the pure-Column chain; ``'auto'`` (default) picks arrow when
    pyarrow + regex import, else jvm."""
    if language not in LANG_STOPWORDS:
        raise ValueError(f"unsupported language {language!r}; have {sorted(LANG_STOPWORDS)}")
    if impl not in ("auto", "arrow", "jvm"):
        raise ValueError(f"impl must be 'auto', 'arrow' or 'jvm', got {impl!r}")
    if impl == "auto":
        impl = "arrow" if _arrow_profile_available() else "jvm"
    if impl == "arrow":
        return _text_profile_arrow(df, id_col, text_col, language)
    col = to_col(text_col)
    step1 = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(col, F.lit("")).alias("__s"),
        tokens(col).alias("__toks"),
        tokens(F.lower(col)).alias("__tl"),
    )
    s, toks, tl = F.col("__s"), F.col("__toks"), F.col("__tl")
    # every expensive scan — 7 stopword filters, the token-length fold, the
    # alpha regex — lands in its own alias exactly once; the final projection
    # combines cheap column refs, so nothing is re-evaluated however often
    # the verdict logic references it
    step2 = step1.select(
        "id",
        "__s",
        F.size(toks).alias("__n_toks"),
        F.size(tl).alias("__n_tl"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).alias("__wchars"),
        F.length(F.regexp_replace(s, r"[^\p{L}]", "")).alias("__alpha_chars"),
        *[
            _stopword_hits(tl, words).alias(f"__h_{lang}")
            for lang, words in LANG_STOPWORDS.items()
        ],
    )
    best_hits, best = _pick_lang([F.col(f"__h_{la}") for la in LANG_STOPWORDS])
    s2 = F.col("__s")
    n = F.length(s2)
    awl = _ratio(F.col("__wchars"), F.col("__n_toks"))
    alpha = _ratio(F.col("__alpha_chars"), n)
    stop_ratio = _ratio(F.col(f"__h_{language}"), F.col("__n_tl"))
    length_component = F.when(n < 20, n.cast("double") / 20.0).when(n > 100000, F.lit(0.5)).otherwise(F.lit(1.0))
    alpha_component = F.least(alpha / F.lit(0.7), F.lit(1.0))
    word_len_component = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.4))
    stop_component = F.least(stop_ratio / F.lit(0.2), F.lit(1.0))
    score = (
        length_component * 0.25 + alpha_component * 0.35 + word_len_component * 0.2 + stop_component * 0.2
    )
    return step2.select(
        "id",
        F.col("__n_toks").alias("token_count"),
        _lang_verdict(s2, F.col("__n_tl"), best_hits, best).alias("lang"),
        F.round(score, 6).alias("quality"),
        F.round(awl, 6).alias("avg_token_length"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.md5(F.lower(F.trim(F.regexp_replace(s2, r"\s+", " ")))).alias("fingerprint"),
    )


def chunk_by_tokens(
    df, id_col: str, text_col: str, chunk_size: int, overlap: int = 0
):
    """Split documents into overlapping token windows (RAG-style chunking):
    (id, chunk_idx, start_tok, n_toks, chunk) where ``chunk`` is the window's
    tokens rejoined with single spaces (whitespace is normalized, the price
    of tokenizing once).  Chunk k starts at token ``k * (chunk_size -
    overlap)``; the last chunk may be short; empty docs produce no chunks.

    Scan-local: tokens materialize once per doc in their own projection, the
    windows are array slices of that column, and the only data movement is
    the explode — no shuffle at any corpus size.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    step = chunk_size - overlap
    step1 = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    n = F.size(F.col("__toks"))
    num_chunks = F.when(n > 0, F.floor((n - 1) / step) + 1).otherwise(F.lit(0)).cast("int")
    # sequence(0, -1) DESCENDS in Spark — guard the empty-doc case explicitly
    idx_array = F.when(num_chunks > 0, F.sequence(F.lit(0), num_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = step1.select("id", "__toks", F.explode(idx_array).alias("chunk_idx"))
    start = F.col("chunk_idx") * step + 1
    window = F.slice(F.col("__toks"), start, chunk_size)
    return chunks.select(
        "id",
        "chunk_idx",
        (start - 1).alias("start_tok"),
        F.size(window).alias("n_toks"),
        F.array_join(window, " ").alias("chunk"),
    )


def top_distinctive_terms(
    df, id_col: str, text_col: str, k: int = 10, min_term_len: int = 2, idf: str = "linear"
):
    """Top-k most distinctive terms per document by TF-IDF: (id, term, tf,
    df_count, score, rank).

    ``idf='linear'`` (default) scores ``tf / df`` — idf as 1/df instead of
    the textbook ``ln(N/df)``.  Chosen as the default because one IEEE
    division of two integers is bit-exact across engines (the ranking is
    reproducible in DuckDB/Trino for conformance tests), while ``ln`` is
    libm-dependent to the last ulp.  ``idf='log'`` gives the textbook
    ``tf * ln(N/df)``.  Ties break by term ascending.

    Scale shape: explode lowercased tokens -> per-(doc, term) counts (one
    shuffle, map-side combined) -> per-term doc frequency from that result
    (second shuffle, slim (term, count) rows) -> join back on term -> row
    top-k per doc (third shuffle, rows already reduced to distinct terms).
    The doc total N (log mode only) is a 1-row aggregate broadcast via
    crossJoin, never a driver action.
    """
    if idf not in ("linear", "log"):
        raise ValueError("idf must be 'linear' or 'log'")
    toks = tokens(F.lower(F.col(text_col)))
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(toks, lambda t: F.length(t) >= min_term_len)).alias("term"),
    )
    tf = ex.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    joined = tf.join(docfreq, "term")
    if idf == "linear":
        score = F.col("tf").cast("double") / F.col("df_count").cast("double")
    else:
        n_docs = df.select(F.count(F.lit(1)).alias("__n"))
        joined = joined.crossJoin(F.broadcast(n_docs))
        score = F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df_count"))
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        joined.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "tf", "df_count", "score", "rank")
    )


def doc_fingerprint(column: str | Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text.  md5 is engine-portable (same value in DuckDB/Trino),
    which makes exact-dedup oracle-checkable."""
    col = to_col(column)
    normalized = F.lower(F.trim(F.regexp_replace(F.coalesce(col, F.lit("")), r"\s+", " ")))
    return F.md5(normalized)


_MOJIBAKE_MARKERS = "ÃÂâ€š‚„…‰‹œž¢£"


def _repair_mojibake_str(v: str | None) -> str | None:
    """Undo UTF-8-read-as-CP1252/Latin-1 double encoding ("Ã©" for "é",
    "â€™" for "'").  Re-encode through cp1252 (latin-1 fallback for the
    five cp1252 holes), decode strictly as UTF-8; keep the original unless
    the round-trip succeeds AND strictly reduces mojibake marker
    characters — clean text that legitimately contains 'Ã' fails one of
    the two conditions and is untouched.  (ftfy's dominant repair leg.)"""
    if v is None or not any(m in v for m in "Ãâ"):
        return v
    try:
        raw = v.encode("cp1252")
    except UnicodeEncodeError:
        try:
            raw = v.encode("latin-1")
        except UnicodeEncodeError:
            return v
    try:
        repaired = raw.decode("utf-8")
    except UnicodeDecodeError:
        return v
    before = sum(v.count(m) for m in _MOJIBAKE_MARKERS)
    after = sum(repaired.count(m) for m in _MOJIBAKE_MARKERS)
    return repaired if repaired != v and after < before else v


def fix_mojibake(column: str | Column) -> Column:
    """Column wrapper for :func:`_repair_mojibake_str` as an Arrow-batched
    pandas UDF.

    This is a genuine UDF case, not a missed builtin: Spark 4's ANSI
    charset functions THROW on the exact inputs the repair must probe
    (``encode(.., 'ISO-8859-1')`` on non-Latin-1 text, ``decode(.., 'UTF-8')``
    on invalid bytes), and cp1252 — the charset real web mojibake goes
    through — is not a supported Spark charset at all.  The UDF
    short-circuits on the 'Ã'/'â' lead characters, so clean batches cost
    one vectorized scan."""
    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        return s.map(_repair_mojibake_str)

    return _fix(to_col(column))


#: the HTML entities worth decoding without an entity table — the ones
#: that actually appear at scale in web text; numeric references are
#: handled separately.  Order matters: &amp; decodes LAST so that
#: "&amp;lt;" round-trips to the literal "&lt;" (not "<").
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def strip_html(column: str | Column, decode_entities: bool = True) -> Column:
    """Plain text from an HTML fragment — the extraction step every web
    corpus runs before the quality/dedup filters:

    1. drop ``<script>``/``<style>``/``<!-- -->`` blocks wholesale
       (content included — it's code, not text);
    2. turn block-level closers/openers (``</p>``, ``<br>``, ``</div>``,
       headings, list items, table rows) into newlines so visual line
       structure survives for the line-based cleaners
       (:func:`~dqx_spark.pipeline.corpus.split_lines` consumers);
    3. strip all remaining tags;
    4. decode the common entities (``&amp;`` last, so double-escaped
       text stays escaped) and collapse leftover space runs.

    Pure Column ``regexp_replace`` chain — scan-local, codegen'd, and
    every pattern is RE2-portable (non-greedy + ``(?is)`` flags; no
    backreferences, no lookarounds), so an oracle twin can run the
    IDENTICAL patterns.  This is the regex tier of extraction: good for
    filtering-grade text; a DOM-fidelity extractor (trafilatura-class)
    is a library dependency by nature and out of scope.  Null stays
    null."""
    col = to_col(column)
    # RE2 has no backreferences, so script/style are two explicit rules
    # rather than one <(script|style)>...</\1> pair — the twin runs the
    # IDENTICAL patterns
    out = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(
        out, r"(?i)</?(p|br|div|h[1-6]|li|ul|ol|tr|table|blockquote|section|article)\b[^>]*>", "\n"
    )
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    if decode_entities:
        # unknown/numeric references beyond the common set stay literal
        # (deterministic text beats a lossy blank for dedup purposes)
        for ent, rep in _HTML_ENTITIES:
            out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    return F.trim(F.regexp_replace(out, r"\n{3,}", "\n\n"))


def normalize_text(
    column: str | Column,
    repair_mojibake: bool = False,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    nfc: bool = False,
) -> Column:
    """Standard corpus text normalization:

    1. optional mojibake repair (:func:`fix_mojibake`; pandas UDF — see its
       docstring for why this step cannot be a builtin)
    2. control-character stripping (C0/C1 minus tab/newline; zero-width
       chars and BOM) — pure Column
    3. whitespace collapsing (runs of spaces/tabs to one space, >2 blank
       lines to one, trimmed) — pure Column
    4. optional NFC unicode normalization (Spark has no NFC builtin) —
       folded into the SAME pandas UDF pass as the mojibake repair when
       both are on, so the Python boundary is crossed at most once.

    Defaults keep the hot path fully JVM-side/codegen'd; the two Python
    steps are opt-in.  Null input stays null.
    """
    raw = to_col(column)
    col = raw
    if repair_mojibake or nfc:

        @F.pandas_udf("string")
        def _py_pass(s: pd.Series) -> pd.Series:
            import unicodedata  # noqa: PLC0415

            def fix(v):
                if v is None:
                    return None
                if repair_mojibake:
                    v = _repair_mojibake_str(v)
                if nfc:
                    v = unicodedata.normalize("NFC", v)
                return v

            return s.map(fix)

        col = _py_pass(col)
    if strip_control:
        col = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F​‌‍﻿]", "")
    if collapse_whitespace:
        col = F.regexp_replace(col, r"[ \t]+", " ")          # horizontal runs
        col = F.regexp_replace(col, r" ?\n ?", "\n")          # spaces around newlines
        col = F.regexp_replace(col, r"\n{3,}", "\n\n")       # huge vertical gaps
        col = F.trim(col)
    return F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(col)


# deterministic redaction order: longer/more-specific patterns first so a
# credit card is not half-eaten by the phone pattern
_REDACT_ORDER = ["EMAIL_ADDRESS", "CREDIT_CARD", "US_SSN", "IP_ADDRESS", "PHONE_NUMBER"]


def redact_pii(
    column: str | Column,
    entities: list[str] | None = None,
    replacement: str = "[{entity}]",
) -> Column:
    """Redact structured PII in place — the transform twin of the
    ``does_not_contain_pii`` check (same `_PII_PATTERNS` battery, reference
    pii/pii_detection_funcs.py detects but does not rewrite; redaction is a
    training-pipeline need).  A chain of ``regexp_replace`` Column exprs —
    JVM-side, codegen'd, no UDF; ``replacement`` may use ``{entity}`` to
    stamp the entity name (e.g. ``[EMAIL_ADDRESS]``)."""
    from dqx_spark.functions.row_checks import _PII_PATTERNS

    chosen = entities if entities is not None else _REDACT_ORDER
    unknown = [e for e in chosen if e not in _PII_PATTERNS]
    if unknown:
        raise ValueError(f"unsupported PII entities: {unknown}; supported: {sorted(_PII_PATTERNS)}")
    col = to_col(column)
    out = col
    for e in [e for e in _REDACT_ORDER if e in chosen]:
        out = F.regexp_replace(out, _PII_PATTERNS[e], replacement.format(entity=e))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(out)
