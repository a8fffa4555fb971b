"""VERDICT r12 #7: A/B a mapInArrow vectorized tokenizer against
text_profile's JVM expression chain, with bit-compatibility as the gate.

The JVM chain is a single scan-local projection (optimal plan shape); the
remaining cost is regex/tokenize CPU (bench ratio ~2.2 over the stages
floor).  Guide §4.2 suggests handing whole Arrow batches to native code
can beat JVM codegen for this class.  The catch, recorded in r12's
"Not yet optimized": the operator feeds gate queries whose DuckDB twins
replay the exact JVM split/lower/\\p{L}/md5 semantics — a Python
reimplementation must agree BYTE FOR BYTE or it cannot ship.

This script:
1. implements the full text_profile output via mapInArrow (Python `regex`
   module for \\p{L}, ASCII \\s character class to match Java's default
   non-UNICODE_CHARACTER_CLASS \\s, hashlib md5);
2. compares all 8 output columns row-for-row against the JVM operator on
   the bench corpus (sf0.1 documents) AND on a unicode edge-case fixture;
3. times both bodies interleaved (min-of-5, noop-equivalent agg sink).

Decision rule: adopt only if bit-compatible on BOTH fixtures and faster.
Result is written to scripts/ab_text_profile_arrow_result.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import regex as _re
from pyspark.sql import SparkSession, functions as F

from dqx_spark.pipeline import text as _text

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Java regex \s (default flags) is EXACTLY [ \t\n\x0B\f\r]; Python re/regex
# \s on str is Unicode whitespace — use the explicit class.
_WS = _re.compile(r"[ \t\n\x0B\f\r]+")
_NONLETTER = _re.compile(r"[^\p{L}]")

def _round6(x: float | None) -> float | None:
    """Spark F.round = HALF_UP over the double's exact binary value;
    python round() is banker's — mirror Spark via Decimal."""
    if x is None:
        return None
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


_STOPWORDS = {lang: frozenset(words) for lang, words in _text.LANG_STOPWORDS.items()}
_LANGS = list(_text.LANG_STOPWORDS)  # INSERTION order — ties break first-wins
_CJK = _re.compile(r"[^一-鿿]")
_HANGUL = _re.compile(r"[^가-힯]")
_KANA = _re.compile(r"[^぀-ヿ]")


def _profile_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = {k: [] for k in (
        "id", "token_count", "lang", "quality", "avg_token_length",
        "stopword_ratio", "alpha_ratio", "fingerprint")}
    for i, raw in zip(ids, texts):
        s = raw if raw is not None else ""
        toks = [t for t in _WS.split(s) if t != ""]
        tl = [t for t in _WS.split(s.lower()) if t != ""]
        n_toks, n_tl = len(toks), len(tl)
        wchars = sum(len(t) for t in toks)
        alpha_chars = len(_NONLETTER.sub("", s))
        hits = {la: sum(1 for t in tl if t in _STOPWORDS[la]) for la in _LANGS}
        # _pick_lang: max hits, ties to the EARLIER language in dict order
        best_i = min(range(len(_LANGS)), key=lambda i: (-hits[_LANGS[i]], i))
        best = _LANGS[best_i]
        best_hits = hits[best]
        n = len(s)
        # _ratio() yields 0.0 (not null) on a zero denominator — mirror it
        awl = (wchars / n_toks) if n_toks else 0.0
        alpha = (alpha_chars / n) if n else 0.0
        stop_ratio = (hits["en"] / n_tl) if n_tl else 0.0
        length_component = (n / 20.0) if n < 20 else (0.5 if n > 100000 else 1.0)
        alpha_component = min(alpha / 0.7, 1.0)
        word_len_component = 1.0 if 2.0 <= awl <= 12.0 else 0.4
        stop_component = min(stop_ratio / 0.2, 1.0)
        score = (length_component * 0.25 + alpha_component * 0.35
                 + word_len_component * 0.2 + stop_component * 0.2)
        # lang verdict (mirror _lang_verdict: script overrides, then hits) —
        # regexp_replace(col, [^range], '') KEEPS only the range's chars
        cjk = len(_CJK.sub("", s))
        hangul = len(_HANGUL.sub("", s))
        kana = len(_KANA.sub("", s))
        if n == 0:
            lang = "und"
        elif kana > n * 0.1:
            lang = "ja"
        elif hangul > n * 0.1:
            lang = "ko"
        elif cjk > n * 0.2:
            lang = "zh"
        elif n_tl > 0 and best_hits > 0:
            lang = best
        else:
            lang = "und"
        # Spark trim strips SPACES only (the \s+ -> ' ' replace already
        # normalized Java-\s edges; other unicode whitespace must survive,
        # so python's all-whitespace .strip() would diverge)
        fp = hashlib.md5(_WS.sub(" ", s).strip(" ").lower().encode("utf-8")).hexdigest()
        out["id"].append(i)
        out["token_count"].append(n_toks)
        out["lang"].append(lang)
        out["quality"].append(_round6(score))
        out["avg_token_length"].append(_round6(awl))
        out["stopword_ratio"].append(_round6(stop_ratio))
        out["alpha_ratio"].append(_round6(alpha))
        out["fingerprint"].append(fp)
    return pa.RecordBatch.from_pydict(out, schema=_OUT_SCHEMA)


_OUT_SCHEMA = pa.schema([
    ("id", pa.int64()), ("token_count", pa.int32()), ("lang", pa.string()),
    ("quality", pa.float64()), ("avg_token_length", pa.float64()),
    ("stopword_ratio", pa.float64()), ("alpha_ratio", pa.float64()),
    ("fingerprint", pa.string()),
])


def _arrow_profile(df):
    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            yield _profile_batch(b)

    schema = ("id long, token_count int, lang string, quality double, "
              "avg_token_length double, stopword_ratio double, alpha_ratio double, "
              "fingerprint string")
    return df.select("doc_id", "text").mapInArrow(gen, schema)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_text_profile_arrow")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    lay = f"/tmp/dqx_bench_layout/sf{SF_DIR.rstrip('/').rsplit('sf', 1)[-1]}/documents.parquet"
    docs = spark.read.parquet(lay if os.path.exists(lay) else f"{SF_DIR}/documents.parquet")

    edge = spark.createDataFrame(
        [
            (1, "plain ascii words here"),
            (2, "tabs\tand\nnewlines\x0bmixed\r\nhere"),
            (3, "nbsp is not java \\s whitespace"),
            (4, "Ünïcödé lettërs ånd ñ"),
            (5, "İstanbul I ı TITLE Σίσυφος ΣΊΣΥΦΟΣ"),
            (6, "ﬁligature ﬆrange ǅigraph"),
            (7, ""),
            (8, None),
            (9, "  leading and trailing  "),
            (10, "数字と漢字 mixed 日本語 text"),
            (11, "emoji 🙂 and digits 42 #!?"),
        ],
        "doc_id long, text string",
    )

    results: dict = {}
    for name, d in (("edge", edge), ("bench_sf", docs)):
        jvm = {r["id"]: tuple(r)[1:] for r in _text.text_profile(d, "doc_id", "text").collect()}
        arw = {r["id"]: tuple(r)[1:] for r in _arrow_profile(d).collect()}
        diffs = []
        for k in sorted(jvm):
            if jvm[k] != arw.get(k):
                diffs.append({"id": k, "jvm": jvm[k], "arrow": arw.get(k)})
        results[f"{name}_rows"] = len(jvm)
        results[f"{name}_mismatches"] = len(diffs)
        results[f"{name}_first_diffs"] = diffs[:5]

    def timed(fn, runs=5):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    sink = lambda d: d.write.format("noop").mode("overwrite").save()  # noqa: E731
    results["jvm_sec"] = timed(lambda: sink(_text.text_profile(docs, "doc_id", "text")))
    results["arrow_sec"] = timed(lambda: sink(_arrow_profile(docs)))
    results["bit_compatible"] = (
        results["edge_mismatches"] == 0 and results["bench_sf_mismatches"] == 0
    )
    results["verdict"] = (
        "adopt" if results["bit_compatible"] and results["arrow_sec"] < results["jvm_sec"]
        else "keep JVM chain"
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_text_profile_arrow_result.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, default=str)
    print(json.dumps({k: v for k, v in results.items() if "first_diffs" not in k}, default=str))


if __name__ == "__main__":
    main()
