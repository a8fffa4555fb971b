"""BM25 text retrieval over a document corpus — the inverted-index shape,
expressed as DataFrame ops so Catalyst keeps every stage shuffled exactly
once and the query side rides a broadcast.

Scale shape (the reason this is not a naive score-everything join):

* the corpus-sized work is TWO aggregations — ``(id, term)`` term
  frequencies and ``(term)`` document frequencies — both map-side
  combinable, both independent of the query set;
* the query set (a handful of rows) is broadcast end-to-end: query terms
  join document-frequency rows first (tiny result), and only THAT tiny
  frame touches the corpus-sized postings, so the big side shuffles on
  ``term`` once and never sees unmatched terms;
* per-(query, doc) scores fold a BOUNDED array (≤ #query terms) in a
  deterministic sorted order — bit-reproducible across engines, which is
  what lets the DuckDB gate twin hash-match the floats;
* top-k per query is two-stage (salted partial top-k, then global) so a
  single hot query id never funnels the whole corpus through one task.

Formula: Robertson/Sparck-Jones BM25 as used by Lucene —
``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``,
``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``
over the distinct query terms (public knowledge: Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", 2009).

The reference (databrickslabs/dqx) has no retrieval surface — this module
extends the engine for training-data curation: query-based corpus audits,
leaked-benchmark probes phrased as queries, and relevance-boosted sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dqx_spark.pipeline.text import tokens

__all__ = [
    "doc_term_frequencies",
    "query_terms",
    "bm25_idf",
    "bm25_scores",
    "bm25_topk",
    "phrase_match",
    "phrase_decontaminate",
]


def _toks(text_col: str, lowercase: bool) -> Column:
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return tokens(col)


def doc_term_frequencies(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
    positions: bool = False,
) -> DataFrame:
    """``(id, dl, term, tf[, pos])`` — the postings grain every BM25 stage
    reads.

    ``dl`` (document token length) is computed BEFORE the explode and
    carried through the groupBy key, so the whole thing is one scan and
    one map-side-combinable shuffle; no second pass or window re-derives
    lengths.  Known cost (measured via accumulator, r12): Catalyst
    collapses the projection, so the tokenize expression is evaluated
    twice per row — once for ``size(toks)``, once as the ``explode``
    input (Generate and Project don't share subexpressions).  The
    alternatives are worse at scale: deriving dl from the postings needs
    a postings-grain join-back shuffle, and a cache barrier materializes
    the raw corpus — 2× scan-local tokenize CPU is the cheapest shape.  ``positions=True`` adds the sorted 0-based token positions
    per (doc, term) — the Lucene-style positional posting that lets
    :func:`phrase_match` answer exact phrase queries without the text."""
    toks = _toks(text_col, lowercase)
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    if positions:
        return (
            base.select(
                "id", F.size("__toks").alias("dl"), F.posexplode("__toks").alias("p", "term")
            )
            .groupBy("id", "dl", "term")
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list("p")).alias("pos"),
            )
        )
    return (
        base.select("id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str,
    text_col: str,
    phrase_id_col: str = "pid",
    phrase_col: str = "phrase",
    lowercase: bool = True,
) -> DataFrame:
    """``(pid, id)`` — documents containing each phrase as an EXACT token
    sequence (same tokenization as BM25; punctuation/casing folded per
    ``lowercase``).

    Scan path: both sides are canonicalized to a single-space token join
    wrapped in sentinels (``' t1 t2 ... '``) and matched with
    ``contains`` — token-sequence containment is exactly substring
    containment of the canonical forms.  The (small) phrase side is
    broadcast, so the corpus is one projected scan.  Empty phrases match
    nothing (a bare sentinel would match everything).

    The index path (:func:`~dqx_spark.pipeline.text_index.
    phrase_match_index`) answers the same question from positional
    postings without touching the text."""
    dt = _toks(text_col, lowercase)
    pt = _toks(phrase_col, lowercase)
    canon = lambda t: F.concat(F.lit(" "), F.array_join(t, " "), F.lit(" "))  # noqa: E731
    d = docs.select(F.col(id_col).alias("id"), canon(dt).alias("__c"))
    p = phrases.select(
        F.col(phrase_id_col).alias("pid"), canon(pt).alias("__p"), F.size(pt).alias("__n")
    ).where(F.col("__n") > 0)
    # distinct: duplicate phrase rows, or a pid carrying several phrases
    # matching the same doc, yield one row per (pid, id) — the same
    # contract the index path keeps
    return (
        d.join(F.broadcast(p), F.contains(F.col("__c"), F.col("__p")))
        .select("pid", "id")
        .distinct()
    )


def query_terms(
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """``(qid, term)`` — DISTINCT terms per query (the standard short-query
    BM25 simplification: query-side tf is ignored)."""
    toks = _toks(query_text_col, lowercase)
    return queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(F.array_distinct(toks)).alias("term"),
    )


def bm25_idf(df_count: Column, n_docs: Column) -> Column:
    """Lucene's non-negative BM25 idf: ``ln(1 + (N - df + .5)/(df + .5))``."""
    return F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - df_count + F.lit(0.5)) / (df_count + F.lit(0.5))
    )


def _contrib(tf: Column, dl: Column, idf: Column, avgdl: Column, k1: float, b: float) -> Column:
    tfd = tf.cast("double")
    norm = tfd * F.lit(k1 + 1.0) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / avgdl)
    )
    return idf * norm


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str = "qid",
    query_text_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
    df_counts: DataFrame | None = None,
    require_all_terms: bool = False,
) -> DataFrame:
    """Score every document that matches ≥1 term of each query (or ALL
    its distinct terms with ``require_all_terms=True`` — conjunctive/AND
    retrieval, applied as a post-aggregation filter on ``n_matched``
    against the broadcast per-query term count, so the plan shape is
    unchanged): ``(qid, id, n_matched, score)``.

    ``postings``/``stats``/``df_counts`` let a caller substitute PERSISTED
    index frames (see :mod:`dqx_spark.pipeline.text_index`) for the
    from-scratch corpus aggregations — the query plan below is identical
    either way, except that stored ``df_counts`` spare the corpus-sized
    term aggregation entirely (the point of persisting the index).

    Plan: corpus → postings (1 shuffle) → df counts (1 smaller shuffle);
    query terms broadcast into df counts (tiny ``(qid, term, idf)``),
    broadcast THAT into postings, then one ``(qid, id)`` aggregation whose
    score is a sorted left-fold over ≤ |query| contributions —
    deterministic summation order, so two engines computing the same
    doubles produce the same bits."""
    tf = postings if postings is not None else doc_term_frequencies(docs, id_col, text_col, lowercase)
    if stats is not None:
        st = stats.select(
            F.col("n_docs").cast("double").alias("__n"),
            F.col("avgdl").cast("double").alias("__avgdl"),
        )
    else:
        # avgdl as exact-long sum / count, NOT F.avg: integer sums are
        # order-independent, so the double is bit-identical however the
        # corpus is partitioned — and identical to the persisted-index
        # path, which derives it from stored (n_docs, sum_dl) partials
        toks = _toks(text_col, lowercase)
        st = docs.agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.coalesce(  # empty corpus: avgdl 0.0, not 0/0 (ANSI-safe)
                F.try_divide(
                    F.sum(F.size(toks)).cast("double"), F.count(F.lit(1)).cast("double")
                ),
                F.lit(0.0),
            ).alias("__avgdl"),
        )
    if df_counts is not None:
        dfc = df_counts.select("term", F.col("df_count").cast("bigint").alias("df_count"))
    else:
        dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    qt = query_terms(queries, query_id_col, query_text_col, lowercase)
    # tiny-side first: (qid, term, idf) — |queries|·|terms| rows at most
    qidf = (
        dfc.join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(st))
        .select(
            "qid",
            "term",
            bm25_idf(F.col("df_count"), F.col("__n")).alias("__idf"),
            "__avgdl",
        )
    )
    contrib = tf.join(F.broadcast(qidf), "term").select(
        "qid",
        "id",
        "term",
        _contrib(F.col("tf"), F.col("dl"), F.col("__idf"), F.col("__avgdl"), k1, b).alias("__c"),
    )
    # sorted fold: bounded array (≤ #query terms), deterministic order
    scored = contrib.groupBy("qid", "id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "__c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__c"],
        ).alias("score"),
    )
    if require_all_terms:
        qn = qt.groupBy("qid").agg(F.count(F.lit(1)).alias("__qn"))
        scored = (
            scored.join(F.broadcast(qn), "qid")
            .where(F.col("n_matched") == F.col("__qn"))
            .drop("__qn")
        )
    return scored


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    query_id_col: str = "qid",
    query_text_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    tie_rounding: int | None = None,
    num_salts: int = 32,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
    df_counts: DataFrame | None = None,
    require_all_terms: bool = False,
) -> DataFrame:
    """Top-k documents per query by BM25: ``(qid, rank, id, n_matched,
    score)``, rank 1-based by ``(score DESC, id ASC)``.

    ``tie_rounding`` ranks on ``round(score, n)`` instead of the raw
    double — the cross-engine-reproducible configuration (two engines'
    libm ``ln`` can differ in the last ulp; ranking on the rounded value
    with the id tiebreak makes the ORDER identical whenever the rounded
    values are, which is what the DuckDB gate twin pins).

    Top-k is ONE window per qid (r12 optimization): Spark 3.5+'s
    ``WindowGroupLimit`` pushdown applies a map-side partial top-k per
    (qid, input partition) BEFORE the exchange — each upstream task
    forwards at most ``k`` rows per query, so a hot query id funnels
    ``num_input_partitions · k`` slim rows to one task, exactly the bound
    the previous explicit salted pre-stage enforced, without its extra
    Exchange + two Sorts (interleaved A/B at sf0.1: corpus path median
    2.44 s -> 1.92 s, index-probe path 4.03 -> 3.72; output verified
    identical — same order spec, total order via the id tiebreak).

    The pushdown is gated by ``spark.sql.window.group.limit.threshold``
    (default 1000): for ``k`` ABOVE the session's threshold the rank
    filter would degrade to one full window partition per qid — the
    corpus-sized scored frame for a hot query id serialized through a
    single task.  r13 (ADVICE r12): in that case the explicit salted
    two-stage top-k is used instead — ``num_salts`` deterministic salts
    (``pmod(xxhash64(id))``) bound each first-stage partition, the second
    window merges the ≤ ``num_salts · k`` survivors per qid.  Same
    result (every global top-k row is in its salt's top-k), same
    per-task bound, independent of the session threshold."""
    scored = bm25_scores(
        docs, queries, id_col, text_col, query_id_col, query_text_col,
        k1, b, lowercase, postings=postings, stats=stats, df_counts=df_counts,
        require_all_terms=require_all_terms,
    )
    rank_score = F.round(F.col("score"), tie_rounding) if tie_rounding is not None else F.col("score")
    order = [rank_score.desc(), F.col("id").asc()]
    try:
        thr = int(scored.sparkSession.conf.get("spark.sql.window.group.limit.threshold", "1000"))
    except Exception:  # noqa: BLE001 — Connect / conf-less sessions: assume the default
        thr = 1000
    if k > thr and num_salts and num_salts > 1:
        # WindowGroupLimit will not fire for this k: bound the hot-qid
        # funnel explicitly with the pre-r12 salted two-stage top-k
        salt = F.pmod(F.xxhash64(F.col("id")), F.lit(int(num_salts)))
        w1 = Window.partitionBy("qid", "__dq_salt").orderBy(*order)
        scored = (
            scored.withColumn("__dq_salt", salt)
            .withColumn("__dq_r1", F.row_number().over(w1))
            .where(F.col("__dq_r1") <= k)
            .drop("__dq_salt", "__dq_r1")
        )
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "id", "n_matched", "score")
    )


def phrase_decontaminate(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str,
    text_col: str,
    phrase_id_col: str = "pid",
    phrase_col: str = "phrase",
    lowercase: bool = True,
    index=None,
) -> DataFrame:
    """Drop documents containing ANY eval phrase as an exact token
    sequence — the sentence-level decontamination pass (remove every
    training doc that quotes a benchmark item verbatim), complementing
    :func:`~dqx_spark.pipeline.mixing.decontaminate`'s n-gram-overlap
    fraction.  Returns the surviving rows of ``docs`` (original columns).

    Pass ``index=`` (a positional :class:`~dqx_spark.pipeline.text_index.
    TextIndex`) to answer the matches from postings instead of scanning
    the text — then only the anti-join touches the corpus.  The matched
    ids are slim (one column), so the anti-join shuffles ids only."""
    if index is not None:
        from dqx_spark.pipeline.text_index import phrase_match_index

        if bool(index.meta.get("lowercase", True)) != bool(lowercase):
            raise ValueError(
                "lowercase mismatch: the index was built with "
                f"lowercase={index.meta.get('lowercase', True)} but the call asks for "
                f"lowercase={lowercase} - the index path would silently answer with "
                "the index's folding; rebuild the index or drop index="
            )
        hits = phrase_match_index(
            index, phrases, phrase_id_col=phrase_id_col, phrase_col=phrase_col
        )
    else:
        hits = phrase_match(
            docs, phrases, id_col, text_col, phrase_id_col, phrase_col, lowercase
        )
    bad = hits.select(F.col("id").alias("__bad_id")).distinct()
    return docs.join(bad, docs[id_col] == F.col("__bad_id"), "left_anti")
