"""Persisted inverted index for BM25 retrieval — query 100 TB of already-
indexed text without ever re-scanning the corpus.

:mod:`~dqx_spark.pipeline.retrieval` is corpus-at-once: right for a
one-time audit, wrong for a crawl pipeline that wants to probe the corpus
hourly.  This module persists the three frames a BM25 query needs —
postings, per-term document frequencies, and corpus length stats — in the
same layout discipline as the dedup/ANN index families
(bucket-partitioned parquet + an underscore-hidden sidecar + the versioned
store wrapper), so a query costs:

* a PARTITION-PRUNED postings scan: postings are laid out by
  ``pb = pmod(xxhash64(term), partitions)``; ``prune='static'`` collects
  the query terms' distinct ``pb`` set (≤ #query terms values, one tiny
  job over the query frame) and pushes a literal ``isin`` — guaranteed
  ``PartitionFilters``, so the scan reads only the buckets that can hold
  a query term, independent of corpus size;
* a partition-pruned probe of the ``terms/`` df-count frame the same way
  (vocabulary-sized, not corpus-sized, but why scan any of it);
* driver-side arithmetic over the ``stats/`` partials (a handful of rows).

**Mergeability is exact.**  Every stored quantity is an integer count:
appends write a NEW df-count partial and a NEW (n_docs, sum_dl) stats row
instead of rewriting anything, and readers SUM the partials — long sums
are order-independent, so a query through an index built from N appends
is bit-identical to one built corpus-at-once (pinned by test), the same
incremental == at-once guarantee the dedup ledger gives.

**Layout** (all under ``path/``):

========== ===========================================================
postings/  (id, dl, term, tf) partitioned by ``pb``; append adds files
terms/     (term, df_count) PARTIALS, partitioned by ``pb``; reader
           sums per term — never rewritten by append
stats/     (n_docs, sum_dl) one row per save/append; reader sums
_text_meta sidecar: lowercase / partitions / family tag — the commit
           point (written LAST on save; compaction's pointer gate)
========== ===========================================================

Appends are not transactional across the three subdirs (parquet append
semantics) — a crash mid-append can leave postings without their terms
partial.  Run appends through the versioned store + streaming sink
cadence (:func:`init_text_store`, ``streaming.text_index_sink``) for the
pointer-flip crash discipline, exactly as the sibling families do.

Reference: databrickslabs/dqx has no retrieval or index surface; this
extends the engine for training-data curation at crawl scale.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqx_spark.pipeline import retrieval
from dqx_spark.pipeline._fsutil import hadoop_path_exists

__all__ = [
    "TextIndex",
    "save_text_index",
    "load_text_index",
    "append_to_text_index",
    "bm25_topk_index",
    "text_index_stats",
    "compact_text_index",
    "init_text_store",
    "current_text_store_version",
    "compact_text_store",
]

_META_SUBDIR = "_text_meta"


def _pb(col, partitions: int):
    return F.pmod(F.xxhash64(col), F.lit(partitions)).cast("int")


def _write_meta(spark, path: str, meta: dict) -> None:
    spark.createDataFrame([(json.dumps(meta),)], "value string").coalesce(1).write.mode(
        "overwrite"
    ).text(path.rstrip("/") + "/" + _META_SUBDIR)


@dataclass
class TextIndex:
    """Handle over a loaded index.  Reads are served from the frames
    captured at load time — mutations through :func:`append_to_text_index`
    are observed by RE-loading (or by passing ``handle=`` to the append,
    which auto-invalidates), the same freshness contract as the LSH/dedup
    handles."""

    path: str
    meta: dict
    postings: DataFrame
    terms: DataFrame  # partials, NOT yet aggregated
    stats_rows: DataFrame
    _stale: bool = field(default=False, repr=False)

    def df_counts(self) -> DataFrame:
        """Per-term document frequency: SUM over the stored partials."""
        return self.terms.groupBy("term").agg(F.sum("df_count").alias("df_count"))

    def stats(self) -> DataFrame:
        """1-row (n_docs, avgdl) with avgdl = Σsum_dl / Σn_docs — exact
        long sums, so bit-identical to the corpus-at-once derivation."""
        return self.stats_rows.agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(  # empty index: avgdl 0.0, not 0/0 (ANSI-safe)
                F.try_divide(F.sum("sum_dl").cast("double"), F.sum("n_docs").cast("double")),
                F.lit(0.0),
            ).alias("avgdl"),
        )


def _frames(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool, partitions: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    tf = retrieval.doc_term_frequencies(df, id_col, text_col, lowercase)
    postings = tf.withColumn("pb", _pb(F.col("term"), partitions))
    terms = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .withColumn("pb", _pb(F.col("term"), partitions))
    )
    toks = retrieval._toks(text_col, lowercase)
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("long").alias("sum_dl"),
    )
    return postings, terms, stats


def save_text_index(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    *,
    lowercase: bool = True,
    partitions: int = 64,
    mode: str = "overwrite",
) -> None:
    """Build and persist the inverted index for ``df``.  ``df.limit(0)``
    seeds an EMPTY index (crawl start) — empty layouts are first-class.

    The sidecar is written LAST: its presence is the save's commit point
    (and the versioned store's completeness probe)."""
    r = path.rstrip("/")
    postings, terms, stats = _frames(df, id_col, text_col, lowercase, partitions)
    postings.write.mode(mode).partitionBy("pb").parquet(r + "/postings")
    terms.write.mode(mode).partitionBy("pb").parquet(r + "/terms")
    stats.write.mode(mode).parquet(r + "/stats")
    _write_meta(
        df.sparkSession,
        r,
        {"family": "text", "lowercase": lowercase, "partitions": partitions,
         "id_col": id_col, "text_col": text_col},
    )


def _empty_layout(spark, path: str) -> bool:
    """True when ``path`` is absent or holds no data files (a
    ``partitionBy`` of zero rows leaves only ``_SUCCESS``) — the
    structural probe the empty-seed fallback keys on; routed on the
    Hadoop FS API, never on exception-message text."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return True
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            return False
    return True


def _read_sub(spark, path: str, schema_ddl: str) -> DataFrame:
    """Read a subdir; an EMPTY layout (empty-seed saves write zero data
    files under a partitioned dir) reads as a typed empty frame.  Any
    failure over a non-empty layout re-raises — corrupt is not empty."""
    try:
        return spark.read.parquet(path)
    except Exception:
        if _empty_layout(spark, path):
            return spark.createDataFrame([], schema_ddl)
        raise


def load_text_index(spark, path: str) -> TextIndex:
    r = path.rstrip("/")
    if not hadoop_path_exists(spark, r + "/" + _META_SUBDIR):
        raise ValueError(f"{path!r} is not a text index (no {_META_SUBDIR} sidecar)")
    meta = json.loads(spark.read.text(r + "/" + _META_SUBDIR).collect()[0]["value"])
    postings = _read_sub(spark, r + "/postings", "id long, dl int, term string, tf long, pb int")
    terms = _read_sub(spark, r + "/terms", "term string, df_count long, pb int")
    stats = _read_sub(spark, r + "/stats", "n_docs long, sum_dl long")
    return TextIndex(path=r, meta=meta, postings=postings, terms=terms, stats_rows=stats)


def append_to_text_index(
    path: str,
    new_docs: DataFrame,
    *,
    handle: TextIndex | None = None,
) -> None:
    """Onboard a new batch: append its postings, ONE new df-count partial,
    and ONE new stats row — nothing existing is rewritten, and the only
    shuffles are batch-sized (the batch's own term aggregation).

    Caller contract: ids must be NEW (appends are blind; route replays
    away upstream or dedup ids before the append — same contract as the
    sibling index appends).  ``handle=`` reuses a loaded handle's meta and
    marks it stale afterwards (the freshness discipline from the LSH
    family); a mismatched handle path refuses loudly."""
    spark = new_docs.sparkSession
    r = path.rstrip("/")
    if handle is not None:
        if handle.path != r:
            raise ValueError(f"handle is for {handle.path!r}, not {path!r}")
        meta = handle.meta
    else:
        meta = json.loads(spark.read.text(r + "/" + _META_SUBDIR).collect()[0]["value"])
    postings, terms, stats = _frames(
        new_docs, meta["id_col"], meta["text_col"], meta["lowercase"], meta["partitions"]
    )
    postings.write.mode("append").partitionBy("pb").parquet(r + "/postings")
    terms.write.mode("append").partitionBy("pb").parquet(r + "/terms")
    stats.write.mode("append").parquet(r + "/stats")
    if handle is not None:
        handle._stale = True


def _pruned(frame: DataFrame, pbs: list[int] | None) -> DataFrame:
    if pbs is None:
        return frame
    return frame.where(F.col("pb").isin(pbs))


def bm25_topk_index(
    index: TextIndex,
    queries: DataFrame,
    k: int = 10,
    *,
    query_id_col: str = "qid",
    query_text_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
    tie_rounding: int | None = None,
    num_salts: int = 32,
    prune: str = "static",
) -> DataFrame:
    """Top-k BM25 over the PERSISTED index — the corpus is never
    re-tokenized and, with ``prune='static'`` (default), never fully
    scanned: the query terms' ``pb`` buckets are collected (one tiny job
    over the query frame) and pushed as literal ``PartitionFilters`` into
    both the postings and terms scans.  ``prune='none'`` skips the
    driver-side collect (full melt scan; one SQL execution end-to-end).

    Same formula, same deterministic sorted-fold score, same two-stage
    top-k as :func:`~dqx_spark.pipeline.retrieval.bm25_topk` — bit-equal
    to the corpus-at-once path by the store's exact-merge contract."""
    if prune not in ("static", "none"):
        raise ValueError(f"prune must be 'static' or 'none', got {prune!r}")
    lowercase = index.meta["lowercase"]
    partitions = index.meta["partitions"]
    pbs: list[int] | None = None
    if prune == "static":
        qt = retrieval.query_terms(queries, query_id_col, query_text_col, lowercase)
        pbs = [
            row["pb"]
            for row in qt.select(_pb(F.col("term"), partitions).alias("pb")).distinct().collect()
        ]
    return retrieval.bm25_topk(
        docs=None,
        queries=queries,
        id_col="id",
        text_col="",
        k=k,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        k1=k1,
        b=b,
        lowercase=lowercase,
        tie_rounding=tie_rounding,
        num_salts=num_salts,
        postings=_pruned(index.postings, pbs).drop("pb"),
        stats=index.stats(),
        df_counts=_pruned(index.terms, pbs)
        .groupBy("term")
        .agg(F.sum("df_count").alias("df_count")),
    )


def _files_per_partition(spark, sub: str) -> float | None:
    """Mean data files per ``pb=N`` partition dir — the footer-open cost a
    pruned probe pays per bucket; the metric
    ``similarity.recommend_index_maintenance`` keys 'compact' on."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(sub)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    n_parts = 0
    n_files = 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith("pb="):
            continue
        n_parts += 1
        n_files += sum(
            1
            for f in fs.listStatus(st.getPath())
            if not f.getPath().getName().startswith(("_", "."))
        )
    if n_parts == 0:
        return None
    return round(n_files / n_parts, 2)


def text_index_stats(index: TextIndex) -> dict:
    """Maintenance-facing shape: partial-file debt is what compaction pays
    down (every append adds a terms partial and a stats row; readers sum
    them, so probe latency grows with append count until a compact).
    ``files_per_partition`` (the worse of postings/terms) feeds the shared
    :func:`~dqx_spark.pipeline.similarity.recommend_index_maintenance`
    policy directly — text has no tombstones and no fittable bucket
    layout, so 'compact' is the only actionable verdict here."""
    spark = index.postings.sparkSession
    fpp = [
        v
        for v in (
            _files_per_partition(spark, index.path + "/postings"),
            _files_per_partition(spark, index.path + "/terms"),
        )
        if v is not None
    ]
    n_stats_rows = index.stats_rows.count()
    agg = index.stats_rows.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("nd"),
        F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sd"),
    ).collect()[0]
    n_term_partials = index.terms.count()
    n_terms = index.terms.select("term").distinct().count()
    return {
        "family": "text",
        "method": "text",
        "n_docs": int(agg["nd"]),
        "sum_dl": int(agg["sd"]),
        "rows": index.postings.count(),
        "n_terms": int(n_terms),
        "term_partial_rows": int(n_term_partials),
        "stats_rows": int(n_stats_rows),
        "appends_since_compact": max(0, int(n_stats_rows) - 1),
        "files_per_partition": max(fpp) if fpp else None,
        "partitions": index.meta["partitions"],
        "path": index.path,
    }


def compact_text_index(spark, src: str, dst: str, *, max_records_per_file: int = 1_000_000) -> None:
    """Rewrite ``src`` into ``dst`` with the partials MERGED (one df-count
    row per term, one stats row) and postings re-laid-out — bit-equal
    query results by the exact-integer-merge contract.  Writes to a NEW
    path by design (Spark cannot atomically overwrite a dir it reads);
    the versioned store wrapper handles 'which is current'."""
    idx = load_text_index(spark, src)
    r = dst.rstrip("/")
    w = idx.postings.repartition("pb").write.mode("overwrite")
    w.option("maxRecordsPerFile", max_records_per_file).partitionBy("pb").parquet(r + "/postings")
    idx.df_counts().withColumn("pb", _pb(F.col("term"), idx.meta["partitions"])).write.mode(
        "overwrite"
    ).partitionBy("pb").parquet(r + "/terms")
    idx.stats_rows.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("sum_dl"), F.lit(0)).cast("long").alias("sum_dl"),
    ).write.mode("overwrite").parquet(r + "/stats")
    _write_meta(spark, r, idx.meta)


def init_text_store(df: DataFrame, root: str, id_col: str, text_col: str, **save_kwargs) -> str:
    """Versioned store: save the seed corpus (``df.limit(0)`` for an
    empty crawl start) into ``root/v0`` and point ``_current`` at it."""
    from dqx_spark.pipeline import _store

    v0 = root.rstrip("/") + "/v0"
    save_text_index(df, v0, id_col, text_col, **save_kwargs)
    _store.write_pointer(df.sparkSession, root, "v0")
    return v0


def current_text_store_version(spark, root: str) -> str:
    from dqx_spark.pipeline import _store

    try:
        return _store.current_version(spark, root, _META_SUBDIR)
    except ValueError:
        raise ValueError(
            f"{root!r} holds no complete text-index version (did init_text_store run?)"
        ) from None


def compact_text_store(spark, root: str, *, max_records_per_file: int = 1_000_000) -> str:
    """Compact the current version into a fresh one and flip the pointer —
    pointer flipped only AFTER the dst sidecar landed (crash mid-compact
    leaves the old version current; the partial dst is never adopted)."""
    from dqx_spark.pipeline import _store

    cur = current_text_store_version(spark, root)
    dst = _store.next_version_path(spark, root)
    compact_text_index(spark, cur, dst, max_records_per_file=max_records_per_file)
    _store.write_pointer(spark, root, dst.rsplit("/", 1)[1])
    return dst
