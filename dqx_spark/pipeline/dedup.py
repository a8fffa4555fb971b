"""Deduplication operators for training-data pipelines.

Six pair-detection families, each with an explicit 100 TB scale story:

* **exact** — md5-of-normalized-text (or column-set) hash, groupBy on the
  hash: one shuffle of (hash, id), map-side combine.
* **n-gram Jaccard** — explode distinct shingles, self-join on shingle,
  count-based exact Jaccard.  Skew-guarded by dropping shingles that occur
  in more than ``max_shingle_doc_freq`` documents (a hot shingle would
  otherwise quadratically explode the join).
* **winnowing** — window-minimum fingerprint selection (MOSS): ~2/(w+1)
  of the shingle hashes with a guaranteed floor (shared runs of
  >= w+k-1 tokens always collide) — the cheap long-overlap detector.
* **MinHash + LSH** — signature = array of k independent 64-bit hashes
  (xxhash64(shingle, seed)), built by explode + k min-aggregates (codegen'd,
  no UDF); banding hashes signature slices; candidate pairs only join
  within a band bucket.
* **SimHash** — 64-bit bit-majority of token hashes; Hamming-ball matching
  via band partitioning (pigeonhole: d bits differ => some band of d+1 is
  identical).
* **embedding cosine** — exact threshold join for small/verify paths; random
  hyperplane (sign-LSH) bucketing as the scale path.

Plus corpus REPAIR at every granularity (keep the canonical first
occurrence, rebuild the survivors): whole-document
(``drop_exact_duplicates``), paragraph (``dedup_paragraphs``), token span
(``remove_duplicate_spans`` — ExactSubstr), and group-level pruning with a
quality keeper (``remove_near_duplicates``).

All operators return DataFrames with deterministic columns; nothing
collects to the driver except the iteration counter in
``connected_components``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqx_spark.pipeline.text import (
    doc_fingerprint,
    exploded_shingle_hashes,
    portable_hash60,
    shingle_hash_array,
    tokens,
    winnowing_fingerprints,
)

__all__ = [
    "exact_duplicates",
    "drop_exact_duplicates",
    "dedup_paragraphs",
    "ngram_jaccard_pairs",
    "prefix_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "cross_corpus_lsh_pairs",
    "fuzzy_decontaminate",
    "simhash64",
    "simhash_duplicate_pairs",
    "hamming_pairs",
    "embedding_cosine_pairs",
    "embedding_cross_pairs",
    "embedding_decontaminate",
    "connected_components",
    "near_duplicate_groups",
    "keep_best_per_group",
    "remove_near_duplicates",
    "remove_duplicate_spans",
    "winnowing_pairs",
]

def _materialize(df: DataFrame, storage: str, eager: bool = False) -> DataFrame:
    """Materialization strategy for subplans consumed more than once.

    * ``'local'`` (default) — ``localCheckpoint``: fastest, but executor
      loss forfeits the data (single-node / interactive path).
    * ``'memory'`` / ``'disk'`` — ``persist`` MEMORY_AND_DISK / DISK_ONLY:
      recompute-safe on executor loss; the fault-tolerant cluster path.
    * ``'checkpoint'`` — reliable checkpoint to ``setCheckpointDir`` storage
      (survives executor AND lineage loss; for very long jobs).
    * ``'none'`` — no materialization: every consumer recomputes the
      lineage (correct, sometimes cheapest when the subplan is a scan).
    """
    if storage == "none":
        return df
    if storage == "local":
        return df.localCheckpoint(eager=eager)
    if storage == "checkpoint":
        return df.checkpoint(eager=eager)
    if storage in ("memory", "disk"):
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK if storage == "memory" else StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        return out
    raise ValueError(f"storage must be one of local/memory/disk/checkpoint/none, got {storage!r}")


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------
def exact_duplicates(df: DataFrame, id_col: str, text_col: str | None = None, columns: list[str] | None = None) -> DataFrame:
    """Annotate rows with ``dup_key`` (content hash), ``dup_count`` and
    ``is_duplicate``.  One shuffle on the hash; map-side combine on the
    pre-aggregation."""
    if (text_col is None) == (columns is None):
        raise ValueError("provide exactly one of text_col / columns")
    key = doc_fingerprint(text_col) if text_col else F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in columns]))
    with_key = df.withColumn("dup_key", key)
    counts = with_key.groupBy("dup_key").agg(F.count(F.lit(1)).alias("dup_count"))
    return with_key.join(counts, "dup_key", "left").withColumn("is_duplicate", F.col("dup_count") > 1)


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str | None = None, columns: list[str] | None = None) -> DataFrame:
    """Keep the lowest-id row per content hash.  groupBy(min_by) rather than
    a window: partial aggregation shrinks the shuffle to one row per key."""
    if (text_col is None) == (columns is None):
        raise ValueError("provide exactly one of text_col / columns")
    key = doc_fingerprint(text_col) if text_col else F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in columns]))
    with_key = df.withColumn("__dup_key", key)
    keep = with_key.groupBy("__dup_key").agg(F.min(F.col(id_col)).alias("__keep_id"))
    return (
        with_key.join(keep, "__dup_key", "inner")
        .where(F.col(id_col) == F.col("__keep_id"))
        .drop("__dup_key", "__keep_id")
    )


def _paragraphs(column: Column, sep_regex: str) -> Column:
    """Trimmed, non-empty paragraph array (the shared split expression —
    the explode pass and the rebuild pass MUST use the identical expression
    so paragraph indexes line up)."""
    raw = F.split(F.coalesce(column, F.lit("")), sep_regex)
    return F.filter(F.transform(raw, lambda p: F.trim(p)), lambda p: p != "")


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep_regex: str = r"\n\s*\n",
    join_sep: str = "\n\n",
    min_chars: int = 1,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """CORPUS-WIDE exact paragraph dedup (the C4 discipline, at paragraph
    granularity): every paragraph that occurs more than once anywhere in
    the corpus is kept only at its canonical first occurrence — the
    smallest ``(id, paragraph_index)`` — and removed everywhere else,
    including later repeats inside the same document.  Documents are
    reassembled with surviving paragraphs in their original order.

    Completes the line-repetition family: :func:`corpus.remove_repeated_lines`
    repairs WITHIN one document, :func:`corpus.remove_boilerplate_lines`
    removes lines by corpus doc-frequency; this keeps exactly ONE global
    copy of each duplicated paragraph.

    PRECONDITION: ``id_col`` values must be unique (as in
    :func:`drop_exact_duplicates`) — the per-document keep-index sets are
    keyed on the id, so rows sharing an id would merge their keep sets and
    keep unrelated paragraphs at coinciding indexes.  Run
    :func:`drop_exact_duplicates` or assign a surrogate id first when ids
    can repeat.

    Returns ``df``'s columns plus ``<text_col>_dedup`` and
    ``removed_paragraph_count``.

    Scale shape (100 TB): paragraphs never shuffle as strings — the explode
    emits ``(id, idx, hash)``; winners come from ``groupBy(hash).agg(min(
    struct(id, idx)))`` (map-side combined, and — unlike a
    ``row_number`` window over the hash — a paragraph duplicated across a
    billion documents is partial-aggregated, not collected into one task);
    the winner set IS the keep set, so no candidate re-join is needed.  The
    keep indexes fold back per document (one slim shuffle on id) and the
    rebuild filters the original paragraph array scan-locally.  Paragraphs
    shorter than ``min_chars`` are exempt (always kept).  Rows with a NULL
    ``id_col`` are unaddressable by the keep-set join and sit the dedup
    out: their text passes through unchanged and their paragraphs neither
    claim nor lose a canonical slot.

    ``hash_name='md5'`` uses the engine-portable 60-bit md5 derivation
    (:func:`dqx_spark.pipeline.text.portable_hash60`) so the output is
    bit-reproducible in DuckDB for conformance oracles; ``'xxhash64'`` is
    the hot path.

    Reference scope note: the reference engine has no corpus-repair
    operators; this extends its dedup surface (is_unique,
    check_funcs.py:1822) to training-data curation semantics.
    """
    paras = _paragraphs(F.col(text_col), sep_regex)
    hash_fn = portable_hash60 if hash_name == "md5" else F.xxhash64
    # NULL-id rows are unaddressable (the keep-set join-back keys on id, and
    # NULL never equi-joins), so they sit the dedup out entirely: their
    # paragraphs neither win nor get removed (r5 review: a NULL-id winner
    # would silently delete its paragraph from the whole corpus)
    ex = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.posexplode(paras).alias("idx", "p")
    ).where(F.length("p") >= min_chars)
    ex = ex.select("id", "idx", hash_fn(F.col("p")).alias("h"))
    winners = ex.groupBy("h").agg(F.min(F.struct("id", "idx")).alias("w"))
    kept = winners.select(F.col("w.id").alias("id"), F.col("w.idx").alias("idx"))
    per_doc = kept.groupBy("id").agg(F.collect_set("idx").alias("__keep_idxs"))
    joined = df.join(per_doc, df[id_col] == per_doc["id"], "left").drop(per_doc["id"])
    keep_idxs = F.coalesce(F.col("__keep_idxs"), F.array().cast("array<int>"))
    surviving = F.filter(
        paras, lambda p, i: (F.length(p) < min_chars) | F.array_contains(keep_idxs, i)
    )
    n_eligible = F.size(F.filter(paras, lambda p: F.length(p) >= min_chars))
    null_id = df[id_col].isNull()
    return joined.select(
        *[df[c] for c in df.columns],
        F.when(null_id, F.array_join(paras, join_sep))
        .otherwise(F.array_join(surviving, join_sep))
        .alias(f"{text_col}_dedup"),
        F.when(null_id, F.lit(0))
        .otherwise(n_eligible - F.size(keep_idxs))
        .alias("removed_paragraph_count"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_doc_freq: int | None = 1000,
    storage: str = "local",
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word k-gram shingle sets: (id_a, id_b, common,
    size_a, size_b, jaccard) for unordered pairs with jaccard >= threshold.

    Plan: per-doc distinct shingles -> explode -> self-join on shingle ->
    count per pair -> join back sizes.  ``max_shingle_doc_freq`` drops hot
    shingles before the join — the standard skew guard (a shingle shared by
    D docs contributes D² candidate pairs).

    Candidate-pair growth is QUADRATIC in duplicate density (every doc pair
    sharing a shingle is a candidate) — inherent to the *exact* variant;
    :func:`minhash_lsh_pairs` is the scale path.  ``max_candidate_pairs``
    is the loud-failure budget for that growth: when set, the upper bound
    ``sum over shingles of C(doc_freq, 2)`` is computed from the shingle
    doc-frequency aggregate (one extra small action, no self-join) and a
    :class:`~dqx_spark.errors.ComputationError` is raised if it exceeds the
    budget — instead of silently launching a join that explodes at scale.

    Shingles are 64-bit hashes from birth (``exploded_shingle_hashes`` —
    no shingle strings are ever built): every downstream shuffle/join keys
    on an 8-byte long instead of a ~30-byte string (64-bit collisions are
    negligible next to the threshold), which at 100 TB cuts the dominant
    shuffle's bytes several-fold."""
    # no .distinct() needed: shingle hashes are array_distinct'd per doc
    # before the explode, so (id, shingle) is already unique — one less
    # full shuffle.  The exploded set feeds FOUR consumers (sizes, the
    # skew filter, and both self-join sides); `storage` picks how the
    # tokenize+shingle scan is materialized once instead of re-running per
    # consumer — at cluster scale pass storage='disk' (fault-tolerant) or
    # 'none' (recompute): the exploded set is the same order of magnitude
    # as the corpus.
    sh = _materialize(
        exploded_shingle_hashes(df, id_col, text_col, k).withColumnRenamed("h", "shingle"),
        storage,
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_doc_freq is not None:
        freq_ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).where(F.col("df_") <= max_shingle_doc_freq)
        sh = sh.join(freq_ok.select("shingle"), "shingle", "inner")
    if max_candidate_pairs is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        bound_row = freq.agg(
            F.sum(F.col("df_") * (F.col("df_") - 1) / 2).cast("long").alias("bound")
        ).collect()[0]
        bound = bound_row["bound"] or 0
        if bound > max_candidate_pairs:
            from dqx_spark.errors import ComputationError  # noqa: PLC0415

            raise ComputationError(
                f"ngram_jaccard_pairs candidate-pair bound {bound:,} exceeds "
                f"max_candidate_pairs={max_candidate_pairs:,}; lower "
                f"max_shingle_doc_freq (currently {max_shingle_doc_freq}) or use "
                "minhash_lsh_pairs — exact pairwise Jaccard grows quadratically "
                "in duplicate density"
            )
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_doc_freq: int | None = 1000,
    storage: str = "local",
) -> DataFrame:
    """Exact Jaccard pairs — SAME output contract as
    :func:`ngram_jaccard_pairs` — via PREFIX FILTERING (AllPairs /
    PPJoin: Bayardo et al. WWW'07, Xiao et al. WWW'08), the exact-join
    scale path between the naive inverted-index self-join and the
    probabilistic :func:`minhash_lsh_pairs`.

    Why it scales where the naive join doesn't: with every document's
    shingles sorted by one GLOBAL rare-first order (ascending corpus doc
    frequency, shingle hash tiebreak), a pair with ``J ≥ t`` must share at
    least ``o = ceil(t·max(|a|,|b|))`` shingles (because ``J ≥ t`` forces
    ``min ≥ t·max``, hence ``common = J/(1+J)·(|a|+|b|) ≥ t·max``), and
    two sorted sets sharing ``o`` elements must collide within their first
    ``|x| − o + 1`` elements.  So only each document's PREFIX of
    ``p = |x| − ceil(t·|x|) + 1`` shingles is indexed — at ``t = 0.8``
    that is ~20 % of the postings, and candidate growth is driven by
    rare-shingle collisions instead of every shared shingle: the
    candidate set shrinks from ``Σ C(df, 2)`` over ALL shingles to the
    same sum over prefix postings of the RAREST shingles.  Verification
    then rejoins only the candidates against the full shingle sets, so
    the quadratic term never touches hot shingles at all.

    Float hygiene: the ``ceil(t·|x|)`` prefix bound and the ``min ≥
    t·max`` length filter are both evaluated with a 1e-9 slack in the
    SAFE direction (longer prefix, more candidates) so double rounding
    can only add candidates, never drop a true pair; the exact-Jaccard
    verify stage is what decides membership.  Equality with
    :func:`ngram_jaccard_pairs` at the same knobs is pinned by test and
    by the gate row's DuckDB from-scratch twin.

    Shuffles: shingle-grain doc-freq agg, id-grain window (rank within
    doc), prefix self-join on shingle, candidate-grain verify join —
    every one keyed on an 8-byte hash, none corpus-quadratic."""
    from pyspark.sql import Window as _W

    sh = _materialize(
        exploded_shingle_hashes(df, id_col, text_col, k).withColumnRenamed("h", "shingle"),
        storage,
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    if max_shingle_doc_freq is not None:
        freq = freq.where(F.col("df_") <= max_shingle_doc_freq)
        sh = sh.join(freq.select("shingle"), "shingle", "inner")
    # canonical rare-first order + per-doc position, one id-grain shuffle
    w = _W.partitionBy("id").orderBy(F.col("df_").asc(), F.col("shingle").asc())
    ranked = (
        sh.join(freq, "shingle")
        .select("id", "shingle", "df_")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(_W.partitionBy("id")))
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9)) + F.lit(1)
    prefix = ranked.where(F.col("pos") <= prefix_len).select("id", "shingle", "sz")
    a = prefix.select(F.col("id").alias("id_a"), "shingle", F.col("sz").alias("size_a"))
    b = prefix.select(F.col("id").alias("id_b"), "shingle", F.col("sz").alias("size_b"))
    cand = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.least("size_a", "size_b")
            >= F.lit(threshold) * F.greatest("size_a", "size_b") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    common = (
        cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _seed_hash(h: Column, i: int, hash_name: str) -> Column:
    """i-th hash function over the base shingle hash.  xxhash64(h, i) on the
    hot path; the md5 portable path re-hashes the decimal string
    ``'<h>:<i>'`` with :func:`portable_hash60` (DuckDB twin:
    ``md5(h::VARCHAR || ':' || i::VARCHAR)``)."""
    if hash_name == "md5":
        return portable_hash60(F.concat(h.cast("string"), F.lit(f":{i}")))
    return F.xxhash64(h, F.lit(i))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 5,
    hash_name: str = "xxhash64",
    keep_missing: bool = True,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    Shape: hash-explode shingles (``exploded_shingle_hashes`` — shingle
    strings never materialize; tokens hash once, shingles are hashes of
    token-hash slices) -> groupBy(id) with ``num_hashes`` min-aggregates
    over cheap long re-hashes -> assemble array.  Exploding keeps every
    expression codegen-able and each subtree evaluated exactly once; a
    single nested higher-order-function expression instead re-evaluates the
    shingle construction once per seed per row (64× — it benchmarked 300+ s
    for 5k docs vs ~1 s for this shape), because Catalyst does not CSE
    across lambda boundaries.  The k hash functions are ``xxhash64(h, i)``
    over the 8-byte base hash — text is scanned once, not k times.
    Shuffle = one compact (id, 64 longs) row per document, map-side
    combined.

    ``hash_name='md5'`` swaps both the shingle hash and the k seed hashes
    for the engine-portable 60-bit md5 derivation (see
    :func:`dqx_spark.pipeline.text.portable_hash60`), making the whole
    signature — and everything derived from it — reproducible in DuckDB for
    conformance oracles."""
    ex = exploded_shingle_hashes(df, id_col, text_col, shingle_k, hash_name=hash_name)
    aggs = [F.min(_seed_hash(F.col("h"), i, hash_name)).alias(f"m{i}") for i in range(num_hashes)]
    sig = ex.groupBy("id").agg(*aggs).select("id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"))
    if not keep_missing:
        # consumers that immediately drop null signatures (the incremental
        # probe path) skip the restore join below — it costs a full extra
        # broadcast-join stage chain (~0.4s of the sf0.1 probe, measured
        # r11) for rows they would filter right back out
        return sig
    # docs with no shingles (shorter than k tokens) drop out of the explode;
    # restore them with a null signature
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(sig, "id", "left")


def minhash_estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of equal signature positions."""
    eq = F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v).cast("double") / F.size(sig_a)


def _banded(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bucket) banding rows for an (id, sig) signature frame —
    the slim LSH shuffle unit (~24 bytes/row; the signature array itself
    never rides the banding shuffle)."""
    return sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.struct(
                    j.alias("band"),
                    F.xxhash64(F.slice(F.col("sig"), j * rows_per_band + 1, rows_per_band), j).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    storage: str = "local",
    hash_name: str = "xxhash64",
    verify_exact: bool = False,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, scored by estimated
    Jaccard: (id_a, id_b, est_jaccard), plus exact (common, size_a, size_b,
    jaccard) columns when ``verify_exact=True``.

    Plan: signature per doc (scan-local) -> explode (band_id, band_hash)
    WITHOUT the signature payload -> pair ids within a bucket (docs sharing
    >=1 band) -> dedupe pairs -> join the full signatures back for scoring.
    The banding shuffle therefore moves (id, band, bucket) = ~24 bytes/row
    instead of dragging the 64×8-byte signature array through it (the
    signature rejoins only for the far smaller candidate set).  The only
    full-data shuffle keys on band_hash; bucket sizes are bounded by
    collision probability, not data size.

    The signature subplan is shared by the banding branch and the two
    score joins; ``storage`` picks the materialization (default
    localCheckpoint — at cluster scale pass 'memory'/'disk' for the
    fault-tolerant persist of (id, 64 longs), tiny next to the corpus).
    For SMALL corpora (≲100k docs) ``storage='none'`` measures fastest —
    recomputing the cheap signature subplan beats checkpoint I/O — but it
    re-scans the corpus per consumer, which inverts at scale; the default
    optimizes for the 100 TB shape, not the benchmark table.

    ``verify_exact=True`` re-joins the candidate pairs against the real
    shingle-hash sets and filters on EXACT Jaccard >= threshold (the
    standard LSH candidate-then-verify discipline) instead of the signature
    estimate.  Cost is bounded by the candidate set, not the corpus: only
    candidate docs' shingles are rejoined.  Combined with
    ``hash_name='md5'`` the full output is deterministic given the hash and
    reproducible in DuckDB — the conformance-oracle configuration."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sigs = _materialize(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, hash_name=hash_name).where(
            F.col("sig").isNotNull()
        ),
        storage,
    )
    banded = _banded(sigs, bands, rows_per_band)
    left = banded.select("band", "bucket", F.col("id").alias("id_a"))
    right = banded.select("band", "bucket", F.col("id").alias("id_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = (
        cand.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn("est_jaccard", minhash_estimated_jaccard(F.col("sig_a"), F.col("sig_b")))
    )
    if not verify_exact:
        return scored.where(F.col("est_jaccard") >= threshold).select("id_a", "id_b", "est_jaccard")
    # exact verification: rejoin only the candidates against the true
    # shingle-hash sets; threshold applies to the exact Jaccard.  The
    # corpus is first semi-joined down to candidate docs (broadcast-sized:
    # ids appearing in >=1 candidate pair) and the shingle explode is
    # materialized ONCE — its three consumers (the size aggregate and both
    # sides of the common-count join) must not re-tokenize the corpus.
    est = _materialize(scored.select("id_a", "id_b", "est_jaccard"), storage)
    cand_ids = est.select(F.col("id_a").alias(id_col)).union(
        est.select(F.col("id_b").alias(id_col))
    ).distinct()
    # no broadcast hint: the candidate set is usually tiny (AQE broadcasts
    # it from the materialized stats) but CAN be corpus-sized under a
    # degenerate threshold, where a forced broadcast would kill the driver
    cand_docs = df.join(cand_ids, id_col, "left_semi")
    sh = _materialize(
        exploded_shingle_hashes(cand_docs, id_col, text_col, shingle_k, hash_name=hash_name)
        .withColumnRenamed("h", "shingle"),
        storage,
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        est.select("id_a", "id_b")
        .join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        est.join(common, ["id_a", "id_b"], "inner")
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "est_jaccard", "common", "size_a", "size_b", "jaccard")


def cross_corpus_lsh_pairs(
    df: DataFrame,
    other: DataFrame,
    id_col: str,
    text_col: str,
    other_id_col: str | None = None,
    other_text_col: str | None = None,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    storage: str = "local",
    hash_name: str = "xxhash64",
    verify_exact: bool = False,
    broadcast: bool = True,
) -> DataFrame:
    """Near-duplicate pairs BETWEEN two corpora — the fuzzy-decontamination
    primitive: ``(id_a, id_b, est_jaccard)`` where ``id_a`` is from ``df``
    (train) and ``id_b`` from ``other`` (eval/held-out), plus exact
    ``(common, size_a, size_b, jaccard)`` columns when ``verify_exact=True``.

    Same banding discipline as :func:`minhash_lsh_pairs` (slices of one
    MinHash signature hashed to band buckets; only bucket collisions become
    candidates) but the bucket join is ACROSS corpora, so within-corpus
    duplicates are never paired or scored.  With ``broadcast=True``
    (default) the other side's banding rows — ``|other| × bands`` ~24-byte
    rows — broadcast, so a 100 TB train side pays only its own scan-local
    signature pass plus a map-side hash join: no train-side banding
    shuffle at all.  Pass ``broadcast=False`` when both corpora are large
    (e.g. cross-snapshot overlap); the join then shuffles both sides on
    (band, bucket).

    Complements :func:`dqx_spark.pipeline.mixing.ngram_contamination`
    (exact n-gram overlap): that catches verbatim inclusion; this catches
    whole-document near-copies whose edits dodge fixed n-grams.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    other_id_col = other_id_col or id_col
    other_text_col = other_text_col or text_col
    rows_per_band = num_hashes // bands
    sigs_a = _materialize(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, hash_name=hash_name).where(
            F.col("sig").isNotNull()
        ),
        storage,
    )
    sigs_b = _materialize(
        minhash_signatures(
            other, other_id_col, other_text_col, num_hashes, shingle_k, hash_name=hash_name
        ).where(F.col("sig").isNotNull()),
        storage,
    )
    ba = _banded(sigs_a, bands, rows_per_band).select("band", "bucket", F.col("id").alias("id_a"))
    bb = _banded(sigs_b, bands, rows_per_band).select("band", "bucket", F.col("id").alias("id_b"))
    cand = (
        ba.join(F.broadcast(bb) if broadcast else bb, ["band", "bucket"])
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = (
        cand.join(sigs_a.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs_b.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn("est_jaccard", minhash_estimated_jaccard(F.col("sig_a"), F.col("sig_b")))
    )
    if not verify_exact:
        return scored.where(F.col("est_jaccard") >= threshold).select("id_a", "id_b", "est_jaccard")
    # exact verification against the true shingle sets, candidate-bounded
    # exactly as in minhash_lsh_pairs but with per-side shingle frames
    est = _materialize(scored.select("id_a", "id_b", "est_jaccard"), storage)
    docs_a = df.join(est.select(F.col("id_a").alias(id_col)).distinct(), id_col, "left_semi")
    docs_b = other.join(
        est.select(F.col("id_b").alias(other_id_col)).distinct(), other_id_col, "left_semi"
    )
    sh_a = _materialize(
        exploded_shingle_hashes(docs_a, id_col, text_col, shingle_k, hash_name=hash_name)
        .withColumnRenamed("h", "shingle"),
        storage,
    )
    sh_b = _materialize(
        exploded_shingle_hashes(docs_b, other_id_col, other_text_col, shingle_k, hash_name=hash_name)
        .withColumnRenamed("h", "shingle"),
        storage,
    )
    sizes_a = sh_a.groupBy("id").agg(F.count(F.lit(1)).alias("size_a"))
    sizes_b = sh_b.groupBy("id").agg(F.count(F.lit(1)).alias("size_b"))
    common = (
        est.select("id_a", "id_b")
        .join(sh_a.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh_b.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        est.join(common, ["id_a", "id_b"], "inner")
        .join(sizes_a.select(F.col("id").alias("id_a"), "size_a"), "id_a")
        .join(sizes_b.select(F.col("id").alias("id_b"), "size_b"), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "est_jaccard", "common", "size_a", "size_b", "jaccard")


def fuzzy_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    **kwargs,
) -> DataFrame:
    """Drop training documents that are whole-document near-copies of any
    eval document (MinHash-LSH candidates, Jaccard >= ``threshold``) —
    the fuzzy counterpart of :func:`dqx_spark.pipeline.mixing.decontaminate`.
    Extra kwargs flow to :func:`cross_corpus_lsh_pairs` (``verify_exact=
    True`` for exact-Jaccard thresholds, ``bands``/``num_hashes`` for the
    recall/cost trade).  Returns the surviving rows of ``df`` unchanged;
    the anti-join keys on the (tiny) contaminated-id set."""
    pairs = cross_corpus_lsh_pairs(df, eval_df, id_col, text_col, threshold=threshold, **kwargs)
    bad = pairs.select(F.col("id_a").alias("__bad_id")).distinct()
    return df.join(bad, df[id_col] == F.col("__bad_id"), "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def _sim_bits(hash_name: str) -> int:
    """SimHash width per hash primitive: 64 for xxhash64; 60 for the
    portable md5 path (portable_hash60 yields 60 meaningful bits)."""
    return 60 if hash_name == "md5" else 64


def simhash64(df: DataFrame, id_col: str, text_col: str, hash_name: str = "xxhash64") -> DataFrame:
    """(id, sh) SimHash per document: bit b of the result is the majority
    vote of bit b across distinct-token hash values (64-bit xxhash64 by
    default; 60-bit engine-portable md5 derivation with
    ``hash_name='md5'`` — see :func:`~dqx_spark.pipeline.text.portable_hash60`).

    Shape: explode distinct tokens -> per-bit sum-aggregates per id ->
    majority -> assemble (same explode-don't-nest rationale as
    ``minhash_signatures``)."""
    nbits = _sim_bits(hash_name)
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    t = F.col("t")
    token_hash = portable_hash60(t) if hash_name == "md5" else F.xxhash64(t)
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("t")).withColumn("h", token_hash)
    aggs = [F.sum(F.getbit(F.col("h"), F.lit(b)).cast("int")).alias(f"b{b}") for b in range(nbits)] + [
        F.count(F.lit(1)).alias("n")
    ]
    per_doc = ex.groupBy("id").agg(*aggs)
    sh = F.lit(0).cast("long")
    for b in range(nbits - 1, -1, -1):
        bit = F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1)).otherwise(F.lit(0)).cast("long")
        sh = F.shiftleft(sh, 1).bitwiseOR(bit)
    sig = per_doc.select("id", sh.alias("sh"))
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(sig, "id", "left")


def simhash_duplicate_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, hash_name: str = "xxhash64"
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming distance <= max_hamming.

    Pigeonhole banding via :func:`hamming_pairs` over :func:`simhash64`
    signatures.  ``hash_name='md5'`` makes the whole output
    DuckDB-reproducible (60-bit signatures, 15-bit bands at the default
    max_hamming=3)."""
    sh = simhash64(df, id_col, text_col, hash_name=hash_name)
    return hamming_pairs(sh, "id", "sh", max_hamming=max_hamming, nbits=_sim_bits(hash_name))


def _hamming_banded(
    df: DataFrame, id_col: str, sig_col: str, max_hamming: int, nbits: int
) -> DataFrame:
    """(id, sh, band, bucket) pigeonhole-band rows for an integer-signature
    frame — the ONE copy of the band-slice expressions, shared by
    :func:`hamming_pairs` and the persisted simhash state in
    :mod:`~dqx_spark.pipeline.dedup_index` (the stored buckets and the
    probe-time buckets must be the same function or incremental candidate
    discovery silently diverges from the full-corpus run)."""
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    if not 1 <= nbits <= 64:
        raise ValueError(f"nbits must be in [1, 64], got {nbits}")
    n_bands = max_hamming + 1
    width = nbits // n_bands
    if width < 1:
        raise ValueError(f"max_hamming={max_hamming} needs more than {nbits} signature bits")
    # (1 << 64) - 1 overflows a Java long; a full-width band needs no mask
    # (all-ones == -1 in two's complement works too, but skip the AND)
    full_band = width >= 64
    sh = df.select(F.col(id_col).alias("id"), F.col(sig_col).cast("long").alias("sh")).where(
        F.col("sh").isNotNull()
    )
    return sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        (
                            F.col("sh")
                            if full_band
                            else F.shiftrightunsigned(F.col("sh"), j * width).bitwiseAND(
                                F.lit((1 << width) - 1)
                            )
                        ).alias("bucket"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def hamming_pairs(
    df: DataFrame, id_col: str, sig_col: str, max_hamming: int = 3, nbits: int = 64
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of PRE-COMPUTED ``nbits``-wide integer
    signatures within ``max_hamming`` — the banding core shared by
    :func:`simhash_duplicate_pairs` (text) and perceptual image hashes
    (``multimodal.image_ahash``), or any other fingerprint that measures
    similarity in Hamming space.

    Pigeonhole banding: split the signature bits into (max_hamming + 1)
    bands; any pair within the Hamming ball agrees exactly on >= 1 band, so
    candidates only join within identical band values — no quadratic
    blowup.  ``max_hamming=0`` degenerates to exact-signature grouping
    (one full-width band).  Null signatures are excluded."""
    banded = _hamming_banded(df, id_col, sig_col, max_hamming, nbits)
    left = banded.select("band", "bucket", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    right = banded.select("band", "bucket", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    hamming = F.bit_count(xor)
    return cand.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# embedding cosine
# ---------------------------------------------------------------------------
def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    num_planes: int | None = 8,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    Scale path (default): sign-LSH — bucket by the sign pattern of dot
    products against ``num_planes`` deterministic pseudo-random hyperplanes,
    then exact-verify within buckets.  ``num_planes=None`` forces the exact
    O(n²) self-join (verification / oracle path); 0 is rejected rather than
    silently degenerating to that path."""
    _check_num_planes(num_planes)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec"))
    if num_planes is not None:
        bucket = _hyperplane_bucket(F.col("vec"), num_planes, seed)
        base = base.withColumn("bucket", bucket)
        left = base.select("bucket", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        right = base.select("bucket", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        cand = left.join(right, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    else:
        left = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        right = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        cand = left.crossJoin(right).where(F.col("id_a") < F.col("id_b"))
    out = cand.withColumn("cosine", _cosine(F.col("vec_a"), F.col("vec_b")))
    return out.where(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def embedding_cross_pairs(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    threshold: float = 0.9,
    num_planes: int | None = 8,
    seed: int = 42,
) -> DataFrame:
    """(corpus_id, eval_id, cosine) pairs across two corpora with cosine >=
    threshold — the SemDeDup-style embedding contamination primitive
    (:func:`embedding_cosine_pairs`'s cross-corpus counterpart, the same
    role :func:`cross_corpus_lsh_pairs` plays for MinHash).

    Scale path (default): sign-LSH bucket BOTH sides with the shared
    deterministic hyperplanes, BROADCAST the (small) eval side, equi-join
    on bucket, exact-verify cosine within candidates — the corpus is one
    projected scan, never shuffled.  A true near-pair is missed only when
    some plane separates it (probability falls with similarity; the recall
    floor is test-pinned).  ``num_planes=None`` forces the exact broadcast
    crossJoin — eval sides are benchmark suites (thousands of rows), so
    even the exact path stays a broadcast, O(|corpus|·|eval|) dot products
    with no shuffle; it is also the correctness-gate twin path."""
    _check_num_planes(num_planes)
    ev_id = eval_id_col or id_col
    ev_vec = eval_vec_col or vec_col
    left = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).cast("array<double>").alias("vec_a"))
    right = eval_df.select(F.col(ev_id).alias("eval_id"), F.col(ev_vec).cast("array<double>").alias("vec_b"))
    if num_planes is not None:
        left = left.withColumn("bucket", _hyperplane_bucket(F.col("vec_a"), num_planes, seed))
        right = right.withColumn("bucket", _hyperplane_bucket(F.col("vec_b"), num_planes, seed))
        cand = left.join(F.broadcast(right), ["bucket"]).drop("bucket")
    else:
        cand = left.crossJoin(F.broadcast(right))
    out = cand.withColumn("cosine", _cosine(F.col("vec_a"), F.col("vec_b")))
    return out.where(F.col("cosine") >= threshold).select("corpus_id", "eval_id", "cosine")


def embedding_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    threshold: float = 0.9,
    num_planes: int | None = 8,
    seed: int = 42,
) -> DataFrame:
    """Drop corpus rows whose embedding is within ``threshold`` cosine of
    ANY eval row — :func:`mixing.decontaminate`'s semantic counterpart
    (n-gram overlap catches verbatim leakage; embedding cosine catches
    paraphrased eval material).  Returns the surviving rows of ``corpus``
    (original columns); one left-anti broadcast join, no corpus shuffle."""
    hits = embedding_cross_pairs(
        corpus, eval_df, id_col, vec_col, eval_id_col, eval_vec_col,
        threshold=threshold, num_planes=num_planes, seed=seed,
    ).select(F.col("corpus_id").alias("__hit_id")).distinct()
    return corpus.join(
        F.broadcast(hits), corpus[id_col] == F.col("__hit_id"), "left_anti"
    )


def _check_num_planes(num_planes: int | None) -> None:
    """None means "exact path" by contract; 0 would silently mean the same
    under truthiness (and would build a degenerate descending ``sequence(0,
    -1)`` plane list under ``is not None``), so reject it loudly instead."""
    if num_planes is not None and num_planes < 1:
        raise ValueError(
            "num_planes must be >= 1, or None for the exact (no-LSH) path; "
            f"got {num_planes!r}"
        )


def _hyperplane_bucket(vec: Column, num_planes: int, seed: int) -> Column:
    """Sign pattern against deterministic hyperplanes.  Plane p's component d
    is a hash-derived value in [-1, 1) — fully JVM-side, no numpy needed, and
    reproducible across runs/engines.

    pmod, NOT %: Spark's % keeps xxhash64's sign, which would shift the
    component range to [-3, 1) (mean -1) — for non-negative embeddings
    (ReLU/TF-IDF) every plane dot would then be negative and the whole
    corpus would collapse into one bucket, degenerating the LSH to its
    O(n²) escape hatch (r4 review finding)."""
    def plane_dot(p: Column) -> Column:
        products = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda v, d: v * (F.pmod(F.xxhash64(p, d, F.lit(seed)), F.lit(10000)).cast("double") / 5000.0 - 1.0),
        )
        return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)

    bits = F.transform(F.sequence(F.lit(0), F.lit(num_planes - 1)), lambda p: F.when(plane_dot(p) >= 0, 1).otherwise(0))
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)


# ---------------------------------------------------------------------------
# grouping
# ---------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    max_iterations: int = 20,
    storage: str = "local",
) -> DataFrame:
    """Union duplicate pairs into groups: (id, group_id) where group_id is
    the minimum id reachable through the pair graph.

    Iterative label propagation (alternating large-star min-join); each
    iteration is two distributed joins, the driver only checks convergence
    via a count — the standard Spark connected-components shape for dedup
    graphs (pair sets are sparse).  ``storage`` picks how edges and the
    per-iteration labels are materialized (iteration REQUIRES materializing
    — lineage doubles per pass otherwise): default localCheckpoint; pass
    'memory'/'disk'/'checkpoint' on a fault-tolerant cluster run."""
    if storage == "none":
        raise ValueError("connected_components requires materialization; use local/memory/disk/checkpoint")
    edges = _materialize(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct(),
        # materialize once: every iteration joins edges twice, and without
        # this the full (possibly LSH) pair-generation lineage re-executes
        # 2× per iteration
        storage,
        eager=True,
    )
    labels = _materialize(
        ids.select(F.col(id_col).alias("id"), F.col(id_col).alias("group_id")), storage, eager=True
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"], "inner")
            .groupBy("src")
            .agg(F.min("group_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                F.col("id"),
                F.least(F.col("group_id"), F.coalesce(F.col("nbr_min"), F.col("group_id"))).alias("group_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .where(F.col("n.group_id") != F.col("o.group_id"))
            .limit(1)
            .count()
        )
        prev = labels
        labels = _materialize(new_labels, storage, eager=True)  # truncate lineage per iteration
        if storage in ("memory", "disk"):
            prev.unpersist()
        if changed == 0:
            break
    else:
        # exhausted without converging: labels are correct but chains longer
        # than max_iterations are still split into multiple groups — never
        # return that silently (r4 review)
        import warnings  # noqa: PLC0415

        warnings.warn(
            f"connected_components did not converge within {max_iterations} iterations; "
            "long duplicate chains may be split — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def near_duplicate_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    method: str = "minhash",
    threshold: float = 0.5,
    **kwargs,
) -> DataFrame:
    """End-to-end: find near-dup pairs by the chosen method, union into
    groups, return (id, group_id); group representatives are min ids.
    ``method='embedding'`` treats ``text_col`` as an ``array<float/double>``
    embedding column (sign-LSH bucketed cosine pairs); ``'winnow'`` groups
    by shared winnowing fingerprints (``threshold`` does not apply — pass
    ``min_common`` instead)."""
    if method == "minhash":
        pairs = minhash_lsh_pairs(df, id_col, text_col, threshold=threshold, **kwargs)
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(df, id_col, text_col, threshold=threshold, **kwargs)
    elif method == "simhash":
        pairs = simhash_duplicate_pairs(df, id_col, text_col, **kwargs)
    elif method == "embedding":
        pairs = embedding_cosine_pairs(df, id_col, text_col, threshold=threshold, **kwargs)
    elif method == "winnow":
        pairs = winnowing_pairs(df, id_col, text_col, **kwargs)
    else:
        raise ValueError(f"unknown method {method!r}")
    return connected_components(pairs, df.select(F.col(id_col).alias("id")))


def keeper_pick(id_col: str, keep_col: str | None) -> Column:
    """The ``min()``-able struct implementing the shared keeper policy
    (:func:`keep_best_per_group`, :func:`~dqx_spark.pipeline.web.
    dedup_by_url`): smallest id, or — with a numeric ``keep_col`` —
    highest value first (nulls lose), ties to the smallest id.  The
    keeper id is the struct's ``kid`` field."""
    if keep_col is None:
        return F.struct(F.col(id_col).alias("kid"))
    q = F.col(keep_col).cast("double")
    return F.struct(
        F.when(q.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("nf"),
        F.coalesce(-q, F.lit(0.0)).alias("negq"),
        F.col(id_col).alias("kid"),
    )


def keep_best_per_group(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    keep_col: str | None = None,
    kept_col: str = "kept",
) -> DataFrame:
    """Pick one canonical keeper per duplicate group and flag every row.

    ``groups`` is a ``(id, group_id)`` frame as returned by
    :func:`connected_components` / :func:`near_duplicate_groups`.  Returns
    ``df``'s columns plus ``group_id``, ``keeper_id`` and a boolean
    ``kept_col`` (true exactly for the keeper row of each group).

    Keeper policy: with ``keep_col=None`` the keeper is the group
    representative itself (the minimum id — zero extra work, the label IS
    the keeper).  With a numeric ``keep_col`` the keeper is the row with
    the HIGHEST value (nulls lose to any non-null), ties broken by the
    smallest id — the SemDeDup-style "keep the best document of each
    semantic cluster" discipline when ``keep_col`` is a quality score.

    Scale shape (100 TB): the keeper choice is ``min(struct(null_flag,
    -quality, id))`` per group — map-side-combined aggregation over three
    slim columns, never a window sort over member rows — and the join-back
    ships only ``(group_id, keeper_id)``.

    Reference scope note: the reference engine stops at ``is_unique``
    violation reporting (dataset checks); group-keeper selection extends
    its dedup surface for corpus curation.
    """
    joined = df.join(groups.withColumnRenamed("id", id_col), id_col, "inner")
    if keep_col is None:
        out = joined.withColumn("keeper_id", F.col("group_id"))
    else:
        keepers = (
            joined.groupBy("group_id")
            .agg(F.min(keeper_pick(id_col, keep_col)).alias("__k"))
            .select("group_id", F.col("__k.kid").alias("keeper_id"))
        )
        out = joined.join(keepers, "group_id")
    return out.withColumn(kept_col, F.col(id_col) == F.col("keeper_id"))


def remove_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    method: str = "minhash",
    threshold: float = 0.5,
    keep_col: str | None = None,
    **kwargs,
) -> DataFrame:
    """Prune the corpus to one document per near-duplicate group.

    The end of the dedup funnel: pairs (:func:`minhash_lsh_pairs` /
    ``ngram`` / ``simhash`` / ``embedding`` — same ``method`` contract as
    :func:`near_duplicate_groups`) -> connected components -> keeper per
    group (see :func:`keep_best_per_group`; ``keep_col`` keeps the
    highest-quality member instead of the smallest id) -> surviving rows.
    With ``method='embedding'`` and a quality ``keep_col`` this is the
    SemDeDup recipe: cluster semantically-duplicate documents by embedding
    cosine and keep the best of each cluster.

    Returns ``df``'s columns plus ``group_id`` (singleton documents keep
    their own id as the group).
    """
    groups = near_duplicate_groups(df, id_col, text_col, method=method, threshold=threshold, **kwargs)
    flagged = keep_best_per_group(df, id_col, groups, keep_col=keep_col)
    return flagged.where(F.col("kept")).drop("kept", "keeper_id")


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """CORPUS-WIDE exact-substring dedup at token granularity (the
    ExactSubstr discipline of Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): every k-token span that occurs more
    than once anywhere in the corpus survives only at its canonical first
    occurrence — the smallest ``(id, position)`` — and is cut everywhere
    else, including later repeats inside the same document.  Finer than
    :func:`dedup_paragraphs` (no paragraph boundary needed), stricter
    than MinHash (exact token equality, case-sensitive).

    Canonical occurrences are PROTECTED: positions covered by a span's
    winning occurrence are never cut, even when they also fall inside the
    cut window of a DIFFERENT span's losing occurrence (overlapping spans
    in the same document) — so every duplicated span provably survives
    intact somewhere.  The flip side: a losing occurrence that overlaps a
    winner in the same document is only partially removed.

    Returns ``df``'s columns plus ``<text_col>_dedup`` (surviving tokens
    re-joined with single spaces — token-granular rebuild normalizes
    whitespace, same convention as :func:`~dqx_spark.pipeline.text.
    chunk_by_tokens`) and ``removed_token_count``.  Spans shorter than
    ``k`` tokens are by definition not detected; ``k=50`` is the Lee et
    al. operating point.

    PRECONDITION: ``id_col`` values must be unique (see
    :func:`dedup_paragraphs`).  Rows with a NULL id sit the dedup out:
    their text passes through unchanged and their spans neither claim nor
    lose a canonical slot.

    Scale shape (100 TB): the one big shuffle is the occurrence stream —
    ``(id, position, span_hash)`` for every token position, ~16 bytes a
    token; span strings never shuffle (xxhash64 over token-hash slices,
    same CSE-guarded two-projection shape as
    :func:`~dqx_spark.pipeline.text.exploded_shingle_hashes`).  Winners
    come from one ``groupBy(hash)`` min-struct aggregation (map-side
    combined, skew-immune); only the LOSING occurrences' start positions
    shuffle back per document (``collect_set`` — bounded by duplicated
    positions, not corpus size), and the k-wide cut windows are expanded
    scan-locally from those starts, so the k× blow-up never crosses the
    network.  The rebuild filters the original token array in place.

    ``hash_name='md5'`` is the engine-portable conformance mode
    (:func:`~dqx_spark.pipeline.text.portable_hash60` over the span
    string) for bit-exact DuckDB oracles; ``'xxhash64'`` is the hot path.

    Reference scope note: the reference engine has no corpus-repair
    operators (see :func:`dedup_paragraphs`); this completes the dedup
    granularity ladder: document -> paragraph -> token span.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # occurrence stream (id, p, sh), p 0-based; the per-position hash array
    # (and its CollapseProject CSE guard) comes from the one shared builder.
    # lowercase=False: exact-substring equality is case-sensitive.
    occ = (
        shingle_hash_array(df, id_col, text_col, k=k, lowercase=False, hash_name=hash_name)
        .where(F.col("id").isNotNull())
        .select("id", F.posexplode(F.col("hs")).alias("p", "sh"))
    )
    winners = occ.groupBy("sh").agg(
        F.count(F.lit(1)).alias("__c"),
        F.min(F.struct(F.col("id").alias("d"), F.col("p").alias("q"))).alias("__w"),
    ).where(F.col("__c") > 1)
    losing = (
        occ.join(winners, "sh")
        .where(~((F.col("id") == F.col("__w.d")) & (F.col("p") == F.col("__w.q"))))
        .select("id", "p", F.lit(False).alias("win"))
    )
    # the winner struct IS the (id, position) of the protected occurrence —
    # no join back to the occurrence stream needed; one union + one
    # aggregate + ONE join-back of df (not one per start kind)
    winning = winners.select(F.col("__w.d").alias("id"), F.col("__w.q").alias("p"), F.lit(True).alias("win"))
    starts = (
        losing.unionByName(winning)
        .groupBy("id")
        .agg(
            F.collect_set(F.when(~F.col("win"), F.col("p"))).alias("__rs"),
            F.collect_set(F.when(F.col("win"), F.col("p"))).alias("__ws"),
        )
    )
    joined = df.join(starts.withColumnRenamed("id", id_col), id_col, "left")
    rebuilt = joined.withColumn("__toks", tokens(F.col(text_col)))
    n = F.size(F.col("__toks"))

    def expand(col: str) -> Column:
        return F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce(F.col(col), F.array().cast("array<int>")),
                    lambda s: F.sequence(s, s + (k - 1)),
                )
            )
        )

    # cut = losing windows minus canonical-occurrence windows (protection)
    rm_pos = F.array_except(expand("__rs"), expand("__ws"))
    all_pos = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))
    kept_pos = F.array_sort(F.array_except(all_pos, rm_pos))
    kept_toks = F.transform(kept_pos, lambda i: F.element_at(F.col("__toks"), i + 1))
    return (
        rebuilt.withColumn(f"{text_col}_dedup", F.array_join(kept_toks, " "))
        .withColumn("removed_token_count", (n - F.size(kept_pos)).cast("int"))
        .drop("__rs", "__ws", "__toks")
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_common: int = 1,
    max_fingerprint_doc_freq: int | None = 1000,
    storage: str = "local",
    hash_name: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, common, size_a, size_b): unordered document pairs
    sharing at least ``min_common`` winnowing fingerprints (see
    :func:`~dqx_spark.pipeline.text.winnowing_fingerprints`).

    The sixth pair-detection family, between :func:`ngram_jaccard_pairs`
    (every shingle shuffles, exact Jaccard) and :func:`minhash_lsh_pairs`
    (probabilistic banding): winnowing keeps ~``2/(w+1)`` of the shingle
    hashes yet GUARANTEES any shared token run of >= ``w + k - 1`` tokens
    produces a common fingerprint — detection of long verbatim overlaps
    with a provable floor, at a fraction of the shuffle.  ``common``
    counts shared selected fingerprints (a sparse sample, NOT the exact
    shingle intersection — use the ngram family when the exact Jaccard
    matters).  Same hot-fingerprint skew guard as the shingle join
    (``max_fingerprint_doc_freq``).
    """
    fp = _materialize(
        winnowing_fingerprints(df, id_col, text_col, k=k, w=w, hash_name=hash_name),
        storage,
    )
    sizes = fp.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_fingerprint_doc_freq is not None:
        ok = fp.groupBy("h").agg(F.count(F.lit(1)).alias("df_")).where(
            F.col("df_") <= max_fingerprint_doc_freq
        )
        fp = fp.join(ok.select("h"), "h", "inner")
    left = fp.select(F.col("h"), F.col("id").alias("id_a"))
    right = fp.select(F.col("h"), F.col("id").alias("id_b"))
    common = (
        left.join(right, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
        .select("id_a", "id_b", "common", "size_a", "size_b")
    )
