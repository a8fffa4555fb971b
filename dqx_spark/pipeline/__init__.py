"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, and multimodal column plumbing.

These extend the reference's DQ surface (SURVEY.md §7.1 step 9) with the
operations a 100 TB LLM-data pipeline needs.  Everything is DataFrame-first:
JVM-side Column expressions where possible, Arrow-batched pandas UDFs only
where vector math genuinely needs numpy.
"""

from dqx_spark.pipeline import (  # noqa: F401
    corpus,
    dedup,
    dedup_index,
    diagnostics,
    features,
    joins,
    mixing,
    multimodal,
    packing,
    pii,
    retrieval,
    rollup,
    sessions,
    similarity,
    sketches,
    text,
    text_index,
    web,
)
