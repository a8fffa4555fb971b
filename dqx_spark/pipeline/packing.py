"""Sequence packing for pretraining pipelines: map documents to fixed-size
token sequences.

Two standard strategies:

* **concat-and-chunk** (:func:`pack_offsets`) — documents are laid out
  back-to-back in a deterministic order and the stream is cut every
  ``max_tokens``; documents may straddle a cut (exactly how GPT-style
  pretraining batches are formed).  This is a pure window cumulative sum.

* **greedy no-split** (:func:`pack_greedy`) — documents are placed in order
  into the current bin until the next one would overflow, then a new bin
  starts; documents never straddle bins (instruction-tuning style).  The
  recurrence (running total resets at overflow) is prefix-dependent, so it
  runs as ``applyInPandas`` per shard — a linear scan, not a window.

Scale story: a single global ordering would serialize 100 TB through one
partition's window.  Both operators therefore pack **per shard** (an
explicit column, or a deterministic ``id % num_shards``); shards pack
independently and in parallel, which is also what real pipelines do (one
output file per shard).  The only shuffle is the repartition-by-shard; the
cumsum/scan happens inside each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["pack_offsets", "pack_greedy"]


def _with_shard(df: DataFrame, id_col: str, shard_col: str | None, num_shards: int):
    if shard_col is not None:
        return df, F.col(shard_col)
    return df, (F.col(id_col) % F.lit(num_shards)).cast("long")


def pack_offsets(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    shard_col: str | None = None,
    num_shards: int = 16,
) -> DataFrame:
    """Concat-and-chunk layout: (id, shard, n_tokens, offset, first_seq,
    last_seq) where ``offset`` is the document's start position in its
    shard's token stream (ordered by id) and ``first_seq``/``last_seq`` are
    the fixed-size sequences it lands in (inclusive; a doc straddles
    ``last_seq - first_seq`` cuts).

    Empty documents get ``first_seq = last_seq = offset // max_tokens`` (the
    sequence they would start in).  One shuffle (by shard) + an in-partition
    running sum; no driver actions.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    df, shard = _with_shard(df, id_col, shard_col, num_shards)
    t = F.col(tokens_col).cast("long")
    w = Window.partitionBy("shard").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    # DIV, not `/`: float division loses exactness past 2^53 total tokens
    # per shard, which a 100 TB corpus can reach
    return (
        df.select(F.col(id_col).alias("id"), shard.alias("shard"), t.alias("n_tokens"))
        .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("first_seq", F.expr(f"offset DIV {int(max_tokens)}"))
        .withColumn(
            "last_seq",
            F.expr(f"greatest(offset + n_tokens - 1, offset) DIV {int(max_tokens)}"),
        )
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    shard_col: str | None = None,
    num_shards: int = 16,
) -> DataFrame:
    """Greedy no-split packing: (id, shard, n_tokens, bin) — documents are
    scanned in id order per shard; each goes into the current bin unless it
    would push the bin over ``max_tokens``, which starts a new bin.  A
    document larger than ``max_tokens`` gets a bin of its own (and the next
    document starts fresh).

    Bin ids are dense per shard starting at 0.  The reset-on-overflow
    recurrence is inherently sequential, so each shard is scanned once in
    ``applyInPandas`` — shards pack in parallel, the scan is O(shard size).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    df, shard = _with_shard(df, id_col, shard_col, num_shards)
    slim = df.select(F.col(id_col).alias("id"), shard.alias("shard"), F.col(tokens_col).cast("long").alias("n_tokens"))

    schema = StructType(
        [
            StructField("id", slim.schema["id"].dataType),
            StructField("shard", slim.schema["shard"].dataType),
            StructField("n_tokens", LongType()),
            StructField("bin", LongType()),
        ]
    )

    def assign(pdf):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins = []
        current, used = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t) if t == t else 0  # NaN -> 0
            if used > 0 and used + t > max_tokens:
                current += 1
                used = 0
            bins.append(current)
            used += t
        pdf["bin"] = bins
        return pdf

    return slim.groupBy("shard").applyInPandas(assign, schema)
