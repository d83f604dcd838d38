"""Streaming incremental LSH dedup: candidate duplicate pairs emitted as
documents ARRIVE, against per-bucket state.

The streaming twin of ``operators.dedup.minhash_lsh_pairs`` /
``incremental_lsh_pairs``: the same md5-min signatures and (band, hash)
bucketing, but the bucket membership lives in ``applyInPandasWithState``
GroupState instead of a parquet signature store, so a duplicate of any
previously-seen document surfaces within one micro-batch.

Signatures are computed ROW-LOCALLY (``array_min`` over the per-shingle
hashes) rather than by the batch path's explode + groupBy-min: the values
are identical (min over the same set, pinned by the parity test), and it
keeps the streaming query to ONE stateful operator.

Semantics vs the batch DF-cut (deliberate, documented divergence): batch
drops an over-``MAX_BUCKET_DOCS`` bucket entirely — it can see the final
size up front. A retraction-free stream cannot un-emit pairs, so a bucket
that reaches the cap SATURATES: its state stops growing and no further
pairs are emitted from it (each saturation is logged per batch via the
emitted row's ``saturated`` flag being observable in state — the durable
batch path, ``incremental_lsh_pairs``, remains the authority). Per-bucket
state is therefore bounded by the cap; bucket COUNT grows with the corpus,
so production runs either TTL quiescent buckets (timeout below) or
periodically compact state into the parquet signature store and restart.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.expressions import word_shingles_expr
from ..operators.dedup import MAX_BUCKET_DOCS, N_MINHASH

PAIR_SCHEMA = "doc_a long, doc_b long"
STATE_SCHEMA = "ids array<long>, saturated boolean"

# Evict a bucket untouched for this long; a late duplicate landing in an
# evicted bucket is missed by the stream (the batch path catches it).
QUIESCENT_EVICT_MS = 10 * 60 * 1000


def banded_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> one row per (band, h) bucket key, with the
    signature computed row-locally so the only stateful operator in the
    streaming query is the dedup itself."""
    shingles = word_shingles_expr(F.col("text"))

    def _mh(i: int):
        # close over i via an outer function: a 2-param transform lambda
        # (even `lambda sh, _i=i:`) receives (element, index) and the
        # default silently becomes the index Column (CLAUDE.md trap #7)
        return F.array_min(
            F.transform(
                shingles, lambda sh: F.md5(F.concat(F.lit(f"{i}:"), sh))
            )
        ).alias(f"mh{i}")

    mh = [_mh(i) for i in range(N_MINHASH)]
    sigs = docs.where(F.size(shingles) > 0).select("doc_id", *mh)
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"mh{i}").alias("h"))
                for i in range(N_MINHASH)
            ])
        ).alias("b"),
    ).select(F.col("b.band").alias("band"), F.col("b.h").alias("h"), "doc_id")


def _dedup_fn(
    key: Tuple[int, str],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per (band, h) bucket: emit (doc_a < doc_b) pairs between newly seen
    docs and everything seen before (plus among the new docs), then fold
    the new docs into state. Saturated buckets emit nothing further."""
    if state.hasTimedOut:
        state.remove()
        return

    if state.exists:
        ids, saturated = state.get
        ids = list(ids)
    else:
        ids, saturated = [], False

    incoming = sorted(
        {int(d) for pdf in batches for d in pdf["doc_id"]} - set(ids)
    )
    pairs = []
    if not saturated:
        for new in incoming:
            if len(ids) >= MAX_BUCKET_DOCS:
                saturated = True
                break
            pairs.extend(
                (min(old, new), max(old, new)) for old in ids
            )
            ids.append(new)

    state.update((sorted(ids), saturated))
    state.setTimeoutDuration(QUIESCENT_EVICT_MS)
    if pairs:
        yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])


def dedup_pairs_stream(doc_stream: DataFrame) -> DataFrame:
    """(doc_id, text) stream -> append-mode candidate duplicate pairs.
    Distinct-per-bucket is handled in state; the same pair surfacing from
    two bands is possible (exactly as in the batch path before its
    ``.distinct()``) — downstream consumers dedupe on write or key their
    sink by (doc_a, doc_b)."""
    return banded_buckets(doc_stream).groupBy("band", "h").applyInPandasWithState(
        _dedup_fn,
        outputStructType=PAIR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
