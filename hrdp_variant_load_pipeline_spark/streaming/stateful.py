"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference pipeline is batch-only (finite VCF files,
HrdpVariants.java:94-115); these are the engine's streaming extensions for
continuous ingest of the same shapes — watermarked tumbling aggregation
(see queries_ml.streaming_tumbling_counts) and arbitrary per-key state
below. State lives in the HDFS-backed state store, partitioned by key, so
the operator scales horizontally like any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_window_stats(
    df: DataFrame,
    key_col: str = "user_id",
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Per-key gap-based session windows via the built-in
    ``session_window`` — the streaming-native counterpart of the batch
    ``events_sessionize`` query (lag-over-window sessionization cannot run
    on a stream; session windows merge in the state store as events
    arrive and EMIT when the watermark passes a session's gap).

    Works identically on batch and streaming inputs (the batch run is the
    oracle for the streaming one — pinned in
    ``tests/test_streaming_batch_equivalence.py``). State per open session
    is bounded by the watermark horizon, so continuous ingest runs
    forever; the shuffle is keyed on (key, session), the same partitioning
    any aggregation would need.

    Output: (key, session_start, session_end, n_events).
    """
    from pyspark.sql import functions as F

    src = df
    if watermark is not None and df.isStreaming:
        src = df.withWatermark(event_time_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(event_time_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained in group state.

    Arbitrary-stateful shape the built-in windowed aggs can't express
    (e.g. carrying model state, decaying counters, per-key quotas). Input:
    streaming DataFrame with (user_id, value). Output one row per updated
    key per micro-batch.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup: first event per key wins, duplicates within
    the watermark horizon are dropped.

    The streaming counterpart of ``operators.dedup.exact`` for
    at-least-once sources (replayed files, redelivered messages):
    ``dropDuplicatesWithinWatermark`` keys the state store on ``keys`` and
    expires entries once the watermark passes, so state is bounded by the
    duplicate-arrival horizon instead of growing with the stream — the
    property that makes this runnable forever at ingest scale.

    Semantics note: the watermark advances AFTER each micro-batch, so a
    duplicate in the same batch that jumps event time forward is still
    dropped against the old state; only events arriving after that batch
    see the expired state and are readmitted as fresh keys.
    """
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    item_col: str,
    k: int = 32,
    n_buckets: int = 16,
) -> DataFrame:
    """Approximate top items over an unbounded stream in BOUNDED state:
    Misra–Gries summaries (≤ ``k`` counters each) kept per hash bucket in
    the state store.

    Exact top-k over a stream needs state proportional to the distinct-
    item count — unbounded. Misra–Gries keeps at most ``k`` counters:
    increment a tracked item, start tracking into a free slot, else
    decrement ALL counters (evicting zeros). Guarantees per bucket:
    ``true − k ≤ est ≤ true`` where the undercount is at most
    ``n_bucket / (k+1)``, and any item with frequency above that bound is
    guaranteed present. With items hash-partitioned over ``n_buckets``
    (each item deterministically in ONE bucket — summaries never have to
    merge across buckets), the stream parallelizes like any keyed agg and
    total state is ``n_buckets × k`` counters, forever.

    Output (update mode): one row per (bucket, item) still tracked after
    each micro-batch — (bucket, item, est_count, n_bucket). Take the
    latest row per item and order by est_count for the top list.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n_seen = {}, 0
        for pdf in batches:
            for item in pdf[item_col]:
                n_seen += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all: evict zeroed counters
                    counters = {
                        it: c - 1 for it, c in counters.items() if c > 1
                    }
        state.update((list(counters), [int(c) for c in counters.values()], n_seen))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(counters),
                "item": list(counters),
                "est_count": [int(c) for c in counters.values()],
                "n_bucket": [n_seen] * len(counters),
            }
        )

    # item cast to string up front: the output/state schemas declare
    # string, and an int64 pandas series would fail Arrow serialization
    bucketed = stream.withColumn(
        item_col, F.col(item_col).cast("string")
    ).withColumn("bucket", F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets)))
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket long, item string, est_count long, n_bucket long",
        stateStructType="items array<string>, counts array<long>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_bottom_k_sample(
    stream: DataFrame,
    id_col: str,
    k: int = 64,
    n_buckets: int = 8,
    salt: str = "bk",
) -> DataFrame:
    """Deterministic uniform sample of an unbounded stream in bounded
    state: per hash bucket, keep the ``k`` ids with the SMALLEST
    ``md5(salt||id)`` values (a bottom-k sketch).

    Since the hash is a fixed uniform function of the id — no RNG, no
    arrival-order dependence — the kept set equals the batch expression
    ``ORDER BY md5(salt||id) LIMIT k`` over everything seen so far:
    replays, re-partitioning, and batch/stream disagreement are
    impossible by construction. The union of buckets is a uniform
    without-replacement sample of size ``n_buckets × k``, and the k-th
    smallest hash doubles as a cardinality estimate
    (``(k-1) / kth_hash_unit`` per bucket — summed across buckets).

    Output (update mode): one row per kept id per micro-batch —
    (bucket, id, hash_unit, n_seen). State: ``n_buckets × k`` rows,
    forever.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        if state.exists:
            ids, hashes, n_seen = state.get
            kept = dict(zip(ids, hashes))
        else:
            kept, n_seen = {}, 0
        for pdf in batches:
            for sid in pdf["__sid"]:
                n_seen += 1
                if sid in kept:
                    continue
                h = int.from_bytes(
                    hashlib.md5((salt + sid).encode()).digest()[:8], "big"
                ) / float(2**64)
                if len(kept) < k:
                    kept[sid] = h
                else:
                    worst = max(kept, key=kept.get)
                    if h < kept[worst]:
                        del kept[worst]
                        kept[sid] = h
        state.update((list(kept), [float(h) for h in kept.values()], n_seen))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(kept),
                "id": list(kept),
                "hash_unit": [float(h) for h in kept.values()],
                "n_seen": [n_seen] * len(kept),
            }
        )

    bucketed = stream.select(
        F.col(id_col).cast("string").alias("__sid")
    ).withColumn("bucket", F.pmod(F.xxhash64(F.col("__sid")), F.lit(n_buckets)))
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket long, id string, hash_unit double, n_seen long",
        stateStructType="ids array<string>, hashes array<double>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quantiles_from_sample(
    sample: DataFrame, value_col: str, qs: list[float]
) -> list[float]:
    """Quantile estimates from a uniform sample — the consumer side of
    ``streaming_bottom_k_sample`` (join the kept ids back to their rows,
    or carry the value through the sketch): because the sketch's kept set
    is a provably uniform without-replacement sample, order statistics of
    the sample estimate the stream's quantiles with the standard
    sampling error (±O(1/sqrt(sample_size)) in rank). Driver-side sort of
    a sample-sized list."""
    vals = sorted(
        r[0] for r in sample.select(F.col(value_col).cast("double")).collect()
        if r[0] is not None
    )
    if not vals:
        return [float("nan")] * len(qs)
    out = []
    for q in qs:
        i = min(len(vals) - 1, max(0, int(round(q * (len(vals) - 1)))))
        out.append(vals[i])
    return out
