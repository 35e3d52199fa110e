"""Watermarked stream-stream joins — the enrichment shape for continuous
event pipelines (click attribution, request/response pairing, variant
batch ↔ QC result matching).

The reference pipeline is batch-only (finite VCF files,
``HrdpVariants.java:94-115``); this is the engine's streaming extension
for joining two UNBOUNDED inputs. Spark buffers both sides in the keyed
state store; the time-range predicate plus both watermarks let it PURGE
state older than the horizon, so the join runs forever in bounded memory
— without the range bound, stream-stream state grows without limit.

The same function composes batch DataFrames unchanged (watermarks are
skipped; the join is an ordinary range join), which is what the
batch-equivalence tests pin: on a finite input, streamed output ==
batch output, row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str = "ts",
    right_time: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
    right_suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join each left event to the right events of the same key whose time
    falls in ``(left_time - lookback, left_time]`` — e.g. purchases (left)
    attributed to the clicks (right) that preceded them.

    Scale shape: the join shuffles both sides on ``key_col`` (the same
    exchange any keyed operation needs); per-key state is bounded by
    ``lookback + watermark`` of event-time, enforced by the state store's
    watermark purge. Emission for inner matches is immediate; with
    ``how="left_outer"`` an UNMATCHED left row emits (right columns null)
    only once the watermark passes its join horizon — the stream cannot
    know "no click will ever arrive" any earlier, so outer results trail
    live data by the watermark delay by construction.

    Right-side columns (except the key) come back suffixed with
    ``right_suffix``. Works identically on batch frames (no watermark).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    lw = left.withWatermark(left_time, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_time, watermark)
        if right.isStreaming
        else right
    )
    l = lw.alias("l")
    r = rw.select(
        F.col(key_col),
        *[
            F.col(c).alias(f"{c}{right_suffix}")
            for c in right.columns
            if c != key_col
        ],
    ).alias("r")
    rt = f"{right_time}{right_suffix}"
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(rt) > F.col(f"l.{left_time}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(rt) <= F.col(f"l.{left_time}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{key_col}"))
