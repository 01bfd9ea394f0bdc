"""Event-time windowed aggregation with watermarks (beyond-reference:
the blockchain pipelines have no late data — SURVEY §2.7 — but a
training-data / telemetry pipeline does, so the engine carries the
standard Structured Streaming shape for it).

``tumbling_window_agg`` builds the same logical plan for a batch or a
streaming DataFrame (``F.window`` works on both); on a stream, pass
``watermark`` so state for closed windows is dropped — unbounded state
is the thing that kills a 100 TB streaming job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: dict[str, Column],
    extra_keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Aggregate per tumbling event-time window (+ ``extra_keys``).

    Output keys: ``window_start``/``window_end`` (timestamps) + the
    extra keys; one column per ``aggs`` entry.  With ``watermark`` set
    (streaming), append-mode emits a window only once its end passes
    the watermark — late rows inside the allowed delay still land in
    their window, older ones are dropped.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    out = (
        src.groupBy(F.window(F.col(ts_col), window_duration), *extra_keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *extra_keys,
            *aggs.keys(),
        )
    )
    return out


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap_duration: str,
    aggs: dict[str, Column],
    extra_keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Aggregate per event-time SESSION window (dynamic-length windows
    that close after ``gap_duration`` of per-key silence) — Spark's
    native ``session_window``, identical plan for batch and streaming.

    On a stream, pass ``watermark`` so a session's state is evicted once
    the watermark passes its close; without eviction, per-key session
    state grows forever.  Session merge semantics: an event extends a
    session if it lands within ``gap_duration`` of the previous event
    INCLUSIVE (an exact-gap event merges — adjacent windows coalesce),
    i.e. a new session starts only when ``ts - prev_ts > gap``; the same
    rule as the batch ``operators/sessionize`` gaps-and-islands form,
    pinned against it in tests.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    out = (
        src.groupBy(F.session_window(F.col(ts_col), gap_duration), *extra_keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *extra_keys,
            *aggs.keys(),
        )
    )
    return out
