"""Structured Streaming validation.

The reference is batch-only; this applies the broadcast fitted model to a
stream: violations via the same Arrow batch routing inside foreachBatch /
mapInPandas, plus watermarked windowed verdict aggregation for late data.
Smoke-tested with the file source + memory sink (synchronous
``processAllAvailable``), which is the standard local harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_violations(engine, stream_df: DataFrame,
                      id_cols: list[str] | None = None) -> DataFrame:
    """Violation stream: the same prefilter + mapInPandas plan works
    unchanged on a streaming DataFrame (stateless transforms)."""
    return engine.predict(stream_df, id_cols=id_cols)


def windowed_verdicts(engine, stream_df: DataFrame, ts_col: str,
                      window: str = "5 minutes",
                      watermark: str = "10 minutes",
                      id_cols: list[str] | None = None) -> DataFrame:
    """Per-event-time-window violation counts with a watermark for late
    rows.  Join-free: violations carry the timestamp through predict."""
    id_cols = list(dict.fromkeys([ts_col] + (id_cols or [])))
    viols = engine.predict(stream_df, id_cols=id_cols)
    return (viols
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_violations"))


def run_stream_to_memory(sdf: DataFrame, query_name: str):
    """Drive a (bounded) stream to completion into a memory sink."""
    q = (sdf.writeStream.outputMode("append")
         .format("memory").queryName(query_name)
         .trigger(availableNow=True)
         .start())
    q.processAllAvailable()
    q.stop()
    return q
