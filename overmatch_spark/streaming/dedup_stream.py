"""Streaming exact dedup (§2.8 extension): the streaming analog of
operators.dedup.exact_dedup.

Rule: keep the FIRST arrival of each content hash; later arrivals
(within the watermark horizon) are dropped. This is the ingest-time
form of exact dedup a training-data pipeline runs on a document
firehose — duplicates are dropped before they are ever stored, with
bounded state.

Two forms with aligned semantics:
  - `dedup_batch`: first-arrival-wins over a static table (window
    rank on arrival order) — the backfill form and the equality
    oracle for the stream.
  - `dedup_stream`: `dropDuplicatesWithinWatermark` on the content
    hash — Spark's built-in stateful dedup operator. The watermark
    bounds the state store (a hash seen longer than `delay` ago is
    forgotten), which is the ONLY scale-safe contract at an unbounded
    stream: exact global dedup over an infinite stream needs infinite
    state, so the horizon is explicit, not hidden.

Parity contract (pytest): for an input whose duplicates all arrive
within the watermark horizon AND in event-time order (processing
order consistent with `ts`), stream output == batch output (same
kept doc_ids). Out-of-order duplicates within the horizon diverge by
design: the stream keeps the first PROCESSED row per hash, while
`dedup_batch` keeps the min (ts, doc_id) row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def content_hash(text: Column) -> Column:
    """Portable content hash (md5 — same as exact_dedup's oracle)."""
    return F.md5(text)


def dedup_batch(docs: DataFrame, text_col: str = "text",
                order_col: str = "ts") -> DataFrame:
    """First-arrival-wins exact dedup over a static table: one row
    per content hash, the earliest (order_col, doc_id). One shuffle
    on the hash; rank instead of min-struct so the full row survives
    without a self-join."""
    h = docs.withColumn("content_hash", content_hash(F.col(text_col)))
    w = Window.partitionBy("content_hash").orderBy(order_col, "doc_id")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Streaming first-arrival dedup with bounded state: duplicates
    arriving within `delay` of the kept row's event time are dropped;
    the state store evicts hashes older than the watermark. Input
    must be a streaming DataFrame with an event-time column."""
    h = docs.withColumn("content_hash", content_hash(F.col(text_col)))
    return h.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
