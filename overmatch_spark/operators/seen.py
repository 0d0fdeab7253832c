"""Seen-state upsert (SURVEY.md K5/D2): DynamoDB first_seen/last_seen
semantics as a pure-DataFrame MERGE.

Reference: /root/reference/api/db.py:54-91 — if an element exists,
only last_seen is refreshed; first_seen is immutable once set. With
Iceberg this is `MERGE INTO seen USING batch ON element_id WHEN
MATCHED THEN UPDATE SET last_seen WHEN NOT MATCHED THEN INSERT`; this
module provides the engine-native fallback (union + min/max per key),
which is also the shape that scales: one shuffle on element_id,
partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_seen(seen: DataFrame, batch: DataFrame) -> DataFrame:
    """seen(element_id, first_seen, last_seen) + batch(element_id,
    seen_at) -> new seen state. first_seen = earliest ever, last_seen =
    latest ever (db.py:72-88)."""
    b = batch.select(
        "element_id",
        F.col("seen_at").alias("first_seen"),
        F.col("seen_at").alias("last_seen"),
    )
    return (
        seen.unionByName(b)
        .groupBy("element_id")
        .agg(
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )
    )


def skip_existing(batch: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """D1/J9: resume — drop rows whose key already reached the sink
    (api/load_matches.py:176-183)."""
    return batch.join(done.select(key).distinct(), key, "left_anti")
