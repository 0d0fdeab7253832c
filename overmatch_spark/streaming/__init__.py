"""Structured Streaming operators.

The reference is a nightly batch pipeline with no streams
(SURVEY.md §2.8; /root/reference/overpass-ultra.ultra:13); its only
incremental behaviors are resume-by-anti-join and first/last-seen
upserts. This package provides the natural streaming mapping for
those behaviors — incremental ingestion with Trigger.AvailableNow and
exactly-once seen-state maintenance in foreachBatch — so the engine
can consume a continuously-arriving feature feed without changing any
batch operator.
"""
