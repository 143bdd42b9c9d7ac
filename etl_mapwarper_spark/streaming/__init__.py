"""Structured Streaming surface (SURVEY.md §7 Phase 6).

The reference has no streaming semantics (its "streams" are lazy
single-process iterators, mapwarper.js:189-212) — this package is
pure-Spark-defined behavior: event-time windows, watermarks,
within-watermark dedup, and a custom stateful operator.
"""
