"""Streaming-shaped semantics (SURVEY.md §2I).

The reference is a continuous event-driven scheduler loop; the north rule
re-frames it as batch-wave iteration (rendler_spark.engine).  This package
exposes the streaming-shaped operators as first-class pieces: event-time
windows usable on both static and streaming DataFrames, and a Structured
Streaming skin that drives the same wave logic through foreachBatch.
"""
