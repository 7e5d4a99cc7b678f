"""Streaming layer.

The reference is batch-only (SURVEY.md §2.9) and the north rule asks for
checkpoint-resumable *batch* stages (``plans.pipeline``), so streaming here
serves the events table: a Structured Streaming ingest shape (readStream →
watermark → windowed agg → writeStream) plus batch-equivalent windowed
aggregations whose semantics the DuckDB oracle can verify.
"""

from .windows import tumbling_event_counts, session_windows, streaming_event_counts  # noqa: F401
