"""Structured Streaming surface (SURVEY.md §2i — a gap in the reference).

The reference's closest analogs are incremental per-character checkpoints
(web_scraper.py:1164-1183) and append-mode loads (web_scraper.py:1286-1291).
Here the same event-time computations as `plans/events.py` run as true
streams: file source → watermark → windowed state → sink, plus an
`applyInPandasWithState` custom stateful operator.
"""

from dffoo_data_pipeline_spark.streaming.jobs import (  # noqa: F401
    QUERIES,
    ORACLES,
    read_events_stream,
    run_stream_to_table,
)
