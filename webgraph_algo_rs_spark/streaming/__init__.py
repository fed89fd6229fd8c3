"""Structured Streaming surface.

The reference is purely batch-iterative — no streaming/watermark
concepts exist there (SURVEY.md §2.6) — so streaming is *additive*
capability on the input side: incremental transcript ingestion keeping
the edge table fresh. See ``transcripts_stream.py``.
"""

from webgraph_algo_rs_spark.streaming.transcripts_stream import (  # noqa: F401
    conversation_sessions,
    incremental_edges,
    stream_transcripts,
    windowed_turn_stats,
)
