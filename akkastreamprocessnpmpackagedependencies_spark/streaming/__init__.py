"""Structured Streaming pipelines: the streaming flagship (complete-mode
aggregation — the honest analogue of the reference's end-of-stream fold)
and the event-time surface (watermarks, tumbling/sliding/session windows,
dedup-within-watermark, custom stateful ops) the reference lacks."""
