"""Streaming extension (SURVEY.md §2.12 "Streaming (events)").

Two layers:

* ``windows`` -- event-time window aggregations (tumbling / sliding /
  session) expressed with ``F.window`` / ``F.session_window``. These run
  identically in batch and streaming (same Catalyst operators), so the batch
  form is registered in ``queries()`` with a DuckDB oracle -- the strongest
  correctness check available for window semantics.
* ``runtime`` -- Structured Streaming execution: file source -> watermark ->
  windowed agg / dedup-within-watermark / stateful per-key counts ->
  ``availableNow`` batch-equivalence. Exercised by ``tests/test_streaming.py``
  (timing-free: checkpointed micro-batch sequences, never wall-clock).
"""

from .windows import ORACLES, QUERIES  # noqa: F401
