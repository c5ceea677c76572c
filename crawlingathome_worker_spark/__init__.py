"""crawlingathome_worker_spark — a PySpark-native URL-frontier + fetch scheduler.

A from-scratch, Spark-first re-expression of the capabilities of
Wikidepia/crawlingathome-worker (reference at /root/reference/crawlingathome.py):
WAT-derived image-caption candidate harvesting, global URL dedup, politeness-aware
scheduling, simulated fetch + image decode/filter, and snapshot-checkpointed state —
all as DataFrame plans with vectorized pandas/Arrow UDFs (no per-row Spark Python UDFs).

Design scale: 10^10-URL frontier on a multi-executor cluster; sandbox scale: local[32].
Every stateful structure (bloom, cuckoo, frontier, output) lives in a partitioned table,
never in executor memory, so waves are resumable from any snapshot.
"""

__version__ = "0.1.0"

from .config import EngineConfig  # noqa: F401
