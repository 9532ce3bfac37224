"""rtfproc_spark — PySpark-native streaming CEP engine with the query and
data-processing capabilities of torstenvl/rtfproc (reference read-only at
/root/reference), re-expressed Spark-first.

Layers:
- ``kernel``     pure-Python RTF state machine (no Spark imports)
- ``functions``  vectorized pandas/Arrow UDFs + native column functions
- ``operators``  windows, joins, skew handling, dedup, similarity
- ``sources``    transcripts synthesizer + readers, idempotent sink
- ``streaming``  structured-streaming pipelines, metrics, checkpointing
"""

__version__ = "0.1.0"
