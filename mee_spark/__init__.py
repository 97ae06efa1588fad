"""mee_spark — a PySpark-native full-text index builder + BM25 query engine.

From-scratch re-expression of the capability that ioduduk/mee outsources to
Elasticsearch (mee only *syncs* documents into ES; see reference
`README.md:2-49`): an inverted-index build pipeline (SPIMI segments of
(term, docID, tf) posting lists, delta+varbyte compressed, block-max
metadata), a BM25 (k1=1.2, b=0.75) top-k query engine with block-max WAND
pruning, and mee's index lifecycle (full rebuild + atomic alias swap,
incremental sync, resumable checkpoints — reference
`services/updateservice.py:47-80`, `services/syncservice.py:53-114`)
reframed as manifest generations over Parquet segment files.

Everything is idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs for the per-partition index-structure work,
no per-row Python anywhere.
"""

__version__ = "0.1.0"

from mee_spark.config import IndexConfig, K1, B, BLOCK_SIZE  # noqa: F401
from mee_spark.session import recommended_conf  # noqa: F401
