"""twinspect_spark — PySpark-native near-duplicate detection & clustering engine.

A from-scratch re-expression of the capabilities of iscc/twinspect
(reference at /root/reference, studied for WHAT it computes, not HOW):
per-item compact signatures (MinHash, SimHash), candidate generation by
signature collision (LSH banding, Hamming-ball chunking), exact
verification (n-gram Jaccard, longest-common-substring), transitive
clustering (distributed connected components), and TwinSpect-style
effectiveness metrics (macro-averaged precision/recall/F1 per Hamming
threshold) — all as idiomatic PySpark DataFrame plans.

Design target: Iceberg/parquet tables of source-code files
``(repo, path, commit, lang, content)`` at 10^12-file scale; tested on
local[N] with the driver's synthetic parquet tables.
"""

__version__ = "0.1.0"

from twinspect_spark.config import DedupConfig

__all__ = ["DedupConfig", "__version__"]
