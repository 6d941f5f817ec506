"""go_lsh_spark — a PySpark-native near-duplicate detection & clustering engine.

Re-expresses the capabilities of the aouyang1/go-lsh reference
(random-hyperplane SimHash LSH over fixed-dimension vectors, threshold/sign
filtered Pearson scoring, top-K search) as an idiomatic Spark DataFrame
pipeline, and extends it per BASELINE.json into a batch dedup + clustering
pipeline over audio clip + transcript tables (MinHash over shingles,
suffix-array substring verification, iterative connected components).

Layout:
    config.py        -- LSHConfig / SearchOptions / DedupConfig dataclasses
    hyperplanes.py   -- seeded hyperplane matrices + exact sign-hash kernel
    oracle.py        -- pure-numpy reference oracle (parity tests + recall gate)
    session.py       -- SparkSession factory tuned for the pipeline
    functions/       -- column-level kernels (vector, text, audio) as
                        built-in-expression builders and pandas UDFs
    operators/       -- DataFrame operators (index, search, dedup, ann,
                        connected components, stats)
    sources/         -- table IO (parquet-backed warehouse w/ lineage
                        metrics + checkpoint/resume), synthetic clips
    plans/           -- plan inspection helpers (pushdown / codegen asserts)
    streaming/       -- structured-streaming ingest surface (batch engine
                        reused via foreachBatch)
"""

from go_lsh_spark.config import LSHConfig, SearchOptions, DedupConfig
from go_lsh_spark.hyperplanes import Hyperplanes

__all__ = ["LSHConfig", "SearchOptions", "DedupConfig", "Hyperplanes"]
__version__ = "0.1.0"
