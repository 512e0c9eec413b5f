"""Pure Python/numpy extraction kernels.

Single source of truth for extraction semantics: the Spark pandas-UDF
bodies (mineru_spark.pipeline) and the pytest oracle both call
``oracle.extract_turn`` so per-turn text equality is testable without a
cluster (SURVEY.md §5).
"""

# oracle imported lazily below (defined after the route kernels)
try:
    from .oracle import extract_turn, OUTPUT_FIELDS  # noqa: F401
    from .classify import classify_payload  # noqa: F401
except ImportError:
    pass  # during incremental construction
