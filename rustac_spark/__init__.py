"""rustac_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query semantics of stac-utils/rustac (STAC item
search / validate / translate — see /root/reference) as distributed
DataFrame operators over a Common-Crawl-style web-page table, plus the
north-rule operators the reference lacks: H3-style cell-indexed spatial
join, kNN, and z/x/y web-mercator tiling.

Architecture (Spark-first, NOT a port):
- semantics live in plan construction (pyspark.sql Column trees),
- physics live in Catalyst/Tungsten (pushdown, pruning, AQE, codegen),
- the only Python on the hot path is Arrow-batched pandas UDFs
  (deterministic sha256 geocoding at ingest); every spatial predicate,
  cell covering and tile assignment is pure Column math so it stays
  inside whole-stage codegen.
"""

__version__ = "0.1.0"

REPO_ROOT = __file__.rsplit("/", 2)[0]
DATA_DIR = f"{REPO_ROOT}/data"


def __getattr__(name):
    # the reference's free-function surface (read/write/search) —
    # lazily imported so `import rustac_spark` stays cheap and does
    # not require an active SparkSession
    if name in ("read", "write", "search", "search_api"):
        from . import toplevel
        return getattr(toplevel, name)
    raise AttributeError(name)
