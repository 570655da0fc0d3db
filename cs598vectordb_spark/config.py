"""Engine-wide constants.

Mirrors the reference harness's fixed parameters (k=10 everywhere, e.g.
/root/reference/dynamic_script_faiss.py:60) and the FIXTURES.md derivation
rules (queries = first N rows of embeddings; deterministic seed 42).
"""

# top-k for every kNN query — reference uses k=10 throughout
# (dynamic_script_faiss.py:50, multi_tenant_script.py:121).
DEFAULT_K = 10

# number of query vectors derived from the head of the embeddings table
# (FIXTURES.md: sf0.001 n_q=50 for smoke, sf0.01 n_q=100 for the oracle
# gate). The oracle SQL bakes in the same constant.
DEFAULT_N_QUERIES = 100
SMOKE_N_QUERIES = 50

# every randomized component (LSH hyperplanes, KMeans init, sampling).
SEED = 42

# decimals used when rounding floating aggregates that face the DuckDB
# oracle; keeps order-of-summation fp noise below the hash boundary.
ORACLE_ROUND = 4

# update percentages exercised by the dynamic protocol — the union of the
# library runs' [50] (dynamic_script_faiss.py:46) and the server runs'
# [25, 75] (dynamic_script_milvus.py:59).
UPDATE_PERCENTS = [25, 50, 75]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
