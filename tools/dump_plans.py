"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [name ...]
  tag     — subdirectory under plans/ (e.g. r18)
  suffix  — "before" or "after"
  name…   — query names; default = the bench headline list

Each plan lands at plans/<tag>/<name>_<suffix>.txt. Queries whose
construction itself fails are recorded with the error text so the
artifact set stays complete.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from cs598vectordb_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = entrymod.queries()
    if not names:
        import bench

        src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
        # fall back to every oracled headline query if parsing ever breaks
        names = [
            "knn_exact", "knn_exact_2k", "knn_cosine", "knn_ivf_materialized",
            "knn_ivf2", "knn_pq_refined", "knn_ivfpq", "knn_sq8", "knn_ivf_sq8",
            "knn_graph_layered", "knn_graph_layered2", "knn_graph2_served",
            "knn_graph_sq8", "recall_low_dim", "knn_post_delete", "scan_fvecs",
            "pricing_summary", "shipping_priority", "local_supplier_volume",
            "order_priority_count", "sessionize", "events_hourly",
            "asof_attribution", "salted_user_stats", "dedup_exact",
            "minhash_lsh_dedup", "dedup_clusters", "jaccard_topk",
            "quality_scores", "token_counts", "decontamination",
            "pack_sequences", "stratified_sample", "curate_corpus",
            "media_features", "stream_events_hourly",
        ]
        del src

    # index probes need the warm registry, same as the bench
    from cs598vectordb_spark.queries_index import warm_indexes

    warm_indexes(spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # record, keep sweeping
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
