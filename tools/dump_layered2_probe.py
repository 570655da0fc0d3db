"""Dump the PROBE-TIME plan of knn_graph_layered2, isolated from the
cached index-build lineage (VERDICT r18 item 6 evidence).

r18's checklist called the layered2 walk "the 8-exchange beam walk" —
but those exchanges live in the committed dump's embedded
InMemoryRelation child (the index-BUILD lineage Spark prints inside the
cache node), not in the probe. This script materializes the index
cache first (one throwaway execution), reconstructs the query, and
dumps the explain; at that point the executed plan reads the cache leaf
(InMemoryTableScan), so what remains IS the per-probe work. It also
prints node counts for the probe subtree.

Writes plans/r19/knn_graph_layered2_probe.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from cs598vectordb_spark.session import get_spark

    spark = get_spark("dump-layered2-probe")
    qs = entrymod.queries()

    # first execution builds + materializes the cached index
    qs["knn_graph_layered2"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # reconstruct: the index cache is now warm, so this plan's leaves
    # are InMemoryTableScan — probe-time work only
    df = qs["knn_graph_layered2"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    formatted = buf.getvalue()
    phys = df._jdf.queryExecution().executedPlan().toString()

    # count probe-side nodes: the formatted dump prints the cache's
    # child lineage inside InMemoryRelation, so split it off
    probe_part = formatted.split("InMemoryRelation")[0]
    counts = {
        n: probe_part.count(n)
        for n in (
            "Exchange",
            "FlatMapGroupsInPandas",
            "Window",
            "InMemoryTableScan",
            "Scan parquet",
        )
    }
    header = (
        "# probe-time plan of knn_graph_layered2 (index cache "
        "materialized first; text above the first InMemoryRelation is "
        f"the per-probe work)\n# probe-side node counts: {counts}\n\n"
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r19",
        "knn_graph_layered2_probe.txt",
    )
    with open(out_path, "w") as fh:
        fh.write(header + formatted + "\n\n== executedPlan ==\n" + phys)
    print(header)
    print("written:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
