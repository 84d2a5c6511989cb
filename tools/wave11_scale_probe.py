"""Wave-11 scale probes (staged r19): knn_prune_assignment and
membership_triage at 1x and 10x the sf0.1 corpus — the
register-time evidence that the composites inherit their substrates'
linear scaling (both ride the auto-plane kNN graph, whose plane count
grows with log2(n) so expected bucket size stays ~target at any
corpus size; the composites add only keyed aggregates and grain-
preserving joins on top).

Usage: python tools/wave11_scale_probe.py [amp ...]   # default 1 10
Appends one JSON line per probe to stdout (redirect to
SCALE_PROBE_r19.jsonl)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from datapipeline_spike_spark.cache import unpersist_all  # noqa: E402
from datapipeline_spike_spark.operators.curation import membership_triage  # noqa: E402
from datapipeline_spike_spark.operators.similarity import knn_prune_assignment  # noqa: E402
from datapipeline_spike_spark.session import get_session  # noqa: E402
from tools.scale_probe import amplify_documents, amplify_embeddings  # noqa: E402


def main() -> None:
    amps = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_session("wave11-scale-probe")
    for a in amps:
        emb = amplify_embeddings(spark, a).localCheckpoint(eager=True)
        docs = amplify_documents(spark, a).localCheckpoint(eager=True)
        n_vec = emb.count()
        n_doc = docs.count()

        t0 = time.perf_counter()
        pruned = knn_prune_assignment(emb, dim=64, k=5)
        n_rows = pruned.count()
        n_kept = pruned.filter("kept").count()
        dt = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "probe": "knn_prune_assignment", "amp": a, "vectors": n_vec,
            "rows": n_rows, "kept": n_kept, "sec": dt,
            "vecs_per_sec": int(n_vec / dt) if dt else None,
        }), flush=True)
        unpersist_all(spark, keep_checkpoints=True)

        t0 = time.perf_counter()
        tri = membership_triage(docs, emb, dim=64, k=5)
        routes = {
            r["triage"]: r["count"]
            for r in tri.groupBy("triage").count().collect()
        }
        n_rows = sum(routes.values())
        dt = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "probe": "membership_triage", "amp": a, "docs": n_doc,
            "rows": n_rows, "routes": routes, "sec": dt,
            "docs_per_sec": int(n_doc / dt) if dt else None,
        }), flush=True)
        unpersist_all(spark)
    spark.stop()


if __name__ == "__main__":
    main()
