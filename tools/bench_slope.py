"""Scale-slope evidence for the heaviest operator families (r4
next-round item #6): run each at two scale points and report the
wall-time growth ratio against the data growth ratio. A family whose
time ratio tracks (or undercuts) its data ratio is empirically
sub-quadratic — the measured backing for the design-argument 100-TB
claims in the operator docstrings.

Two scale points per family:
- registry queries: sf0.01 → sf0.1 testdata (10× documents/events/
  lineitem, 4× embeddings — the actual data ratio is measured from
  the inputs each family reads);
- the XML build: 2,000 → 8,000 synthetic docs (4×).

Usage: python tools/bench_slope.py [--quick]
(--quick halves the build corpus sizes for a fast smoke run)

Appends nothing; prints a markdown table to paste into BENCH_NOTES.md
and a JSON line for tooling.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"

# family → (query name, input tables whose row-count ratio defines the
# data ratio)
FAMILIES = {
    "minhash-LSH pairs": ("fdedup_minhash_pairs", ["documents"]),
    "boilerplate ngrams": ("text_boilerplate_ngrams", ["documents"]),
    "triangle count": ("graph_triangle_count", ["events"]),
    "IVF ANN": ("sim_ann_ivf", ["embeddings"]),
    "equal-token sharding": ("doc_token_equal_shards", ["documents"]),
    # streaming (VERDICT r5 #6): cost should be micro-batch-count-
    # bound (engine overhead per batch), not state-bound — a time
    # ratio far below the event ratio is the expected signature
    "stream stateful sessions": (
        "events_stream_stateful_sessions", ["events"],
    ),
    "stream click attribution": (
        "events_stream_click_attribution", ["events"],
    ),
    # round 6 additions: the window-per-char span dedup (payload = ~1
    # row/char) and the iterative integer trainer (per-iteration cost
    # = one doc-keyed shuffle + one 64-group aggregation)
    "exact-substring spans": (
        "fdedup_exact_substring_spans", ["documents"],
    ),
    "signSGD classifier": (
        "stat_signgd_text_classifier", ["documents"],
    ),
    "PQ-ADC topk": ("sim_pq_adc_topk", ["embeddings"]),
    # round 7 (VERDICT r6 #6): the widest graph plans — LPA 28
    # shuffles, k-core 22, PageRank 14. Expected signature: time ratio
    # well under the edge ratio (fixed per-round engine overhead
    # dominates at these SFs; the data-dependent term is one
    # edge-keyed shuffle per superstep)
    "LPA communities": ("graph_label_propagation", ["events"]),
    "k-core peeling": ("graph_kcore_membership", ["events"]),
    "PageRank 5 iter": ("graph_pagerank_5iter", ["events"]),
}


def _rows(sf_dir: str, table: str) -> int:
    import duckdb

    return duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchone()[0]


def _time_query(spark, fn, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    quick = "--quick" in sys.argv[1:]
    only = None
    if "--only" in sys.argv[1:]:
        only = sys.argv[sys.argv.index("--only") + 1].lower()
    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("bench-slope")
    qs = all_queries()
    out_rows = []
    results = {}

    families = {
        k: v
        for k, v in FAMILIES.items()
        if only is None or only in k.lower() or only in v[0]
    }
    for label, (qname, tables) in families.items():
        fn = qs[qname]
        _time_query(spark, fn, SF_A)  # warm JIT/codegen once
        # interleave the two sizes (A,B,A,B) and take best-of-2 per
        # size: monotonic host-load drift then biases both sizes the
        # same way instead of poisoning the ratio
        ta, tb = float("inf"), float("inf")
        for _ in range(2):
            ta = min(ta, _time_query(spark, fn, SF_A))
            tb = min(tb, _time_query(spark, fn, SF_B))
        data_ratio = max(
            _rows(SF_B, t) / _rows(SF_A, t) for t in tables
        )
        time_ratio = tb / ta
        out_rows.append(
            (label, qname, f"{ta:.2f}", f"{tb:.2f}",
             f"{data_ratio:.0f}x", f"{time_ratio:.2f}x")
        )
        results[qname] = {
            "t_small": round(ta, 2),
            "t_big": round(tb, 2),
            "data_ratio": data_ratio,
            "time_ratio": round(time_ratio, 2),
        }

    # build family: 2k → 8k synthetic docs through the full pipeline
    if only is not None and "build" not in only:
        _print_results(out_rows, results)
        spark.stop()
        return
    import tempfile

    from tools.gen_xml_corpus import gen_bundle
    from irs_990_efiler_database_spark.jobs import build_database

    n_small, n_big = (1000, 4000) if quick else (2000, 8000)
    times = {}
    # warm-up mini-build so JIT/codegen cost doesn't inflate the small
    # point (it made time_ratio read <1 in early runs)
    with tempfile.TemporaryDirectory() as td:
        gen_bundle(spark, f"{td}/b", 200)
        build_database(spark, f"{td}/o", bundle_path=f"{td}/b")
    with tempfile.TemporaryDirectory() as td:
        for n in (n_small, n_big):
            gen_bundle(spark, f"{td}/bundle{n}", n)
        times = {n: float("inf") for n in (n_small, n_big)}
        for i in range(2):  # interleaved best-of-2 (same rationale as above)
            for n in (n_small, n_big):
                t0 = time.time()
                build_database(
                    spark, f"{td}/out{n}_{i}", bundle_path=f"{td}/bundle{n}"
                )
                times[n] = min(times[n], time.time() - t0)
    ratio = times[n_big] / times[n_small]
    out_rows.append(
        ("XML build", f"build_{n_small}->{n_big}", f"{times[n_small]:.2f}",
         f"{times[n_big]:.2f}", f"{n_big / n_small:.0f}x", f"{ratio:.2f}x")
    )
    results["xml_build"] = {
        "t_small": round(times[n_small], 2),
        "t_big": round(times[n_big], 2),
        "data_ratio": n_big / n_small,
        "time_ratio": round(ratio, 2),
    }

    _print_results(out_rows, results)
    spark.stop()


def _print_results(out_rows, results) -> None:
    print("\n| family | query | t_small (s) | t_big (s) | data | time |")
    print("|---|---|---|---|---|---|")
    for r in out_rows:
        print("| " + " | ".join(r) + " |")
    print()
    print(json.dumps({"metric": "scale_slope", "families": results}))


if __name__ == "__main__":
    main()
