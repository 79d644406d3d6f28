"""Shuffle-byte budget audit: run the heaviest HEADLINE families at a
given SF and record, per query, the bytes/records actually SHUFFLED and
any spill — from the executed plan's SQLMetrics, not estimates. The
complement of PLANS.md (which counts shuffle operators statically):
this measures how much data crossed them.

The scale number that matters is the RATIO shuffle-bytes : input-bytes.
A dedup pass that shuffles 2% of its input scales to 100 TB on a
commodity network; one that shuffles 100% needs the network budget of
a sort. Queries here are chosen because their docstrings make exactly
those claims — this tool is the measurement that backs them.

Usage: python tools/shuffle_budget.py [sf_dir]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# query -> tables whose on-disk parquet bytes define its input size
AUDIT = {
    "fdedup_minhash_pairs": ["documents"],
    "fdedup_exact_substring_spans": ["documents"],
    "fdedup_simhash_pairs": ["documents"],
    "text_boilerplate_ngrams": ["documents"],
    "text_kneser_ney_bigram_score": ["documents"],
    "stat_signgd_text_classifier": ["documents"],
    "sim_pq_adc_topk": ["embeddings"],
    "sim_ann_ivfpq": ["embeddings"],
    "graph_triangle_count": ["events"],
    "q1_pricing_summary": ["lineitem"],
    "q18_large_volume_orders": ["lineitem", "orders", "customer"],
    "events_rfm_segmentation": ["events"],
}


def _input_bytes(sf_dir: str, tables: list[str]) -> int:
    total = 0
    for t in tables:
        p = Path(sf_dir) / f"{t}.parquet"
        total += (
            sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
            if p.is_dir()
            else p.stat().st_size
        )
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from irs_990_efiler_database_spark.caching import release_cached
    from irs_990_efiler_database_spark.plans.metrics import summarize_execution
    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("shuffle_budget")
    qs = all_queries()
    rows = []
    out = {}
    for name, tables in AUDIT.items():
        df = qs[name](spark, sf_dir)
        # collect() (not a noop write) so the metrics live on THIS
        # DataFrame's executed plan — a write wraps a fresh execution
        # whose metrics the summarizer can't see. Outputs here are
        # aggregated frames, small by construction.
        df.collect()
        m = summarize_execution(df)
        inp = _input_bytes(sf_dir, tables)
        ratio = m.shuffle_bytes_written / inp if inp else float("nan")
        rows.append(
            f"| {name} | {inp/1e6:.1f} | {m.shuffle_bytes_written/1e6:.2f} "
            f"| {ratio:.3f} | {m.shuffle_records_written} "
            f"| {m.spill_bytes/1e6:.1f} |"
        )
        out[name] = {
            "input_mb": round(inp / 1e6, 2),
            "shuffle_mb": round(m.shuffle_bytes_written / 1e6, 3),
            "ratio": round(ratio, 4),
            "spill_mb": round(m.spill_bytes / 1e6, 2),
        }
        release_cached()
        spark.catalog.clearCache()
    print("| query | input MB | shuffled MB | ratio | shuffle rows | spill MB |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    print()
    print(json.dumps({"metric": "shuffle_budget", "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
