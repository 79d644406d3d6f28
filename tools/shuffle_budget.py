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

Usage:
    python tools/shuffle_budget.py [sf_dir]          # measure + print
    python tools/shuffle_budget.py [sf_dir] --gate   # regression gate

``--gate`` compares each family's measured ratio against the COMMITTED
bound in tools/shuffle_bounds.json and exits 1 when any family exceeds
bound x factor (1.5) — the measurement that caught round 6's
ExactSubstr hex-string-key 2.3x regression, promoted from a table a
human reads to a tripwire a regression trips. Ratios are
scale-stable by design (both numerator and denominator grow with the
data), but bounds are recorded at sf0.1 — run the gate at the same SF.
New spill where the bound run had none also fails: spill at the test
SF means memory pressure at any real SF.
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


def measure(spark, sf_dir: str, audit: dict | None = None, queries=None) -> dict:
    """Run each audited family and return per-query measured stats.
    ``queries`` overrides the registry (the gate's de-optimization
    test injects a deliberately worse variant through it)."""
    from irs_990_efiler_database_spark.caching import release_cached
    from irs_990_efiler_database_spark.plans.metrics import summarize_execution
    from irs_990_efiler_database_spark.queries import all_queries

    qs = queries if queries is not None else all_queries()
    out = {}
    for name, tables in (audit or AUDIT).items():
        df = qs[name](spark, sf_dir)
        # collect() (not a noop write) so the metrics live on THIS
        # DataFrame's executed plan — a write wraps a fresh execution
        # whose metrics the summarizer can't see. Outputs here are
        # aggregated frames, small by construction.
        df.collect()
        m = summarize_execution(df)
        inp = _input_bytes(sf_dir, tables)
        ratio = m.shuffle_bytes_written / inp if inp else float("nan")
        out[name] = {
            "input_mb": round(inp / 1e6, 2),
            "shuffle_mb": round(m.shuffle_bytes_written / 1e6, 3),
            "ratio": round(ratio, 4),
            "shuffle_rows": m.shuffle_records_written,
            "spill_mb": round(m.spill_bytes / 1e6, 2),
        }
        release_cached()
        spark.catalog.clearCache()
    return out


def check_bounds(measured: dict, bounds_doc: dict) -> list[str]:
    """Compare measured ratios against committed bounds; returns the
    list of violations (empty = gate passes). A family measured but
    not bounded is also a violation — new heavy families must commit
    a bound when they join the audit. Symmetrically, a BOUNDED family
    that was not measured is a violation too (ADVICE r7: otherwise
    dropping a family from AUDIT silently disarms its tripwire —
    gate coverage may only shrink by editing shuffle_bounds.json,
    which is a reviewed, committed file)."""
    factor = bounds_doc.get("factor", 1.5)
    bounds = bounds_doc["bounds"]
    problems = []
    for name in bounds:
        if name not in measured:
            problems.append(
                f"{name}: committed bound but NOT measured — removed "
                "from AUDIT or failed to run; delete its bound "
                "deliberately if retiring the family"
            )
    for name, stats in measured.items():
        bound = bounds.get(name)
        if bound is None:
            problems.append(f"{name}: no committed bound (add one)")
            continue
        if stats["ratio"] > bound * factor:
            problems.append(
                f"{name}: ratio {stats['ratio']:.4f} > bound {bound} x "
                f"{factor} = {bound * factor:.4f}"
            )
        if stats["spill_mb"] > 0:
            problems.append(
                f"{name}: {stats['spill_mb']} MB spill (bound run had none)"
            )
    return problems


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    gate = "--gate" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("shuffle_budget")
    out = measure(spark, sf_dir)
    print("| query | input MB | shuffled MB | ratio | shuffle rows | spill MB |")
    print("|---|---|---|---|---|---|")
    for name, s in out.items():
        print(
            f"| {name} | {s['input_mb']:.1f} | {s['shuffle_mb']:.2f} "
            f"| {s['ratio']:.3f} | {s['shuffle_rows']} | {s['spill_mb']:.1f} |"
        )
    print()
    print(json.dumps({"metric": "shuffle_budget", "sf_dir": sf_dir, "queries": out}))
    if gate:
        bounds_doc = json.loads((REPO / "tools" / "shuffle_bounds.json").read_text())
        problems = check_bounds(out, bounds_doc)
        if problems:
            print("SHUFFLE GATE FAILED:", file=sys.stderr)
            for p in problems:
                print(f"  {p}", file=sys.stderr)
            raise SystemExit(1)
        print(f"shuffle gate: {len(out)} families within committed bounds")


if __name__ == "__main__":
    main()
