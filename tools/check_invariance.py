"""Partitioning-invariance check: run order-sensitive-risk queries
under two different ``spark.sql.shuffle.partitions`` settings (in
separate processes) and compare order-insensitive value hashes.

The DuckDB oracle gate catches cross-engine mismatches, but a result
that silently depends on Spark's partitioning (double accumulation
order, undeterministic tie-breaks, first/last without order) can
agree with the oracle under one partitioning and flap under another.
This check varies the one knob the cluster WILL vary.

Usage: python tools/check_invariance.py [sf_dir] [query ...]
Default query set = the rank/ntile/double-aggregation family.
Exit 1 if any query's hash differs between the two settings.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEFAULT_QUERIES = """
win_exact_ntile_distributed events_rfm_segmentation doc_quality_deciles
text_zipf_fit doc_token_equal_shards events_gini_coefficient
sim_hybrid_rrf_search fdedup_minhash_pairs agg_variance_exact
stat_corr_pairs mm_audio_zero_crossing agg_percentile_disc
events_asof_last_purchase q1_pricing_summary text_boilerplate_ngrams
fdedup_semantic_pairs text_decontaminate_13gram rec_item_cooccurrence
sketch_binned_quantiles
""".split()

_CHILD = '''
import sys, json, hashlib, decimal, datetime
sys.path.insert(0, {repo!r})
from irs_990_efiler_database_spark.session import get_spark
from irs_990_efiler_database_spark.queries import all_queries

def canon(v):
    if v is None: return "N"
    if isinstance(v, float): return repr(v)
    if isinstance(v, bool): return "T" if v else "F"
    if isinstance(v, decimal.Decimal): return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

sp = int(sys.argv[1]); sf = sys.argv[2]; names = sys.argv[3:]
extra = {{}}
if sp != 8:
    # second config also perturbs scan splits and Arrow batch sizes:
    # catches per-batch logic bugs in mapInPandas operators (results
    # must not depend on how rows land in batches)
    extra = {{
        "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    }}
spark = get_spark(
    "invariance-" + str(sp), shuffle_partitions=sp, extra_conf=extra
)
out = {{}}
qs = all_queries()
for name in names:
    df = qs[name](spark, sf)
    cols = sorted(df.columns)
    rows = sorted("\\x01".join(canon(r[c]) for c in cols) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode()); h.update(b"\\n")
    out[name] = h.hexdigest()
    spark.catalog.clearCache()
print("RESULT " + json.dumps(out))
'''


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or DEFAULT_QUERIES
    child = _CHILD.format(repo=str(REPO))
    res = {}
    for sp in (8, 3):
        p = subprocess.run(
            [sys.executable, "-c", child, str(sp), sf, *names],
            capture_output=True,
            text=True,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(p.stdout[-3000:], p.stderr[-3000:])
            return 2
        res[sp] = json.loads(lines[0][7:])
    diff = [q for q in names if res[8][q] != res[3][q]]
    print(f"queries checked: {len(names)}")
    print("partitioning-dependent results:", diff or "NONE")
    return 1 if diff else 0


if __name__ == "__main__":
    raise SystemExit(main())
