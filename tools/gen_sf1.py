"""sf1-scale local testdata: a deterministic 10x upsample of the
read-only sf0.1 set, for the THIRD capacity-plan point (VERDICT r6 #8
— the 100-TB plan extrapolated from two points a decade of scale from
the target; the third point tests linearity where being wrong is
cheapest).

Upsampling preserves each family's workload SHAPE, which naive
replication would not:

- documents, DEFAULT mode: every token gets a replica-unique suffix —
  replicas share no WORD n-grams (LM workloads keep their pair
  structure), but round 11 measured that CHARACTER 5-shingles survive
  inside every token, so cross-replica jaccard stays >=0.5 and the
  corpus gains ~10.6M true near-dup pairs (vs 283 at sf0.1): the
  minhash family's sf1 cost in this mode is dominated by GENUINE pair
  volume, not engine overhead. Kept as the default for cross-round
  comparability of the committed capacity tables.
- documents, --dedup-safe mode: replica k's text is Caesar-shifted by
  k over [a-zA-Z] (F.translate) — a per-replica bijection on
  characters, so WITHIN-replica near-dup structure is preserved
  exactly (jaccard is permutation-invariant) while cross-replica
  shingle overlap drops to punctuation/digit noise. Use this corpus to
  measure candidate-generation engine cost at scale with pair density
  held at the sf0.1 level.
- embeddings: a small deterministic sin() perturbation per
  (replica, vec_id, dim) — keeps the cluster geometry IVF/PQ training
  sees while breaking exact-duplicate cosine structure.
- events: user ids offset per replica (per-user session/graph degree
  distributions identical), timestamps shifted k seconds (bucket
  densities grow 10x, like real traffic growth), event ids offset.
- lineitem: key columns offset per replica, measures untouched.

Only the tables the capacity-plan families read are generated.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFFSET = 10_000_000


def gen_sf1(
    spark, out_dir: str, replicas: int = REPLICAS, dedup_safe: bool = False
) -> None:
    import string

    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.catalog import load_table

    if dedup_safe and replicas > 26:
        # the Caesar shift 'k % 25 + 1' repeats with period 25: replica
        # pairs 25 apart would be byte-IDENTICAL, silently reintroducing
        # the cross-replica pair inflation this mode exists to remove
        raise ValueError(
            "dedup_safe supports at most 26 replicas (shift alphabet has "
            f"25 non-identity rotations), got {replicas}"
        )
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    docs = load_table(spark, SRC, "documents")
    parts = []
    for k in range(replicas):
        if k == 0:
            parts.append(docs)
            continue
        if dedup_safe:
            # Caesar-shift by k: length/token/zipf shape identical,
            # within-replica jaccard EXACTLY preserved (bijection on
            # chars), cross-replica char-shingle overlap destroyed
            lo, up = string.ascii_lowercase, string.ascii_uppercase
            s = k % 25 + 1  # 1..25, never the identity
            text = F.translate(
                F.col("text"), lo + up, lo[s:] + lo[:s] + up[s:] + up[:s]
            )
        else:
            def tag(k):
                # factory, not a default arg: pyspark counts lambda
                # params (defaults included) to pick the
                # (element[, index]) form
                return lambda w: F.concat(w, F.lit(f"_{k}"))

            text = F.array_join(
                F.transform(F.split("text", " "), tag(k)), " "
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + k * OFFSET).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    _union(parts).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    parts = []
    for k in range(replicas):
        if k == 0:
            parts.append(emb)
            continue
        def perturb(k):
            # factory: pyspark counts the lambda's parameters
            # (including defaults), so closing over k via a default
            # arg breaks the 2-arg (element, index) contract
            return lambda x, i: (
                x + 0.01 * F.sin(F.col("vec_id") * 131 + i * 17 + F.lit(k * 257))
            ).cast("float")

        parts.append(
            emb.select(
                (F.col("vec_id") + k * OFFSET).alias("vec_id"),
                F.transform("embedding", perturb(k)).alias("embedding"),
                "label",
            )
        )
    _union(parts).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    ev = load_table(spark, SRC, "events")
    parts = []
    for k in range(replicas):
        if k == 0:
            parts.append(ev)
            continue
        parts.append(
            ev.select(
                (F.col("event_id") + k * OFFSET).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {k} SECOND")).alias("ts"),
                (F.col("user_id") + k * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    _union(parts).write.mode("overwrite").parquet(str(out / "events.parquet"))

    li = load_table(spark, SRC, "lineitem")
    parts = []
    for k in range(replicas):
        if k == 0:
            parts.append(li)
            continue
        parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + k * OFFSET)
            .withColumn("l_partkey", F.col("l_partkey") + k * OFFSET)
            .withColumn("l_suppkey", F.col("l_suppkey") + k * OFFSET)
        )
    _union(parts).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))


def _union(frames):
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


if __name__ == "__main__":
    from irs_990_efiler_database_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    target = args[0] if args else "/tmp/sf1"
    safe = "--dedup-safe" in sys.argv
    gen_sf1(get_spark("gen-sf1"), target, dedup_safe=safe)
    mode = "dedup-safe " if safe else ""
    print(f"wrote {mode}sf1 upsample to {target}")
