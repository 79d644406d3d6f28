"""Invariant tests for the stats / sketch operators added in round 4 —
properties the DuckDB hash gate can't express (determinism across
partitionings, one-sided error bounds, merge algebra)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_cms_never_undercounts(spark):
    """Count-min's defining guarantee: estimate >= true frequency."""
    from irs_990_efiler_database_spark.queries.sketch_ops import (
        sketch_cms_freq_error,
    )

    rows = sketch_cms_freq_error(spark, SF_DIR).collect()
    assert rows, "probe set should be non-empty"
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.est_n >= r.exact_n for r in rows)


def test_kmv_merge_equals_whole_corpus_sketch(spark):
    """Sketch algebra: bottom-k(merge(synopsis(A), synopsis(B))) ==
    bottom-k(A ∪ B) — the property that lets per-shard synopses answer
    global questions without rescanning."""
    from irs_990_efiler_database_spark.operators.sketch import (
        kmv_bottom_k,
        kmv_merge,
    )

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = 32
    left = kmv_bottom_k(e.filter(F.col("event_id") % 2 == 0), "user_id", k)
    right = kmv_bottom_k(e.filter(F.col("event_id") % 2 == 1), "user_id", k)
    merged = sorted(r.h for r in kmv_merge(k, left, right).collect())
    whole = sorted(r.h for r in kmv_bottom_k(e, "user_id", k).collect())
    assert merged == whole


def test_priority_sample_deterministic_across_partitionings(spark):
    """The weighted sample must select identical rows no matter how
    the input is partitioned — the reason it uses hash uniforms, not
    rand()."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        sample_weighted_priority,
    )

    base = sample_weighted_priority(spark, SF_DIR)
    picked = {(r.o_orderpriority, r.o_orderkey) for r in base.collect()}
    # re-run over a deliberately different partitioning of the same table
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(13)
    o.createOrReplaceTempView("_orders_repart")
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        + 1
    )
    from pyspark.sql import Window

    keyed = o.select(
        "o_orderpriority",
        "o_orderkey",
        (u.cast("double") / F.col("o_totalprice")).alias("pk"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("pk", "o_orderkey")
    again = {
        (r.o_orderpriority, r.o_orderkey)
        for r in keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .collect()
    }
    assert picked == again
    # per-group size is min(20, group size)
    sizes = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    expected = {r.o_orderpriority: min(20, r["count"]) for r in sizes}
    got: dict[str, int] = {}
    for p, _ in picked:
        got[p] = got.get(p, 0) + 1
    assert got == expected


def test_gap_fill_produces_dense_calendar(spark):
    """Every user's output covers every day from first to last with no
    holes, and the filled value is never NULL (day 1 is observed by
    construction)."""
    import datetime

    from irs_990_efiler_database_spark.queries.stats_ops import (
        events_gap_fill_ffill,
    )

    rows = events_gap_fill_ffill(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list[str]] = {}
    for r in rows:
        assert r.val_filled is not None
        by_user.setdefault(r.user_id, []).append(r.day)
    for days in by_user.values():
        ds = sorted(datetime.date.fromisoformat(d) for d in days)
        span = (ds[-1] - ds[0]).days + 1
        assert len(ds) == span, "calendar must be dense"
        assert len(set(ds)) == len(ds), "no duplicate days"


def test_chi2_nonnegative_and_dof(spark):
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_chi2_independence,
    )

    row = stat_chi2_independence(spark, SF_DIR).collect()[0]
    assert row.chi2 >= 0.0
    assert row.dof >= 1


def test_corr_bounded(spark):
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_corr_pairs,
    )

    for r in stat_corr_pairs(spark, SF_DIR).collect():
        for c in ("corr_qty_price", "corr_qty_disc", "corr_price_disc"):
            assert -1.0 <= r[c] <= 1.0


def test_pagerank_mass_and_convergence_shape(spark):
    """Fixed-point PageRank sanity: every node retains rank >= the
    teleport base, and high-degree nodes outrank the minimum."""
    from irs_990_efiler_database_spark.queries.graph_ops import (
        _BASE,
        graph_pagerank_5iter,
    )

    rows = graph_pagerank_5iter(spark, SF_DIR).collect()
    assert rows
    assert all(r.pr >= _BASE for r in rows)
    assert max(r.pr for r in rows) > min(r.pr for r in rows)


def test_prefix_filter_exact_recall_superset_of_lsh(spark):
    """Prefix filtering guarantees NO false negatives at the same
    threshold, so its pair set must contain every pair the
    probabilistic MinHash-LSH path reports (LSH can only miss)."""
    from irs_990_efiler_database_spark.queries.dedup_ops import (
        _augmented,
        fdedup_minhash_pairs,
    )
    from irs_990_efiler_database_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    exact = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(
            _augmented(spark, SF_DIR), token_mode="char5"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in fdedup_minhash_pairs(spark, SF_DIR).collect()
    }
    assert lsh <= exact
    # the planted near-copies must all be recalled by the exact path
    planted = {p for p in exact if p[1] == p[0] + 1_000_000}
    assert len(planted) == min(25, len({p[0] for p in planted}) or 25)


def test_triangle_count_matches_bruteforce(spark):
    """Cross-check the ordered two-path triangle count against a
    driver-side brute force over the (small) sf0.001 edge set."""
    from itertools import combinations

    from irs_990_efiler_database_spark.queries.graph_ops import (
        graph_triangle_count,
    )

    row = graph_triangle_count(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    baskets: dict[int, set[int]] = {}
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    pair_counts: Counter = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] += 1
    edges = {p for p, c in pair_counts.items() if c >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    brute = sum(
        1
        for a, nbrs in adj.items()
        for b in nbrs
        for c in adj.get(b, ())
        if c in nbrs
    )
    assert row.n_edges == len(edges)
    assert row.n_triangles == brute


def test_percentile_cont_matches_builtin_exact_percentile(spark):
    """The distributed interpolated percentile must agree with Spark's
    own exact `percentile` aggregate (same (n-1)p linear-interpolation
    rule) on the raw doubles, within float formatting noise."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_percentile_cont_distributed,
    )

    got = {
        r["label"]: r["value"]
        for r in stat_percentile_cont_distributed(spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    ref = o.agg(
        F.expr("percentile(c, array(0.25D, 0.5D, 0.75D, 0.9D))").alias("p")
    ).collect()[0]["p"]
    for lbl, rv in zip(("p25", "p50", "p75", "p90"), ref):
        assert abs(got[lbl] - rv / 100.0) < 1e-6, (lbl, got[lbl], rv / 100.0)


def test_mann_whitney_matches_bruteforce(spark):
    """U and the tie-corrected z must equal a driver-side O(n log n)
    recomputation from tie-averaged ranks at sf0.001."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_mann_whitney_u,
    )

    row = stat_mann_whitney_u(spark, SF_DIR).collect()[0]
    data = [
        (int(r["o_custkey"]) % 2, round(float(r["o_totalprice"]) * 100))
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    ]
    vals = sorted(v for _, v in data)
    # tie-averaged rank per value
    import collections

    cnt = collections.Counter(vals)
    rank = {}
    run = 0
    for v in sorted(cnt):
        rank[v] = run + (cnt[v] + 1) / 2
        run += cnt[v]
    n0 = sum(1 for g, _ in data if g == 0)
    n1 = sum(1 for g, _ in data if g == 1)
    r1 = sum(rank[v] for g, v in data if g == 1)
    u1 = r1 - n1 * (n1 + 1) / 2
    assert abs(row["u1"] - u1) < 1e-9
    n = n0 + n1
    ties = sum(c**3 - c for c in cnt.values())
    var = n0 * n1 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n0 * n1 / 2) / var**0.5
    assert abs(row["z_stat"] - z) < 1e-9


def test_welch_ttest_matches_numpy(spark):
    """t and the Welch–Satterthwaite df must match a numpy
    recomputation over the raw per-arm samples."""
    import numpy as np

    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_welch_ttest,
    )

    row = stat_welch_ttest(spark, SF_DIR).collect()[0]
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    arms = {
        g: np.array(
            [
                round(float(r["value"]) * 100)
                for r in e.filter(
                    (F.col("event_type") == "purchase")
                    & (F.col("user_id") % 2 == g)
                ).collect()
            ],
            dtype=np.float64,
        )
        for g in (0, 1)
    }
    m0, m1 = arms[0].mean(), arms[1].mean()
    v0 = arms[0].var(ddof=1) / len(arms[0])
    v1 = arms[1].var(ddof=1) / len(arms[1])
    t = (m0 - m1) / (v0 + v1) ** 0.5
    df = (v0 + v1) ** 2 / (
        v0**2 / (len(arms[0]) - 1) + v1**2 / (len(arms[1]) - 1)
    )
    assert abs(row["t_stat"] - t) < 1e-6
    assert abs(row["df_welch"] - df) < 1e-3
    assert abs(row["mean0"] - m0 / 100) < 1e-9
    assert abs(row["mean1"] - m1 / 100) < 1e-9


def test_seasonal_decompose_identity_and_trend(spark):
    """Decomposition identity: total == trend + seasonal + residual on
    every full-window day, and the trend equals the 7-day centered
    mean recomputed driver-side."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_seasonal_decompose,
    )

    rows = stat_seasonal_decompose(spark, SF_DIR).collect()
    assert rows
    daily = {r["day"]: r for r in rows}
    days = sorted(daily)
    full = [r for r in rows if r["trend"] is not None]
    assert full, "series long enough for at least one full window"
    for r in full:
        assert abs(
            r["total"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) < 1e-9
        i = days.index(r["day"])
        window = days[i - 3 : i + 4]
        assert len(window) == 7
        mean7 = sum(daily[d]["total"] for d in window) / 7
        assert abs(r["trend"] - mean7) < 1e-6


def test_bootstrap_ci_brackets_mean_and_se_sane(spark):
    """The hash-derived Poisson bootstrap must bracket the point
    estimate, and its SE must land within 2x of the analytic
    sd/sqrt(n) (they estimate the same quantity)."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_bootstrap_ci_poisson,
    )

    r = stat_bootstrap_ci_poisson(spark, SF_DIR).collect()[0]
    assert r["ci_lo"] < r["est_mean"] < r["ci_hi"]
    assert r["boot_se"] > 0
    import math

    vals = [
        float(x["o_totalprice"])
        for x in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    ]
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    analytic = sd / math.sqrt(n)
    assert analytic / 2 < r["boot_se"] < analytic * 2


def test_dsir_upweights_target_language(spark):
    """DSIR importance weights must rank target-language (en)
    documents above the others on average — the property the
    resampling step depends on."""
    from irs_990_efiler_database_spark.queries.text_ops import (
        doc_dsir_importance_weights,
    )

    w = {
        r["doc_id"]: r["dsir_logweight"] / r["n_tokens"]
        for r in doc_dsir_importance_weights(spark, SF_DIR).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    en = [w[d] for d in w if langs[d] == "en"]
    rest = [w[d] for d in w if langs[d] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


@pytest.mark.slow
def test_signgd_matches_pure_python_reimplementation(spark):
    """The distributed signSGD trainer must reproduce, bit for bit, a
    from-scratch single-threaded reimplementation of the same integer
    algorithm — proving the DataFrame composition implements the
    published update rule, not something merely similar."""
    import hashlib
    from collections import Counter, defaultdict

    from irs_990_efiler_database_spark.queries.stats_ops import (
        _SGN_B,
        _SGN_ITERS,
        stat_signgd_text_classifier,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    feat, label = {}, {}
    for r in docs:
        toks = r["text"].strip().lower().split()
        c = Counter(
            int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % _SGN_B
            for w in toks
        )
        feat[r["doc_id"]] = c
        label[r["doc_id"]] = 1 if r["lang"] == "en" else 0
    w = [0] * _SGN_B
    for _ in range(_SGN_ITERS):
        g = defaultdict(int)
        for d, c in feat.items():
            z = sum(w[b] * x for b, x in c.items())
            err = min(max(5000 + 125 * z, 0), 10000) - 10000 * label[d]
            for b, x in c.items():
                g[b] += err * x
        w = [
            w[b] - (1 if g[b] > 0 else -1 if g[b] < 0 else 0)
            for b in range(_SGN_B)
        ]
    expect = {
        d: sum(w[b] * x for b, x in c.items()) for d, c in feat.items()
    }
    got = {
        r["doc_id"]: r
        for r in stat_signgd_text_classifier(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for d, r in got.items():
        assert r["score_u"] == expect[d], f"doc {d}"
        assert r["pred_label"] == (1 if expect[d] > 0 else 0)
        assert r["correct"] == (r["pred_label"] == label[d])


def test_ridge_closed_form_matches_numpy_solve(spark):
    """Cramer's-rule ridge must agree with numpy solving the same
    penalized normal equations on the raw rows."""
    import numpy as np

    from irs_990_efiler_database_spark.queries.stats_ops import (
        _RIDGE_LAMBDA,
        stat_ridge_closed_form,
    )

    rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    x1 = np.array([round(r[0]) for r in rows], dtype=np.float64)
    x2 = np.array([round(r[1] * 100) for r in rows], dtype=np.float64)
    y = np.array([round(r[2] * 100) for r in rows], dtype=np.float64)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    A = X.T @ X + _RIDGE_LAMBDA * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y) / 100
    got = stat_ridge_closed_form(spark, SF_DIR).collect()[0]
    assert got["n"] == len(rows)
    for g, e in zip((got["b0"], got["b1_qty"], got["b2_disc_pct"]), beta):
        assert abs(g - e) < 1e-4, (g, e)


def test_anova_f_matches_scipy_style_computation(spark):
    """The integer-moment ANOVA must agree with a straightforward
    float computation of the same F statistic on the raw rows (the
    floor-division trick costs at most k units on ~1e12-scale sums)."""
    from collections import defaultdict

    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_oneway_anova_f,
    )

    rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    import math

    by_g = defaultdict(list)
    for r in rows:
        # HALF_UP to match Spark/DuckDB round() (Python round() is
        # banker's and disagrees on x.50 prices)
        by_g[r[0]].append(math.floor(r[1] + 0.5))
    n = sum(len(v) for v in by_g.values())
    k = len(by_g)
    s = sum(sum(v) for v in by_g.values())
    ss = sum(x * x for v in by_g.values() for x in v)
    sb = sum(sum(v) ** 2 / len(v) for v in by_g.values())
    msb = (sb - s * s / n) / (k - 1)
    msw = (ss - sb) / (n - k)
    got = stat_oneway_anova_f(spark, SF_DIR).collect()[0]
    assert got["k"] == k and got["n"] == n
    assert abs(got["ms_between"] - msb) / abs(msb) < 1e-6
    assert abs(got["ms_within"] - msw) / abs(msw) < 1e-6
    assert abs(got["f_stat"] - msb / msw) < 1e-4


def test_diff_in_diff_matches_direct_computation(spark):
    """DiD estimate and SE must agree with a direct float computation
    of the same 2x2 design on the raw rows."""
    import math
    from collections import defaultdict

    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.queries.stats_ops import (
        _DID_CUT,
        stat_diff_in_diff,
    )

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "value"
    ).collect()
    cells = defaultdict(list)
    import datetime

    cut = datetime.datetime.fromisoformat(_DID_CUT)
    for r in rows:
        t = r["user_id"] % 2
        p = 1 if r["ts"] >= cut else 0
        cells[(t, p)].append(math.floor(r["value"] * 100 + 0.5) / 100)
    mean = {k: sum(v) / len(v) for k, v in cells.items()}
    var = {
        k: sum((x - mean[k]) ** 2 for x in v) / (len(v) - 1)
        for k, v in cells.items()
    }
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    se = math.sqrt(sum(var[k] / len(cells[k]) for k in cells))
    got = stat_diff_in_diff(spark, SF_DIR).collect()[0]
    assert got["n"] == len(rows)
    assert abs(got["did_estimate"] - did) < 1e-4
    assert abs(got["se"] - se) < 1e-4


def test_calibration_ece_is_gap_mixture(spark):
    """ECE must equal the n-weighted mean of the per-bin |acc − conf|
    gaps, every bin must be internally consistent (conf within the
    bin's 1e-3 probability span, acc ∈ [0,1]), and bin counts must
    cover the corpus exactly once."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_calibration_ece,
    )

    rows = stat_calibration_ece(spark, SF_DIR).collect()
    assert rows
    n_total = sum(r.n_docs for r in rows)
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    assert n_total == n_docs
    mixture = sum(r.n_docs * r.gap for r in rows) / n_total
    assert abs(mixture - rows[0].ece) < 1e-12
    for r in rows:
        assert 0.0 <= r.acc <= 1.0
        assert r.bin * 0.1 <= r.conf < (r.bin + 1) * 0.1 + 1e-12
        assert abs(abs(r.acc - r.conf) - r.gap) < 1e-12


def test_fellegi_sunter_full_agreement_outweighs_all(spark):
    """The all-agree pattern must carry the strictly largest weight
    and the all-disagree pattern the strictly smallest (log2(m/u) >
    log2((1-m)/(1-u)) whenever m > u, which data-exact u-probabilities
    guarantee here); u-probabilities are valid probabilities."""
    from irs_990_efiler_database_spark.queries.dedup_ops import (
        match_fellegi_sunter,
    )

    rows = match_fellegi_sunter(spark, SF_DIR).collect()
    assert rows
    by_pat = {(r.agree_nat, r.agree_seg): r.pattern_weight for r in rows}
    assert 0.0 < rows[0].u_nat < 1.0 and 0.0 < rows[0].u_seg < 1.0
    if (1, 1) in by_pat:
        assert by_pat[(1, 1)] == max(by_pat.values())
    if (0, 0) in by_pat:
        assert by_pat[(0, 0)] == min(by_pat.values())


def test_quantile_normalize_preserves_order_and_pool(spark):
    """Within every source, normalization must preserve the original
    order (it is a monotone rank map); every normalized value must be
    an actual pooled order statistic; extremes map to extremes (the
    source min maps to the pooled min, the source max to the pooled
    max — Bolstad's defining anchor property)."""
    from irs_990_efiler_database_spark.queries.text_ops import (
        doc_quality_quantile_normalize,
    )

    rows = doc_quality_quantile_normalize(spark, SF_DIR).collect()
    assert rows
    pooled = sorted(r.n_chars for r in rows)
    assert set(r.norm_chars for r in rows) <= set(pooled)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.n_chars, r.doc_id))
        norms = [r.norm_chars for r in rs]
        assert norms == sorted(norms), f"order broken in {src}"
        assert norms[0] == pooled[0]
        assert norms[-1] == pooled[-1]


def test_median_ci_brackets_median(spark):
    """The order-statistic CI must bracket the exact sample median,
    and both endpoints must be actual data values."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_median_ci_distribution_free,
    )

    r = stat_median_ci_distribution_free(spark, SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert row.ci_lo <= row.median <= row.ci_hi
    vals = sorted(
        x.o_totalprice
        for x in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    )
    assert row.ci_lo in vals and row.ci_hi in vals
    n = len(vals)
    exact = (vals[(n - 1) // 2] + vals[n // 2]) / 2.0
    assert abs(row.median - exact) < 1e-9
