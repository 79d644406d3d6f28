"""Regression pins for the plan_audit gate checks (VERDICT r5 #1b/#7):
the HOF-lambda recompute detector must fire on the inlined-recompute
plan shapes that actually shipped (three rounds running) and stay
silent on the fixed formulations — so the gate itself can't silently
rot. The static Window.orderBy annotation scan is pinned on a temp
package tree."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _viol(df):
    from plan_audit import hof_recompute_violations

    return hof_recompute_violations(df._jdf.queryExecution().executedPlan())


def test_hof_detector_fires_on_inlined_split(spark):
    """The 27x class: element_at(split(text), i) inside a transform
    lambda re-runs the tokenizer per element."""
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bad = d.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda i: F.element_at(F.split(F.col("text"), " "), i + 1),
        ).alias("g")
    )
    found = _viol(bad)
    assert found and any("split" in v for v in found)


def test_hof_detector_fires_on_collapsed_projection(spark):
    """CollapseProject re-inlines a SINGLE-use materialized array into
    the lambda — source-level two-projection discipline alone is not
    enough; the detector must judge the EXECUTED plan."""
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    w = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    # single use of toks → the optimizer collapses the projections
    bad = w.select(
        F.transform(
            F.sequence(F.lit(1), F.lit(3)),
            lambda i: F.element_at(F.col("toks"), i),
        ).alias("g")
    )
    assert _viol(bad), "expected the collapsed single-use alias to fire"


def test_hof_detector_fires_through_generate(spark):
    """A Generate (explode) over a single-use gram array inlines the
    lambda regardless of projection structure — the shape that
    silently regressed text_boilerplate_ngrams in r5."""
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    w = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    tk = F.col("toks")
    g3 = F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bad = w.select("doc_id", g3.alias("g3")).select(
        "doc_id", F.explode("g3").alias("g")
    )
    assert _viol(bad)


def test_hof_detector_clean_on_multiref_attribute(spark):
    """The fixed form: the token array is an attribute referenced >=2
    times (size bound + lambda), so CollapseProject keeps the
    projection and the lambda touches only the attribute."""
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    w = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    tk = F.col("toks")
    good = w.select(
        "doc_id",
        F.when(
            F.size(tk) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 2),
                lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("g3"),
    )
    assert _viol(good) == []


def test_hof_detector_clean_on_explode_positions(spark):
    """The explode-positions form has no HOF at all: tokens below the
    Generate, one codegen'd slice per gram above it."""
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    w = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    good = w.select(
        "doc_id",
        "toks",
        F.explode(
            F.when(
                F.size("toks") >= 3, F.sequence(F.lit(1), F.size("toks") - 2)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    ).select(
        "doc_id", F.concat_ws(" ", F.slice("toks", F.col("pos"), 3)).alias("g")
    )
    assert _viol(good) == []


def test_hof_detector_allows_lambda_var_work(spark):
    """Per-element work on the lambda variable itself is the point of
    a HOF — must not fire. Constant folding of literals is fine too."""
    d = spark.createDataFrame([(1, ["a", "b"])], "id long, xs array<string>")
    ok = d.select(
        F.transform("xs", lambda x: F.upper(x)).alias("u"),
        F.filter("xs", lambda x: F.length(x) > 0).alias("f"),
        F.aggregate(
            "xs", F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("s"),
    )
    assert _viol(ok) == []


def test_registered_gram_queries_stay_clean(spark):
    """The production n-gram/shingle plans the detector was built for
    stay clean end-to-end (regression pin on the executed plans at
    the smallest SF)."""
    from irs_990_efiler_database_spark.queries import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "text_boilerplate_ngrams",
        "text_decontaminate_13gram",
        "text_top_bigrams",
        "text_pmi_collocations",
        "text_ngram_novelty",
        "fdedup_minhash_signature",
        "fdedup_prefix_filter_pairs",
    ):
        df = qs[name](spark, sf)
        assert _viol(df) == [], name
        spark.catalog.clearCache()


def test_window_annotation_scan(tmp_path, monkeypatch):
    """The static scan flags an unannotated Window.orderBy call site,
    accepts an annotated one, and ignores docstring mentions."""
    import plan_audit

    pkg = tmp_path / "irs_990_efiler_database_spark"
    pkg.mkdir()
    (pkg / "annotated.py").write_text(
        "from pyspark.sql import Window\n"
        "# bounded-window: input is a 10-row aggregate\n"
        "w = Window.orderBy('x')\n"
    )
    (pkg / "unannotated.py").write_text(
        "from pyspark.sql import Window\n"
        "w = Window.orderBy('x')\n"
    )
    (pkg / "docstring_only.py").write_text(
        '"""Mentions Window.orderBy(...) in prose only."""\n'
    )
    # an aliased import must not evade the contract
    (pkg / "aliased.py").write_text(
        "from pyspark.sql import Window as W\n"
        "w = W.orderBy('x')\n"
    )
    monkeypatch.setattr(plan_audit, "REPO", tmp_path)
    out = plan_audit.window_annotation_violations()
    assert len(out) == 2
    assert any("unannotated.py:2" in v for v in out)
    assert any("aliased.py:2" in v for v in out)
