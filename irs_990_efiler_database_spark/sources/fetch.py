"""Distributed document fetch — the Spark replacement for the
reference's per-URL download loop (build_efile_database_functions.R:
54-68 index files, :5012 `read_xml(URL)` per return, with its try()/
FAIL_LIST bookkeeping at :5047-5101).

The reference fetches ~3M objects serially in the driver process; here
the URL list is a DataFrame partitioned across executors and each
Arrow batch fetches with per-URL retry — failures become rows, not
aborts, so one bad object costs one dead-letter row instead of a
restart. The fetched corpus lands as (url, xml) parquet bundles, the
engine's scale source (`read_return_bundle`), making this the missing
first mile of the pipeline: fetch → bundle → extract.

Any scheme ``urllib`` speaks works (https, s3 via presigned URLs,
file) — ``file://`` URLs make the full path testable offline.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("xml", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def fetch_returns(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    partitions: int | None = None,
    retries: int = 2,
    timeout_sec: float = 30.0,
    ca_file: str | None = None,
) -> DataFrame:
    """Fetch every URL into a (url, xml, error) frame; exactly one of
    xml/error is set per row. Fetching happens on executors
    (mapInPandas), so throughput scales with the cluster, bounded by
    ``partitions`` concurrent streams — the reference's single-process
    loop at 2-4 docs/s becomes cluster-wide parallel I/O.

    ``ca_file`` trusts an additional CA bundle for https URLs (private
    object stores / proxies with an internal CA) ON TOP of the system
    root store — public-CA URLs keep verifying when a custom bundle is
    set. Certificate verification is always ON — there is deliberately
    no "insecure" switch; an untrusted cert dead-letters like any other
    per-URL failure. The path must be readable on every EXECUTOR (ship
    it with ``spark.files`` on a real cluster)."""
    if isinstance(urls, list):
        urls = spark.createDataFrame([(u,) for u in urls], "url string")
    if partitions:
        urls = urls.repartition(partitions)

    def fetch(batches: Iterator) -> Iterator:
        import ssl
        import time as _time
        import urllib.request

        import pandas as pd

        ctx = None
        if ca_file:
            # additive trust: system roots stay loaded so one custom
            # bundle doesn't break every public-CA URL in the batch
            ctx = ssl.create_default_context()
            ctx.load_verify_locations(cafile=ca_file)

        for pdf in batches:
            out = []
            for url in pdf["url"]:
                err, body = None, None
                for attempt in range(retries + 1):
                    try:
                        with urllib.request.urlopen(
                            url, timeout=timeout_sec, context=ctx
                        ) as resp:
                            body = resp.read().decode("utf-8")
                        err = None
                        break
                    except Exception as exc:  # noqa: BLE001 — any fetch failure dead-letters
                        err = f"{type(exc).__name__}: {exc}"
                        if attempt < retries:
                            _time.sleep(0.1 * (2**attempt))
                out.append((url, body, err))
            yield pd.DataFrame(out, columns=["url", "xml", "error"])

    return urls.select("url").mapInPandas(fetch, FETCH_SCHEMA)


def fetch_to_bundle(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    bundle_path: str,
    partitions: int | None = None,
    retries: int = 2,
    dead_letter_path: str | None = None,
    ca_file: str | None = None,
) -> tuple[int, DataFrame]:
    """Fetch → write the scale-source bundle; returns (n_fetched,
    failures frame). Compose with ``build_database(bundle_path=…)``
    for the full fetch → extract pipeline.

    Failures never pass through the driver: they land in a dead-letter
    parquet (default ``<bundle_path>_dead_letter``, same pattern as the
    extract pipeline's parse dead-letters) and the returned frame is
    the lazy read-back — a bad-S3 day on a 3M-doc build stays on the
    executors instead of materializing every (url, error) row in
    driver memory."""
    from ..sinks import write_dead_letter

    if dead_letter_path is None:
        dead_letter_path = bundle_path.rstrip("/") + "_dead_letter"
    fetched = fetch_returns(
        spark, urls, partitions, retries, ca_file=ca_file
    ).persist()
    try:
        ok = fetched.filter(F.col("error").isNull()).select("url", "xml")
        ok.write.mode("overwrite").parquet(bundle_path)
        n = spark.read.parquet(bundle_path).count()
        failures = fetched.filter(F.col("error").isNotNull()).select(
            "url", F.col("error").alias("reason")
        )
        write_dead_letter(failures, dead_letter_path)
        return n, spark.read.parquet(dead_letter_path).select("url", "reason")
    finally:
        fetched.unpersist()
