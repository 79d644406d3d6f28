"""Python UDTF API surface (SURVEY §2.12): a table-generating function
registered through ``spark.udtf.register`` and invoked via LATERAL must
reproduce the native sequence+slice chunker row-for-row.

The UDTF is the API-coverage twin of ``text_chunk_fixed`` — row-at-a-
time Python is the slow path, so the gated query stays native and this
parity test pins the UDTF to it."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_udtf_chunker_matches_native(spark):
    from pyspark.sql.functions import udtf

    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.queries.text_ops import text_chunk_fixed

    @udtf(returnType="chunk_ix: bigint, n_tokens: bigint, chunk_md5: string")
    class ChunkDoc:
        def eval(self, text: str):
            import hashlib
            import re

            toks = re.split(r"\s+", text.strip())
            for j in range((len(toks) + 49) // 50):
                piece = toks[j * 50 : (j + 1) * 50]
                chunk = " ".join(piece)
                yield (
                    j,
                    len(piece),
                    hashlib.md5(chunk.encode()).hexdigest(),
                )

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_ix, c.n_tokens, c.chunk_md5
        FROM docs_udtf d, LATERAL chunk_doc(d.text) c
        """
    )
    want = text_chunk_fixed(spark, SF_SMOKE)
    cols = ["doc_id", "chunk_ix", "n_tokens", "chunk_md5"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_udtf_dynamic_schema_via_analyze(spark):
    """Polymorphic UDTF: ``analyze()`` derives the OUTPUT SCHEMA from a
    constant argument at plan time (here: the first-k-tokens splitter
    widens to k columns), the Spark-4 surface a static returnType can't
    express — the shape schema-on-demand ingestion helpers need.
    Values pinned to the native split()/getItem twin."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    from irs_990_efiler_database_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            assert k.isConstantExpression and k.value is not None
            schema = StructType()
            for i in range(int(k.value)):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            toks = (text or "").split()
            yield tuple(toks[i] if i < len(toks) else None for i in range(k))

    spark.udtf.register("split_fixed", SplitFixed)
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.createOrReplaceTempView("docs_dyn_udtf")
    got = spark.sql(
        """
        SELECT d.doc_id, s.tok0, s.tok1, s.tok2
        FROM docs_dyn_udtf d, LATERAL split_fixed(d.text, 3) s
        """
    )
    assert [f.name for f in got.schema.fields] == [
        "doc_id", "tok0", "tok1", "tok2",
    ]
    # split with -1 limit drops NO trailing empties; tokens() via
    # whitespace split matches str.split() for this corpus
    sp = F.split(F.col("text"), r"\s+")
    want = docs.select(
        "doc_id",
        sp.getItem(0).alias("tok0"),
        sp.getItem(1).alias("tok1"),
        sp.getItem(2).alias("tok2"),
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b and a
