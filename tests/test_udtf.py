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
