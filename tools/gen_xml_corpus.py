"""Deterministic synthetic 990 corpus generator: replicates the fixture
XML matrix with fresh EINs/ObjectIds into a parquet bundle of
(url, xml) — used by bench.py to measure end-to-end extraction
throughput (the reference's own headline metric: ≈2–4 docs/sec on a
single R process, BUILD_SCRIPTS/README.md:258)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURES = sorted((REPO / "tests" / "fixtures").glob("*.xml"))


def gen_rows(n_docs: int) -> list[tuple[str, str]]:
    rows = []
    texts = [p.read_text() for p in FIXTURES]
    for i in range(n_docs):
        xml = texts[i % len(texts)]
        ein = f"{500000000 + i}"
        obj = f"2014{700000000 + i}"
        xml = re.sub(r"<EIN>1000000\d\d</EIN>", f"<EIN>{ein}</EIN>", xml, count=1)
        rows.append((f"file:///synthetic/{obj}_public.xml", xml))
    return rows


def gen_bundle(spark, out_path: str, n_docs: int, partitions: int = 32) -> None:
    df = spark.createDataFrame(gen_rows(n_docs), ["url", "xml"])
    df.repartition(partitions).write.mode("overwrite").parquet(out_path)


if __name__ == "__main__":
    from irs_990_efiler_database_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xml_bundle"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    gen_bundle(get_spark("gen-corpus"), out, n)
    print(f"wrote {n} docs to {out}")
