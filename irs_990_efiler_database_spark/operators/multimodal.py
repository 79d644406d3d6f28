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


def _decode_pixels(fmt: str, payload: bytes, w: int, h: int):
    """Decode one payload to a flat uint8 pixel array of length w*h.

    ``fake/*`` formats read the payload as row-major uint8 pixels,
    zero-padded/truncated to the meta-declared dimensions. Real codec
    formats (image/jpeg, image/png, ...) go through PIL when the
    library is importable — same return contract, so the rest of the
    pipeline is codec-agnostic."""
    import numpy as np

    if not fmt.startswith("fake/"):
        try:  # pragma: no cover - container ships no PIL
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L").resize((w, h))
            return np.asarray(img, dtype=np.uint8).reshape(-1)
        except ImportError as exc:
            raise NotImplementedError(
                f"real-codec decode for {fmt!r} needs PIL; only fake/* "
                "payloads decode in this container"
            ) from exc
    buf = np.frombuffer(payload, dtype=np.uint8)
    px = np.zeros(w * h, dtype=np.uint8)
    px[: min(buf.size, w * h)] = buf[: w * h]
    return px


def decode_image(media: DataFrame) -> DataFrame:
    """Decode images to pixel stats via Arrow-batched mapInPandas.

    Real codecs (PIL) are used when importable; otherwise the
    deterministic fake decode reads the payload as row-major uint8
    pixels of the meta-declared (width, height), zero-padded.
    The batch loop iterates zipped columns (no ``iterrows`` — Arrow
    already delivered columnar batches; keep them columnar)."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, w, h, fmt, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["format"], pdf["payload"],
            ):
                px = _decode_pixels(fmt, payload, int(w), int(h))
                out.append(
                    (
                        int(mid),
                        int(w),
                        int(h),
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


def _batch_histograms(pdf, bins: int):
    """(n_rows, bins) byte-bin counts for one Arrow batch — one
    concatenated bincount over the whole batch, zero per-row Python."""
    import numpy as np

    shift = 8 - bins.bit_length() + 1
    payloads = pdf["payload"].tolist()
    lens = np.fromiter(
        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
    )
    row_idx = np.repeat(np.arange(len(payloads)), lens)
    allb = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    keys = row_idx * bins + (allb >> shift)
    hist = np.bincount(keys, minlength=len(payloads) * bins).reshape(
        len(payloads), bins
    )
    return hist, lens


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """L1-normalized byte-histogram feature vector per payload — the
    feature-extraction slot (swap in an encoder model's embedding
    without changing the plumbing). Arrow-batched, vectorized numpy."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"media_id": [], "features": []})
                continue
            hist, _ = _batch_histograms(pdf, bins)
            totals = np.maximum(hist.sum(axis=1), 1)
            feats = (hist / totals[:, None]).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "features": list(feats),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, _HIST_SCHEMA)


_HIST_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("weight", T.DoubleType()),
    ]
)


def byte_histogram_rows(media: DataFrame, bins: int = 16) -> DataFrame:
    """Exploded byte-histogram: one row per (payload, non-empty bin)
    with exact count and IEEE-double weight = cnt / n_bytes.

    This is the hashable/SQL-portable shape of
    ``byte_histogram_features`` (a raw array<float> column can't be
    value-hashed by an external comparator); the division is a single
    deterministic double op, so an ANSI-SQL oracle reproduces it
    bit-exactly."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _HIST_ROWS_SCHEMA.fields]
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            hist, lens = _batch_histograms(pdf, bins)
            rows_i, bins_i = np.nonzero(hist)
            cnts = hist[rows_i, bins_i]
            ids = pdf["media_id"].to_numpy(dtype=np.int64)[rows_i]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "bin": bins_i.astype(np.int32),
                    "cnt": cnts.astype(np.int64),
                    "weight": cnts / lens[rows_i],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, _HIST_ROWS_SCHEMA
    )


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image to (width, height) — nearest-neighbor over
    the decoded pixel grid, payload re-encoded, meta rewritten.

    Decoding goes through ``_decode_pixels``: fake/* payloads resample
    the zero-padded row-major grid (deterministic, no media libs
    needed); real codec formats use PIL when importable. Non-image
    rows pass through unchanged, so the output keeps the media
    schema."""
    import numpy as np
    import pandas as pd

    out_schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                px = _decode_pixels(meta["format"], payload, w, h).reshape(h, w)
                rr = (np.arange(height) * h) // height
                cc = (np.arange(width) * w) // width
                resized = px[np.ix_(rr, cc)]
                new_payload = resized.tobytes()
                new_meta = dict(meta)
                new_meta.update(
                    width=width, height=height, n_bytes=len(new_payload)
                )
                payloads.append(new_payload)
                metas.append(new_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, out_schema)


_RMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_ix", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_window_rms(media: DataFrame, window: int = 100) -> DataFrame:
    """Windowed RMS energy over decoded audio samples — the feature
    pass of an audio-curation pipeline (silence/clipping detection,
    energy-based segmentation).

    Fake-codec decode reads payload bytes as uint8 samples; a real
    PCM/WAV decoder slots into the same batch loop. The whole batch is
    processed with THREE numpy bincounts over a concatenated buffer —
    no per-row Python, no per-window Python. Arithmetic is exact until
    the final double division + sqrt (sum of squares ≤ 255²·window per
    window, exact in float64), so the DuckDB oracle reproduces every
    value bit-for-bit from the ASCII corpus."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"].tolist()
            if not payloads:
                continue
            ids = pdf["media_id"].to_numpy()
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            nwin = (lens + window - 1) // window
            allb = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(
                np.int64
            )
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(allb.size) - np.repeat(starts, lens)
            woff = np.concatenate([[0], np.cumsum(nwin)[:-1]])
            keys = np.repeat(woff, lens) + pos // window
            tot = int(nwin.sum())
            sumsq = np.bincount(keys, weights=allb * allb, minlength=tot)
            cnt = np.bincount(keys, minlength=tot)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(ids, nwin),
                    "window_ix": np.arange(tot) - np.repeat(woff, nwin),
                    "n_samples": cnt,
                    "rms": np.sqrt(sumsq / cnt),
                }
            )

    audio = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return audio.mapInPandas(batches, _RMS_SCHEMA)


_ZCR_SCHEMA = (
    "media_id long, window_ix long, n_samples long, zero_crossings long, "
    "mean_abs_dev double"
)


def audio_zero_crossing(
    media: DataFrame, window: int = 100, center: int = 96
) -> DataFrame:
    """Windowed zero-crossing rate + mean absolute deviation over
    decoded audio samples — the cheap voiced/unvoiced + energy
    screen of an audio-curation pipeline (ZCR is the classic
    speech/music/noise discriminator; MAD is the clip-level loudness).

    Samples center on ``center`` (the fake codec reads uint8 text
    bytes; a real PCM decoder is already signed and uses center=0). A
    crossing is a STRICTLY sign-flipping adjacent pair inside one
    window (product < 0 — zeros don't count, the engine-portable
    rule). Same whole-batch vectorization as ``audio_window_rms``:
    one concatenated buffer, three bincounts, no per-row Python;
    arithmetic is integer-exact until the final MAD division."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"].tolist()
            if not payloads:
                continue
            ids = pdf["media_id"].to_numpy()
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            nwin = (lens + window - 1) // window
            allb = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(
                np.int64
            )
            c = allb - center
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(allb.size) - np.repeat(starts, lens)
            woff = np.concatenate([[0], np.cumsum(nwin)[:-1]])
            keys = np.repeat(woff, lens) + pos // window
            tot = int(nwin.sum())
            # a pair (i, i+1) is eligible iff i+1 is in the SAME doc
            # (pos < len-1) and the SAME window (pos % window != last)
            eligible = (pos < np.repeat(lens, lens) - 1) & (
                pos % window != window - 1
            )
            flip = np.zeros(allb.size, dtype=bool)
            if allb.size > 1:
                flip[:-1] = (c[:-1] * c[1:]) < 0
            flips = (flip & eligible).astype(np.float64)
            zc = np.bincount(keys, weights=flips, minlength=tot)
            sumabs = np.bincount(
                keys, weights=np.abs(c).astype(np.float64), minlength=tot
            )
            cnt = np.bincount(keys, minlength=tot)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(ids, nwin),
                    "window_ix": np.arange(tot) - np.repeat(woff, nwin),
                    "n_samples": cnt,
                    "zero_crossings": zc.astype(np.int64),
                    "mean_abs_dev": sumabs / cnt,
                }
            )

    audio = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return audio.mapInPandas(batches, _ZCR_SCHEMA)
