"""Multimodal-column operators under the oracle gate.

The synthetic media corpus is deterministically derived from
``documents`` (payload = UTF-8 bytes of text, metadata = arithmetic on
byte length), and the corpus text is pure ASCII at every SF — so the
DuckDB oracle mirrors binary operations with character operations
(1 char == 1 byte) and even the Arrow-batched mapInPandas decode path
gets an exact SQL oracle (padded-pixel stats as ascii() sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    FRAME_BYTES,
    byte_histogram_rows,
    decode_image,
    sample_frames,
    synthetic_media,
)
from . import register

_SQL_MEDIA = """
  media AS (
    SELECT doc_id AS media_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           text AS t,
           octet_length(encode(text)) AS nb,
           CAST(16 + octet_length(encode(text)) % 48 AS INT) AS w
    FROM documents
  )
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthetic_media(load_table(spark, sf_dir, "documents", rebalance=False))


@register(
    "mm_media_catalog",
    oracle=f"""
    WITH {_SQL_MEDIA}
    SELECT media_id, kind, nb AS n_bytes,
           CASE WHEN kind = 'image' THEN w END AS width,
           CASE WHEN kind = 'image' THEN CAST(floor(nb / w) + 1 AS INT) END AS height,
           CASE WHEN kind = 'video' THEN CAST(floor(nb / {FRAME_BYTES}.0) AS INT) END AS n_frames,
           CASE WHEN kind = 'audio' THEN 16000 END AS sample_rate,
           concat('fake/', kind) AS format
    FROM media
    """,
)
def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed-metadata view of the media corpus — the columns a
    100 TB pipeline filters/partitions on without touching payload
    bytes."""
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.format").alias("format"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH {_SQL_MEDIA},
    vids AS (
      SELECT media_id, t, CAST(floor(nb / {FRAME_BYTES}.0) AS INT) AS n_frames
      FROM media WHERE kind = 'video'
    )
    SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
           CAST(octet_length(encode(substring(t, i * {FRAME_BYTES} + 1, {FRAME_BYTES}))) AS INT) AS frame_bytes,
           md5(substring(t, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM vids, unnest(generate_series(0, n_frames - 1)) AS u(i)
    WHERE n_frames > 0 AND i % 4 = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling of video payloads — native binary
    slicing + explode; the oracle mirrors bytes with ASCII chars."""
    return sample_frames(_media(spark, sf_dir), every=4).select(
        "media_id",
        "frame_idx",
        F.length("frame").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


@register(
    "mm_decode_stats",
    oracle=f"""
    WITH {_SQL_MEDIA},
    imgs AS (
      SELECT media_id, t, nb, w,
             CAST(floor(nb / w) + 1 AS INT) AS h
      FROM media WHERE kind = 'image'
    )
    SELECT media_id, w AS width, h AS height,
           CAST(list_sum(list_transform(
                  generate_series(1, least(nb, w * h)),
                  i -> ascii(substring(t, i, 1))))
                AS DOUBLE) / (w * h) AS mean_px,
           CASE WHEN w * h > nb THEN 0
                ELSE list_min(list_transform(generate_series(1, nb),
                       i -> ascii(substring(t, i, 1)))) END AS min_px,
           list_max(list_transform(generate_series(1, least(nb, w * h)),
                  i -> ascii(substring(t, i, 1)))) AS max_px
    FROM imgs
    """,
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched mapInPandas decode path (fake codec: payload
    bytes as row-major uint8 pixels, zero-padded) — pixel stats per
    image, exact-oracled against ascii() sums."""
    return decode_image(_media(spark, sf_dir))


@register(
    "mm_byte_histogram",
    oracle=f"""
    WITH {_SQL_MEDIA}
    SELECT media_id, CAST(bin AS INT) AS bin,
           count(*) AS cnt,
           CAST(count(*) AS DOUBLE) / nb AS weight
    FROM (
      SELECT media_id, nb,
             ascii(substring(t, i, 1)) // 16 AS bin
      FROM media, unnest(generate_series(1, nb)) AS u(i)
      WHERE nb > 0
    )
    GROUP BY media_id, nb, bin
    """,
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin byte-histogram features per payload, exploded to one row
    per non-empty bin (mapInPandas; the embedding-model slot). The
    weight is a single cnt/n_bytes double division, so the ASCII
    corpus gets an exact DuckDB oracle; the array<float> feature shape
    is covered by ``byte_histogram_features`` under pytest."""
    return byte_histogram_rows(_media(spark, sf_dir))


@register(
    "mm_audio_window_rms",
    oracle="""
    WITH a AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    s AS (
      SELECT media_id,
             unnest(generate_series(1, length(text))) AS i,
             text
      FROM a
    ),
    v AS (
      SELECT media_id,
             CAST((i - 1) // 100 AS BIGINT) AS window_ix,
             ascii(substring(text, i, 1)) AS val
      FROM s
    )
    SELECT media_id, window_ix,
           COUNT(*) AS n_samples,
           sqrt(CAST(SUM(val * val) AS DOUBLE) / COUNT(*)) AS rms
    FROM v
    GROUP BY media_id, window_ix
    """,
)
def mm_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS over fake-decoded audio samples (100-sample
    windows): vectorized Arrow batches, three bincounts per batch,
    zero per-row Python (operators.multimodal.audio_window_rms). The
    ASCII corpus lets the oracle recompute each sample as ascii(char),
    so every RMS double is hash-compared."""
    from ..operators.multimodal import audio_window_rms, synthetic_media

    media = synthetic_media(load_table(spark, sf_dir, "documents", rebalance=False))
    return audio_window_rms(media)


_AH_VEC_SQL = ", ".join(
    f"SUM(CASE WHEN bin = {i} THEN cnt ELSE 0 END)" for i in range(16)
)
_AH_HASH_SQL = " + ".join(
    f"CASE WHEN 16 * cv[{i + 1}] > nb THEN {1 << i} ELSE 0 END"
    for i in range(16)
)
_AH_L1_SQL = (
    "list_sum(list_transform(generate_series(1, 16), "
    "i -> abs(a.cv[i] * b.nb - b.cv[i] * a.nb)))"
)


@register(
    "mm_ahash_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25
    ),
    media AS (
      SELECT doc_id AS media_id, text AS t,
             octet_length(encode(text)) AS nb
      FROM base
    ),
    h AS (
      SELECT media_id, ascii(substring(t, i, 1)) // 16 AS bin
      FROM media, unnest(generate_series(1, nb)) AS u(i)
      WHERE nb > 0
    ),
    hh AS (
      SELECT media_id, bin, COUNT(*) AS cnt FROM h GROUP BY media_id, bin
    ),
    vec AS (
      SELECT media_id, [{_AH_VEC_SQL}] AS cv, SUM(cnt) AS nb
      FROM hh GROUP BY media_id
    ),
    vech AS (
      SELECT media_id, cv, nb, CAST({_AH_HASH_SQL} AS BIGINT) AS ahash
      FROM vec
    ),
    cap AS (
      SELECT ahash FROM vech GROUP BY ahash HAVING COUNT(*) <= 1000
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b, a.ahash,
           round(CAST({_AH_L1_SQL} AS DOUBLE) / (a.nb * b.nb), 9) AS l1
    FROM vech a
    JOIN cap USING (ahash)
    JOIN vech b ON a.ahash = b.ahash AND a.media_id < b.media_id
    WHERE CAST({_AH_L1_SQL} AS DOUBLE) / (a.nb * b.nb) <= 0.01
    """,
)
def mm_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over media payloads —
    the multimodal twin of the text LSH funnel: the Arrow-batched
    byte-histogram features (the embedding-model slot) collapse to a
    16-bit average-hash (bit b set where bin b holds more than the
    uniform 1/16 of the bytes — an INTEGER test, 16·cnt > n), candidate
    pairs must share the hash (equi-join behind the standard hot-bucket
    cap — never all pairs), and survivors verify on exact L1 histogram
    distance computed in integer cross-multiplied counts
    (Σ|cntA·nB − cntB·nA| / (nA·nB)) so the only floating-point op is
    one final division — no accumulation-order or rounding-tie risk in
    the hash gate. Planted exact copies (media_id + 1e6) are the truth
    set: identical histogram, L1 = 0."""
    from ..operators.dedup import cap_hot_buckets

    d = load_table(spark, sf_dir, "documents", rebalance=False).select("doc_id", "text")
    aug = d.unionByName(
        d.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    hist = byte_histogram_rows(synthetic_media(aug))
    vec = hist.groupBy("media_id").agg(
        F.array(
            *[
                F.sum(F.when(F.col("bin") == i, F.col("cnt")).otherwise(0))
                for i in range(16)
            ]
        ).alias("cv"),
        F.sum("cnt").alias("nb"),
    )
    ahash = None
    for i in range(16):
        bit = F.when(16 * F.col("cv")[i] > F.col("nb"), F.lit(1 << i)).otherwise(0)
        ahash = bit if ahash is None else ahash + bit
    vech = vec.select("media_id", "cv", "nb", ahash.cast("long").alias("ahash"))
    vech = cap_hot_buckets(vech, ["ahash"], 1000)
    a, b = vech.alias("a"), vech.alias("b")
    l1num = F.aggregate(
        F.zip_with(
            F.col("a.cv"),
            F.col("b.cv"),
            lambda x, y: F.abs(x * F.col("b.nb") - y * F.col("a.nb")),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    l1 = l1num.cast("double") / (F.col("a.nb") * F.col("b.nb"))
    return (
        a.join(
            b,
            (F.col("a.ahash") == F.col("b.ahash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.ahash").alias("ahash"),
            F.round(l1, 9).alias("l1"),
            l1.alias("_l1raw"),
        )
        .filter(F.col("_l1raw") <= 0.01)
        .drop("_l1raw")
    )


@register(
    "mm_payload_entropy",
    oracle=f"""
    WITH {_SQL_MEDIA},
    hist AS (
      SELECT media_id, nb, bin, count(*) AS cnt
      FROM (
        SELECT media_id, nb,
               ascii(substring(t, i, 1)) // 16 AS bin
        FROM media, unnest(generate_series(1, nb)) AS u(i)
        WHERE nb > 0
      )
      GROUP BY media_id, nb, bin
    ),
    terms AS (
      SELECT media_id, nb,
             CAST(round(-(CAST(cnt AS DOUBLE) / nb)
                        * ln(CAST(cnt AS DOUBLE) / nb), 9)
                  AS DECIMAL(24,12)) AS h
      FROM hist
    )
    SELECT media_id, CAST(MAX(nb) AS BIGINT) AS n_bytes,
           CAST(SUM(h) AS DOUBLE) AS entropy_nats
    FROM terms GROUP BY media_id
    """,
)
def mm_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-entropy screen per payload: Shannon entropy (nats) of the
    16-bin byte histogram — the compressibility probe that flags
    corrupt, encrypted, or constant-fill media before expensive
    decoding (already-compressed/encrypted payloads sit near the
    ln(16) ceiling; constant fills near 0). Builds on the Arrow-batched
    histogram rows; per-bin -p ln p terms round to 9 dp and accumulate
    in DECIMAL, so the per-payload sum is order-free cross-engine."""
    from ..operators.multimodal import byte_histogram_rows

    hist = byte_histogram_rows(_media(spark, sf_dir))
    # weight IS cnt/n_bytes (one exact IEEE division in the operator),
    # so it is the probability term; n_bytes is recovered via round()
    # because cnt/weight re-divides and can land one ulp under the int
    p = F.col("weight")
    term = F.round(-p * F.log(p), 9).cast("decimal(24,12)")
    return (
        hist.withColumn(
            "nb", F.round(F.col("cnt") / F.col("weight")).cast("long")
        )
        .select("media_id", "nb", term.alias("h"))
        .groupBy("media_id")
        .agg(
            F.max("nb").cast("long").alias("n_bytes"),
            F.sum("h").cast("double").alias("entropy_nats"),
        )
    )


@register(
    "mm_scene_change",
    oracle=f"""
    WITH {_SQL_MEDIA},
    vids AS (
      SELECT media_id, t, CAST(floor(nb / {FRAME_BYTES}.0) AS INT) AS n_frames
      FROM media WHERE kind = 'video'
    ),
    chars AS (
      SELECT media_id, i AS frame_idx,
             ascii(substring(t, i * {FRAME_BYTES} + j, 1)) // 16 AS bin
      FROM vids,
           unnest(generate_series(0, n_frames - 1)) AS u(i),
           unnest(generate_series(1, {FRAME_BYTES})) AS v(j)
      WHERE n_frames > 1
    ),
    spine AS (
      SELECT DISTINCT media_id, frame_idx, b.bin
      FROM chars, (SELECT unnest(generate_series(0, 15)) AS bin) b
    ),
    hist AS (
      SELECT s.media_id, s.frame_idx, s.bin,
             COALESCE(c.cnt, 0) AS cnt
      FROM spine s
      LEFT JOIN (
        SELECT media_id, frame_idx, bin, COUNT(*) AS cnt
        FROM chars GROUP BY 1, 2, 3
      ) c USING (media_id, frame_idx, bin)
    )
    SELECT a.media_id, a.frame_idx,
           CAST(SUM(abs(a.cnt - b.cnt)) AS BIGINT) AS l1_delta,
           SUM(abs(a.cnt - b.cnt)) >= 64 AS is_cut
    FROM hist a
    JOIN hist b ON b.media_id = a.media_id
               AND b.frame_idx = a.frame_idx - 1
               AND b.bin = a.bin
    GROUP BY a.media_id, a.frame_idx
    """,
)
def mm_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change (shot-boundary) detection over video payloads:
    consecutive frames' 16-bin byte histograms compared by L1
    distance; a delta >= 64 (a quarter of the frame changing bins)
    flags a cut — the keyframe-selection primitive that decides which
    frames are worth the expensive captioning/embedding pass.

    Shape here is the fully-native one (frame explode + per-frame bin
    counts + dense bin spine + a self-join on frame_idx-1); at real
    payload sizes the per-frame histogram comes from the Arrow-batched
    byte_histogram_features path instead — same downstream delta
    logic."""
    from ..operators.multimodal import FRAME_BYTES, sample_frames

    frames = sample_frames(_media(spark, sf_dir), every=1).select(
        "media_id",
        "frame_idx",
        F.col("frame").cast("string").alias("fs"),
    )
    chars = frames.select(
        "media_id",
        "frame_idx",
        "fs",
        F.explode(F.sequence(F.lit(1), F.lit(FRAME_BYTES))).alias("j"),
    ).select(
        "media_id",
        "frame_idx",
        (F.ascii(F.expr("substring(fs, j, 1)")) / 16)
        .cast("long")
        .alias("bin"),
    )
    counts = chars.groupBy("media_id", "frame_idx", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spine = (
        frames.select("media_id", "frame_idx")
        .distinct()
        .select(
            "media_id",
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bin"),
        )
    )
    hist = spine.join(counts, ["media_id", "frame_idx", "bin"], "left").select(
        "media_id",
        "frame_idx",
        "bin",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )
    prev = hist.select(
        "media_id",
        (F.col("frame_idx") + 1).alias("frame_idx"),
        "bin",
        F.col("cnt").alias("pcnt"),
    )
    delta = (
        hist.join(prev, ["media_id", "frame_idx", "bin"])
        .groupBy("media_id", "frame_idx")
        .agg(F.sum(F.abs(F.col("cnt") - F.col("pcnt"))).alias("l1_delta"))
    )
    return delta.select(
        "media_id",
        "frame_idx",
        F.col("l1_delta").cast("long").alias("l1_delta"),
        (F.col("l1_delta") >= 64).alias("is_cut"),
    )


@register(
    "mm_audio_silence_spans",
    oracle="""
    WITH a AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    s AS (
      SELECT media_id,
             unnest(generate_series(1, length(text))) AS i,
             text
      FROM a
    ),
    v AS (
      SELECT media_id,
             CAST((i - 1) // 100 AS BIGINT) AS window_ix,
             ascii(substring(text, i, 1)) AS val
      FROM s
    ),
    w AS (
      SELECT media_id, window_ix,
             sqrt(CAST(SUM(val * val) AS DOUBLE) / COUNT(*)) < 105.0
               AS quiet
      FROM v GROUP BY media_id, window_ix
    ),
    isl AS (
      SELECT media_id, window_ix,
             window_ix - ROW_NUMBER() OVER (PARTITION BY media_id
                                            ORDER BY window_ix) AS grp
      FROM w WHERE quiet
    )
    SELECT media_id,
           CAST(MIN(window_ix) AS BIGINT) AS span_start,
           CAST(MAX(window_ix) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl
    GROUP BY media_id, grp
    """,
)
def mm_audio_silence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-span extraction over audio payloads: windows whose RMS
    falls below a threshold collapse into maximal consecutive spans
    via the gaps-and-islands key (window_ix minus its rank) — the
    trim/segment primitive an audio pipeline runs before transcribing.
    The RMS threshold compares doubles both engines derive from the
    same exact integer sums, and the span arithmetic is pure
    integers."""
    from ..operators.multimodal import audio_window_rms

    from pyspark.sql import Window as W

    rms = audio_window_rms(_media(spark, sf_dir))
    quiet = rms.filter(F.col("rms") < 105.0).select("media_id", "window_ix")
    w = W.partitionBy("media_id").orderBy("window_ix")
    isl = quiet.withColumn(
        "grp", F.col("window_ix") - F.row_number().over(w)
    )
    return isl.groupBy("media_id", "grp").agg(
        F.min("window_ix").cast("long").alias("span_start"),
        F.max("window_ix").cast("long").alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
    ).drop("grp")


@register(
    "mm_audio_zero_crossing",
    oracle="""
    WITH a AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    s AS (
      SELECT media_id,
             unnest(generate_series(1, length(text))) AS i,
             text
      FROM a
    ),
    v AS (
      SELECT media_id,
             CAST((i - 1) // 100 AS BIGINT) AS window_ix,
             i,
             ascii(substring(text, i, 1)) - 96 AS c
      FROM s
    ),
    p AS (
      SELECT media_id, window_ix, c, i,
             LEAD(c) OVER (PARTITION BY media_id ORDER BY i) AS nxt,
             ((i - 1) // 100 = i // 100) AS same_window
      FROM v
    )
    SELECT media_id, window_ix,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(CASE WHEN nxt IS NOT NULL AND same_window
                          AND c * nxt < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings,
           CAST(SUM(ABS(c)) AS DOUBLE) / COUNT(*) AS mean_abs_dev
    FROM p
    GROUP BY media_id, window_ix
    """,
)
def mm_audio_zero_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed zero-crossing rate + mean absolute deviation over
    fake-decoded audio (100-sample windows, center 96): the classic
    voiced/unvoiced + loudness screen, vectorized as three numpy
    bincounts per Arrow batch with zero per-row Python
    (operators.multimodal.audio_zero_crossing). A crossing is a
    strictly sign-flipping adjacent pair INSIDE one window — the
    oracle states the same rule with LEAD over the ascii-decoded
    corpus, so every count and MAD double is hash-compared."""
    from ..operators.multimodal import audio_zero_crossing, synthetic_media

    media = synthetic_media(load_table(spark, sf_dir, "documents", rebalance=False))
    return audio_zero_crossing(media)


_DH_HASH_SQL = " + ".join(
    f"CASE WHEN cv[{i + 1}] > cv[{i + 2}] THEN {1 << i} ELSE 0 END"
    for i in range(15)
)


@register(
    "mm_dhash_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25
    ),
    media AS (
      SELECT doc_id AS media_id, text AS t,
             octet_length(encode(text)) AS nb
      FROM base
    ),
    h AS (
      SELECT media_id, ascii(substring(t, i, 1)) // 16 AS bin
      FROM media, unnest(generate_series(1, nb)) AS u(i)
      WHERE nb > 0
    ),
    hh AS (
      SELECT media_id, bin, COUNT(*) AS cnt FROM h GROUP BY media_id, bin
    ),
    vec AS (
      SELECT media_id, [{_AH_VEC_SQL}] AS cv, SUM(cnt) AS nb
      FROM hh GROUP BY media_id
    ),
    vech AS (
      SELECT media_id, cv, nb, CAST({_DH_HASH_SQL} AS BIGINT) AS dhash
      FROM vec
    ),
    cap AS (
      SELECT dhash FROM vech GROUP BY dhash HAVING COUNT(*) <= 1000
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b, a.dhash,
           round(CAST({_AH_L1_SQL} AS DOUBLE) / (a.nb * b.nb), 9) AS l1
    FROM vech a
    JOIN cap USING (dhash)
    JOIN vech b ON a.dhash = b.dhash AND a.media_id < b.media_id
    WHERE CAST({_AH_L1_SQL} AS DOUBLE) / (a.nb * b.nb) <= 0.01
    """,
)
def mm_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-hash (dHash) perceptual near-dup detection — the
    GRADIENT twin of mm_ahash_neardup: bit i is set where histogram
    bin i holds strictly more mass than bin i+1 (15 bits over the
    16-bin features). dHash is the production default for image
    near-dup (more stable than aHash under global brightness shifts,
    here: under uniform payload-frequency shifts, since only
    ADJACENT-bin ordering matters, not the global mean). Same scale
    shape as aHash: pure integer bit test, capped equi-join on the
    fingerprint, integer cross-multiplied L1 verify with one final
    division. Planted exact copies (media_id + 1e6) are the truth
    set."""
    from ..operators.dedup import cap_hot_buckets
    from ..operators.multimodal import byte_histogram_rows, synthetic_media

    d = load_table(spark, sf_dir, "documents", rebalance=False).select("doc_id", "text")
    aug = d.unionByName(
        d.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    hist = byte_histogram_rows(synthetic_media(aug))
    vec = hist.groupBy("media_id").agg(
        F.array(
            *[
                F.sum(F.when(F.col("bin") == i, F.col("cnt")).otherwise(0))
                for i in range(16)
            ]
        ).alias("cv"),
        F.sum("cnt").alias("nb"),
    )
    dhash = None
    for i in range(15):
        bit = F.when(
            F.col("cv")[i] > F.col("cv")[i + 1], F.lit(1 << i)
        ).otherwise(0)
        dhash = bit if dhash is None else dhash + bit
    vech = vec.select("media_id", "cv", "nb", dhash.cast("long").alias("dhash"))
    vech = cap_hot_buckets(vech, ["dhash"], 1000)
    a, b = vech.alias("a"), vech.alias("b")
    l1num = F.aggregate(
        F.zip_with(
            F.col("a.cv"),
            F.col("b.cv"),
            lambda x, y: F.abs(x * F.col("b.nb") - y * F.col("a.nb")),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    l1 = l1num.cast("double") / (F.col("a.nb") * F.col("b.nb"))
    return (
        a.join(
            b,
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("dhash"),
            F.round(l1, 9).alias("l1"),
            l1.alias("_l1raw"),
        )
        .filter(F.col("_l1raw") <= 0.01)
        .drop("_l1raw")
    )


@register(
    "mm_payload_exact_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25
    ),
    media AS (
      SELECT doc_id AS media_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             md5(text) AS fp,
             octet_length(encode(text)) AS nb
      FROM base
    )
    SELECT fp,
           MIN(media_id) AS keep_media_id,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST((COUNT(*) - 1) * MIN(nb) AS BIGINT) AS bytes_reclaimed
    FROM media
    GROUP BY fp
    HAVING COUNT(*) > 1
    """,
)
def mm_payload_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical media dedup — the FIRST stage of any multimodal
    pipeline (the same file uploaded twice, mirrored, or re-crawled):
    group by payload content hash, keep the lowest id, report the
    storage reclaimed. One hash-group aggregation with map-side
    combine; the shuffle carries 16-byte fingerprints, never payloads
    — at 100 TB this is the cheapest dedup pass and removes the
    plurality of raw-crawl bytes before any near-dup math runs.
    Planted exact copies (doc_id < 25 re-ingested under new ids) give
    the pass a verifiable truth set, mirroring the text-dedup
    corpus."""
    d = load_table(spark, sf_dir, "documents", rebalance=False).select("doc_id", "text")
    base = d.unionByName(
        d.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    media = base.select(
        F.col("doc_id").alias("media_id"),
        F.md5(F.encode("text", "UTF-8")).alias("fp"),
        F.octet_length(F.encode("text", "UTF-8")).alias("nb"),
    )
    return (
        media.groupBy("fp")
        .agg(
            F.min("media_id").alias("keep_media_id"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
            ((F.count(F.lit(1)) - 1) * F.min("nb"))
            .cast("long")
            .alias("bytes_reclaimed"),
        )
        .filter(F.col("group_size") > 1)
    )
