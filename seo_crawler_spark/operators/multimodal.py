"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs (no PIL/ffmpeg), so the DECODE
step is stubbed behind an import-try with a clearly-marked deterministic
fake — but everything Spark-side is real and tested: the schema, the
binary payloads, kind-partitioned layout, Arrow batch shapes, the
mapInPandas UDF signatures, and the deterministic feature extraction
(numpy over payload bytes).

At 100 TB the media table is partitioned by ``kind`` and bucketed by
``media_ref`` hash; decode/feature stages are mapInPandas over Arrow
batches so payload bytes never materialize as Python row objects.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)


def synthesize_media(spark: SparkSession, corpus: DataFrame) -> DataFrame:
    """Build the media table from the corpus's media spans: one row per
    distinct media_ref, payload = deterministic bytes derived from the
    ref hash (stands in for real image bytes; header carries the fake
    dims the stub decoder reads back)."""
    refs = (
        corpus.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    # meta derived with column exprs (md5int seeds everything — the
    # repo-wide Spark↔DuckDB parity hash, functions/text.py:25 — so the
    # meta path is SQL-reproducible; payload attached in one Arrow pass
    # below stays rows-only, it's a splitmix64 stream)
    from ..functions.text import md5int

    h = md5int(F.col("media_ref"))
    kind = (
        F.when(F.pmod(h, F.lit(10)) < 7, F.lit("image"))
        .when(F.pmod(h, F.lit(10)) < 9, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    width = (F.pmod(h, F.lit(1920)) + 32).cast("int")
    height = (F.pmod(h, F.lit(1080)) + 32).cast("int")
    n_frames = F.when(kind == "video", (F.pmod(h, F.lit(240)) + 24).cast("int")).otherwise(
        F.lit(None).cast("int")
    )
    sample_rate = F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None).cast("int"))
    tagged = refs.select(
        "media_ref",
        kind.alias("kind"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            n_frames.alias("n_frames"),
            sample_rate.alias("sample_rate"),
        ).alias("meta"),
    )

    out_schema = MEDIA_SCHEMA

    def attach_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ref, meta in zip(pdf["media_ref"], pdf["meta"]):
                seed = np.uint64(
                    int.from_bytes(
                        __import__("hashlib").md5(ref.encode()).digest()[:8], "big"
                    )
                )
                rng_bytes = _fake_bytes(seed, 128)
                header = struct.pack(
                    ">II", int(meta["width"] or 0), int(meta["height"] or 0)
                )
                payloads.append(header + rng_bytes)
            out = pdf.copy()
            out["payload"] = payloads
            yield out[["media_ref", "kind", "payload", "meta"]]

    return tagged.mapInPandas(attach_payload, schema=out_schema)


def _fake_bytes(seed: np.uint64, n: int) -> bytes:
    """splitmix64 byte stream — pure function of seed."""
    out = np.empty(n // 8, dtype=np.uint64)
    x = np.uint64(seed)
    with np.errstate(over="ignore"):
        for i in range(len(out)):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = z ^ (z >> np.uint64(31))
    return out.tobytes()


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode stage. With a real codec installed (PIL) it would decode
    payload bytes; offline it falls back to the DETERMINISTIC FAKE:
    reading the dims from the synthetic payload header. The Spark
    plumbing (filter→mapInPandas→Arrow batches) is identical either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401  (absent in this container)

            decoder = "pillow"
        except ImportError:
            decoder = "fake-header"

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if decoder == "pillow":  # pragma: no cover (no PIL offline)
                    raise NotImplementedError(
                        "real decode path requires pillow; stubbed per brief"
                    )
                w, h = struct.unpack(">II", bytes(payload[:8]))
                rows.append({"media_ref": ref, "width": w, "height": h,
                             "decoder": decoder})
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height", "decoder"])

    return media.filter(F.col("kind") == "image").mapInPandas(run, DECODED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic feature extraction — REAL computation (L2-normalized
    byte histogram of the payload, numpy-vectorized per Arrow batch),
    standing where a vision/audio encoder would run."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                v = hist.astype(np.float64)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "features": feats}
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning as pure column exprs (aspect-preserving target
    dims); the pixel work would live in the decode stage."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return media.filter(F.col("kind") == "image").select(
        "media_ref",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index
    (posexplode of a sequence — the shuffle-free fan-out shape)."""
    v = media.filter(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return v.select(
        "media_ref",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(idx).alias("frame_idx"),
    )


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible end-to-end multimodal slice: synthesize the media
    table off the documents table (media_ref = 'media/<doc_id>' for
    every 4th doc), run decode-stub-adjacent feature extraction and the
    resize planner, and emit one deterministic row per media object.

    Oracle-checkable: every OUTPUT column (kind, dims, payload length,
    feature count, resize targets) derives from the md5int parity hash
    or from constants of the synthesis (header 8 + 128 stream bytes,
    dim=16 histogram), so :func:`multimodal_pipeline_sql` reproduces it
    in DuckDB. The payload BYTES themselves stay rows-only — the
    splitmix64 stream has no SQL twin — and are pinned by
    tests/test_multimodal.py instead."""
    from ..sources.tables import load

    docs = load(spark, "documents", sf_dir)
    fake_corpus = docs.filter(F.pmod("doc_id", F.lit(4)) == 0).select(
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media/"), F.col("doc_id").cast("string")).alias(
                    "media_ref"
                ),
                F.lit(0).alias("offset"),
            )
        ).alias("spans")
    )
    media = synthesize_media(spark, fake_corpus)
    feats = extract_features(media)
    resize = resize_plan(media).select(
        "media_ref", "target_width", "target_height"
    )
    return (
        media.select(
            "media_ref",
            "kind",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.length("payload").alias("payload_bytes"),
        )
        .join(feats.select("media_ref", F.size("features").alias("n_features")),
              "media_ref")
        .join(resize, "media_ref", "left")
        .orderBy("media_ref")
    )


def multimodal_pipeline_sql() -> str:
    """DuckDB twin of :func:`multimodal_pipeline`. Meta derives from the
    shared md5int hash; payload_bytes is the synthesis constant
    8 (header) + 128 (stream); n_features is the histogram dim (16);
    resize targets repeat resize_plan's IEEE expression op-for-op
    (divide → least → multiply → round, half-up on positives in both
    engines)."""
    h = "(('0x' || substr(md5(media_ref), 1, 15))::BIGINT)"
    return f"""
WITH refs AS (
  SELECT 'media/' || CAST(doc_id AS VARCHAR) AS media_ref
  FROM documents WHERE doc_id % 4 = 0
),
meta AS (
  SELECT media_ref,
         CASE WHEN {h} % 10 < 7 THEN 'image'
              WHEN {h} % 10 < 9 THEN 'audio'
              ELSE 'video' END AS kind,
         CAST({h} % 1920 + 32 AS INT) AS width,
         CAST({h} % 1080 + 32 AS INT) AS height
  FROM refs
)
SELECT media_ref, kind, width, height,
       136 AS payload_bytes,
       16 AS n_features,
       CASE WHEN kind = 'image'
            THEN CAST(round(width * least(1.0, 512 / CAST(greatest(width, height) AS DOUBLE))) AS INT)
            END AS target_width,
       CASE WHEN kind = 'image'
            THEN CAST(round(height * least(1.0, 512 / CAST(greatest(width, height) AS DOUBLE))) AS INT)
            END AS target_height
FROM meta
ORDER BY media_ref
"""


# ---------------------------------------------------------------------------
# media dedup — exact dedup of the binary modality
# ---------------------------------------------------------------------------

# distinct payload contents in the registered query's synthetic reuse
# pattern: ~250 media objects at sf0.01 / 40 contents ≈ 6 copies each
MEDIA_DEDUP_CONTENTS = 40


def media_dedup(
    spark: SparkSession, sf_dir: str, n_contents: int = MEDIA_DEDUP_CONTENTS
) -> DataFrame:
    """Exact dedup of the MEDIA modality — the web serves the same
    image from many pages, so a multimodal training pipeline dedups
    media objects by payload bytes before paying decode/feature cost.

    Scale shape (the part that matters at 100 TB): the content hash is
    computed MAP-SIDE over the payload column and only
    (hash, media_ref, length) rows enter the groupBy shuffle — binary
    blobs never cross the network. ``F.md5(payload)`` is JVM-side
    (no Python round-trip for the hash itself).

    Synthetic reuse: one media object per even-doc_id page
    (media_ref 'm/<doc_id>'), payload = splitmix64 stream seeded ONLY
    by content_key = md5int(media_ref) % n_contents — so distinct refs
    share byte-identical payloads. Spark groups by the ACTUAL byte
    hash; the DuckDB oracle groups by the content_key arithmetic. The
    hash-match therefore proves the byte-level grouping coincides with
    the key-level one (any ref-dependence leaking into payload bytes
    would split Spark's groups and mismatch).

    Output: one row per unique payload — keeper (min media_ref),
    n_copies, payload_bytes, dup_bytes_saved = (n_copies-1) × bytes."""
    from ..functions.text import md5int
    from ..sources.tables import load

    docs = load(spark, "documents", sf_dir)
    refs = docs.filter(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.concat(F.lit("m/"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        )
    )
    tagged = refs.select(
        "media_ref",
        F.pmod(md5int(F.col("media_ref")), F.lit(n_contents)).alias(
            "content_key"
        ),
    )

    pay_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _fake_bytes(
                    np.uint64(
                        (int(k) * 0x9E3779B97F4A7C15 + 1)
                        & 0xFFFFFFFFFFFFFFFF
                    ),
                    136,
                )
                for k in pdf["content_key"]
            ]
            yield pdf[["media_ref", "payload"]]

    media = tagged.mapInPandas(attach, schema=pay_schema)
    hashed = media.select(
        "media_ref",
        F.md5("payload").alias("content_hash"),
        F.length("payload").alias("nbytes"),
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.min("media_ref").alias("keeper_ref"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("nbytes").alias("payload_bytes"),
        )
        .select(
            "keeper_ref",
            "n_copies",
            "payload_bytes",
            ((F.col("n_copies") - 1) * F.col("payload_bytes")).alias(
                "dup_bytes_saved"
            ),
        )
        .orderBy("keeper_ref")
    )


def media_dedup_sql(n_contents: int = MEDIA_DEDUP_CONTENTS) -> str:
    """content_key twin of :func:`media_dedup` — groups by the seed
    arithmetic instead of the byte hash (DuckDB never sees the
    splitmix64 bytes; equality of the two groupings is the check)."""
    from ..functions.text import MD5INT_SQL

    h = MD5INT_SQL.format(c="media_ref")
    return f"""
WITH refs AS (
  SELECT 'm/' || CAST(doc_id AS VARCHAR) AS media_ref
  FROM documents WHERE doc_id % 2 = 0
),
keys AS (SELECT media_ref, {h} % {n_contents} AS content_key FROM refs)
SELECT min(media_ref) AS keeper_ref,
       count(*) AS n_copies,
       136 AS payload_bytes,
       (count(*) - 1) * 136 AS dup_bytes_saved
FROM keys GROUP BY content_key ORDER BY keeper_ref
"""


# ---------------------------------------------------------------------------
# Perceptual-hash media NEAR-dup — the approximate sibling of media_dedup
# ---------------------------------------------------------------------------
PHASH_CONTENTS = 40   # distinct base images in the synthetic reuse model
PHASH_BANDS = 8       # 8 bands x 8 bits over the 64-bit signature
PHASH_HAM_T = 8       # hamming acceptance threshold (<= 4 by construction
                      # for re-encodes of one base; ~32 across bases).
                      # CANDIDATE-RECALL bound (round-6 ADVICE): banding
                      # into PHASH_BANDS bands only GUARANTEES a shared
                      # band for hamming <= PHASH_BANDS - 1 = 7; a
                      # hamming-8 pair whose differing bits hit all 8
                      # bands would be missed as a candidate. Shipped
                      # data never exercises that corner (same-base
                      # pairs <= 4, cross-base >= 12); on real corpora
                      # either lower ham_t to PHASH_BANDS - 1 or raise
                      # PHASH_BANDS to ham_t + 1 for certain recall.


def media_phash_neardup(
    spark: SparkSession,
    sf_dir: str,
    n_contents: int = PHASH_CONTENTS,
    ham_t: int = PHASH_HAM_T,
) -> DataFrame:
    """NEAR-dup of the media modality by perceptual hash — media_dedup
    catches byte-identical copies; the web also re-serves the same
    image re-encoded (quality knobs, stripped metadata, a few changed
    pixels), which only a perceptual signature can group before the
    pipeline pays duplicate decode/caption/feature cost.

    Pipeline (the production shape at 10^10 media objects):
    1. decode-side signature: a 64-bit average-hash computed from the
       payload BYTES in an Arrow-batched UDF — blobs never shuffle;
       only (media_ref, phash) rows leave the map stage;
    2. LSH banding: 8 bands x 8 bits; an equi-join per band replaces
       the all-pairs hamming scan (a pair within hamming 4 shares
       >= 4 of 8 bands by pigeonhole — candidate recall is certain,
       cross-base collisions are rejected by the verify);
    3. hamming verify on the 64-bit signatures (xor + bit_count —
       row-local integer ops);
    4. per-ref verdict: keeper = min media_ref among verified
       neighbors (incl. self), n_neighbors = verified-degree.

    Synthetic reuse model (the media_dedup discipline): payload =
    64 base bytes from splitmix64 seeded ONLY by content_key
    (= md5int(ref) % n_contents), then <= 2 ref-salted byte flips
    (the 're-encode'), then 8 ref-derived metadata bytes. The DuckDB
    oracle groups by the content_key arithmetic alone — the hash match
    proves the byte-level banded/verified clustering coincides with
    the generative truth (flip-count/positions and metadata must not
    leak into the grouping, and no cross-base pair may survive)."""
    from ..functions.text import md5int
    from ..sources.tables import load
    import hashlib

    docs = load(spark, "documents", sf_dir)
    refs = docs.filter(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.concat(F.lit("m/"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        )
    )
    tagged = refs.select(
        "media_ref",
        F.pmod(md5int(F.col("media_ref")), F.lit(n_contents)).alias(
            "content_key"
        ),
    )

    pay_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def md5i(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        for pdf in batches:
            payloads = []
            for ref, k in zip(pdf["media_ref"], pdf["content_key"]):
                base = bytearray(
                    _fake_bytes(
                        np.uint64(
                            (int(k) * 0x9E3779B97F4A7C15 + 1)
                            & 0xFFFFFFFFFFFFFFFF
                        ),
                        64,
                    )
                )
                # the 're-encode': <= 2 ref-salted byte flips across the
                # mid-gray threshold (each flips exactly one phash bit)
                for i in range(md5i(f"ns:{ref}") % 3):
                    pos = md5i(f"np:{ref}:{i}") % 64
                    base[pos] = 255 if base[pos] < 128 else 0
                meta = hashlib.md5(f"exif:{ref}".encode()).digest()[:8]
                payloads.append(bytes(base) + meta)
            out = pdf.copy()
            out["payload"] = payloads
            yield out[["media_ref", "payload"]]

    media = tagged.mapInPandas(attach, schema=pay_schema)

    @F.pandas_udf(T.LongType())
    def phash_udf(p: pd.Series) -> pd.Series:
        vals = []
        for b in p:
            arr = np.frombuffer(b[:64], dtype=np.uint8)
            bits = np.uint64(0)
            for j in np.flatnonzero(arr >= 128):
                bits |= np.uint64(1) << np.uint64(int(j))
            vals.append(int(bits.astype(np.int64)))
        return pd.Series(vals, dtype="int64")

    sigs = media.select(
        "media_ref", phash_udf("payload").alias("phash")
    ).localCheckpoint(eager=True)  # reused by bands AND both join sides

    bands = sigs.select(
        "media_ref",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 8 * k)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_ref", "phash", "bk.band", "bk.key")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.media_ref") < F.col("y.media_ref")),
        )
        .select(
            F.col("x.media_ref").alias("a"),
            F.col("y.media_ref").alias("b"),
            F.col("x.phash").alias("ha"),
            F.col("y.phash").alias("hb"),
        )
        .distinct()
    )
    verified = cand.filter(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= ham_t
    ).select("a", "b")
    neigh = (
        verified.select(F.col("a").alias("media_ref"), F.col("b").alias("n"))
        .unionByName(
            verified.select(
                F.col("b").alias("media_ref"), F.col("a").alias("n")
            )
        )
        .unionByName(
            sigs.select("media_ref", F.col("media_ref").alias("n"))
        )
    )
    return (
        neigh.groupBy("media_ref")
        .agg(
            F.min("n").alias("keeper_ref"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_neighbors"),
        )
        .orderBy("media_ref")
    )


def media_phash_neardup_sql(n_contents: int = PHASH_CONTENTS) -> str:
    """content_key twin: the generative truth groups by base image —
    keeper/degree per ref follow from the group alone. Spark's banded
    byte-level pipeline must reproduce exactly this (see docstring)."""
    from ..functions.text import MD5INT_SQL

    h = MD5INT_SQL.format(c="media_ref")
    return f"""
WITH refs AS (
  SELECT 'm/' || CAST(doc_id AS VARCHAR) AS media_ref
  FROM documents WHERE doc_id % 2 = 0
),
keys AS (SELECT media_ref, {h} % {n_contents} AS content_key FROM refs)
SELECT media_ref,
       min(media_ref) OVER (PARTITION BY content_key) AS keeper_ref,
       (count(*) OVER (PARTITION BY content_key) - 1)::BIGINT AS n_neighbors
FROM keys ORDER BY media_ref
"""
