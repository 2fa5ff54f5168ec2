"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly marked) behind import-guards — but everything Spark-side is
real and tested: the schema convention, the ``mapInPandas`` plumbing
(signatures, Arrow batch shapes, output schemas), partition sizing, and
a deterministic fake featurizer that exercises the full path.

Schema convention for a multimodal asset column:
    payload   binary                 -- raw bytes (never parsed by Spark)
    meta      struct<kind string, byte_len bigint, codec string>

At 100 TB the payloads dominate: keep them in their own column so column
pruning skips them for metadata-only queries, and size
``spark.sql.files.maxPartitionBytes`` so one Arrow batch of payloads
fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

__all__ = [
    "attach_payload", "payload_stats", "extract_features",
    "decode_image", "sample_frame_offsets", "patch_payload",
    "FEATURE_SCHEMA",
    "payload_minhash_pairs",
]


def attach_payload(df: DataFrame, id_col: str, content_col: str,
                   kind: str = "blob", codec: str = "utf-8") -> DataFrame:
    """Wrap a content column as (id, payload binary, meta struct)."""
    payload = F.encode(F.col(content_col), "utf-8")
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.octet_length(payload).cast("bigint").alias("byte_len"),
            F.lit(codec).alias("codec"),
        ).alias("meta"))


def payload_stats(df: DataFrame, id_col: str) -> DataFrame:
    """Metadata-only scan over a multimodal table: never touches payload
    bytes (column pruning drops the binary column from the scan)."""
    return df.select(
        F.col(id_col),
        F.col("meta.kind").alias("kind"),
        F.col("meta.byte_len").alias("byte_len"),
        F.crc32(F.col("payload")).cast("bigint").alias("payload_crc32"))


FEATURE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("byte_len", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


def extract_features(df: DataFrame, id_col: str, dim: int = 8,
                     batch_hint: int | None = None) -> DataFrame:
    """Feature-extract payloads via ``mapInPandas`` (Arrow batches).

    The featurizer here is a deterministic byte-histogram projection —
    a stand-in with the exact signature/batch shape a real encoder
    (CLIP, wav2vec, ...) would use; swap ``_featurize_batch`` for the
    model call on a cluster with the codec/model libs installed.
    """
    def _featurize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for buf in payloads:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                # deterministic fake embedding: bucketed byte histogram,
                # L1-normalized (real impl: decode + model forward pass)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).astype("float32"))
            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "byte_len": payloads.map(len).astype("int64"),
                "feature": feats,
            })

    cols = df.select(F.col(id_col), "payload")
    return cols.mapInPandas(_featurize_batch, schema=FEATURE_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8.

    STUB: the execution container ships no image codecs.  On a real
    cluster install pillow/opencv on executors and this body becomes
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow/opencv on executors; "
            "not available in this container") from e
    import io

    import numpy as np
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(payload)))


def sample_frame_offsets(df: DataFrame, id_col: str,
                         duration_col: str, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: (id, frame_ts array<double>) — the
    pure-arithmetic half of frame extraction (the decode of each frame
    is the stubbed step).  Emits one timestamp per 1/fps seconds."""
    n = F.floor(F.col(duration_col) * F.lit(float(fps))).cast("int")
    return df.select(
        F.col(id_col),
        F.transform(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                    lambda i: i / F.lit(float(fps))).alias("frame_ts"))


def patch_payload(df: DataFrame, id_col: str,
                  patch_bytes: int = 64) -> DataFrame:
    """Split each binary payload into fixed-size byte patches:
    (id, patch_idx, patch_len, patch_md5) — the chunking step of every
    multimodal tokenizer (ViT-style patches, audio frames, shard-level
    content hashes), done Spark-side on raw bytes so the decode step
    downstream receives bounded units.

    Native expressions only: explode(sequence) generates patch indices
    from the metadata length (never materialized driver-side), and each
    patch is a ``substring`` slice of the binary column — the payload
    bytes are read once per patch inside codegen, no Python.  Output
    carries the md5 (and length) rather than the bytes, so the patch
    relation is narrow; slice the bytes themselves with the same
    substring when feeding a decoder.
    """
    n_patches = F.ceil(F.col("meta.byte_len") / F.lit(patch_bytes))
    idx = F.explode(F.sequence(F.lit(0), (n_patches - 1).cast("int")))
    patch = F.substring(
        F.col("payload"),
        (F.col("patch_idx") * patch_bytes + 1).cast("int"),
        patch_bytes)
    return (df.filter(F.col("meta.byte_len") > 0)
            .select(F.col(id_col), "payload", "meta",
                    idx.alias("patch_idx"))
            .select(F.col(id_col).cast("bigint").alias(id_col),
                    F.col("patch_idx").cast("bigint").alias("patch_idx"),
                    F.octet_length(patch).cast("bigint").alias("patch_len"),
                    F.md5(patch).alias("patch_md5")))


def payload_minhash_pairs(df: DataFrame, id_col: str,
                          shingle_bytes: int = 8, stride: int = 4,
                          num_hashes: int = 8, bands: int = 4
                          ) -> DataFrame:
    """Near-duplicate candidate pairs over BINARY payloads WITHOUT
    decoding: byte-shingle MinHash + LSH banding -- catches re-encoded
    metadata variants, truncated copies, and byte-shifted duplicates
    that exact payload-md5 dedup misses, with no codec anywhere (the
    multimodal twin of text MinHash-LSH).

    Shingles are ``shingle_bytes``-byte windows every ``stride`` bytes,
    taken over the payload's HEX rendering (2 chars/byte) so both
    engines shingle with plain string ops (no BLOB substring in the
    oracle engine).  Each shingle is md5-hashed ONCE; the num_hashes
    permutations are dedup.py's affine MinHash maps (minhash_slot --
    8x cheaper than salted re-hashing, same scheme the text oracles
    replay); no shingle distinct (min() is duplicate-insensitive, the
    dedup shuffle is pure cost -- the _minhash_wide lesson).  ``bands``
    must divide ``num_hashes`` (a non-divisor silently weakens the
    signature; bands > num_hashes would degenerate every band key to
    the empty string and the equi-join into a cross product).  Docs
    shorter than one shingle are excluded.

    Returns (a, b, shared_bands), a < b, one row per candidate pair.
    """
    from fmx.operators.dedup import hash64, minhash_slot

    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must be a positive divisor of "
            f"num_hashes={num_hashes}")
    rows = num_hashes // bands
    hexp = F.hex(F.col("payload"))
    n_pos = (F.col("meta.byte_len") - shingle_bytes) / stride
    sh = (df.filter(F.col("meta.byte_len") >= shingle_bytes)
          .select(F.col(id_col).alias("_id"), hexp.alias("_hx"),
                  F.explode(F.sequence(
                      F.lit(0), n_pos.cast("int"), F.lit(1)))
                  .alias("_i"))
          .select("_id",
                  hash64(F.substring("_hx",
                                     F.col("_i") * (2 * stride) + 1,
                                     2 * shingle_bytes)).alias("_h")))
    sig = sh.groupBy("_id").agg(*[
        F.min(minhash_slot(F.col("_h"), p)).alias(f"_h{p}")
        for p in range(num_hashes)])
    band_cols = [
        F.md5(F.concat_ws(":", *[F.col(f"_h{b * rows + r}").cast("string")
                                 for r in range(rows)])).alias(f"_b{b}")
        for b in range(bands)]
    banded = sig.select("_id", *band_cols)
    longf = banded.select(
        "_id", F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"_b{b}").alias("sig"))
            for b in range(bands)])).alias("bs")
    ).select("_id", "bs.band", "bs.sig")
    l = longf.withColumnRenamed("_id", "a")
    r = longf.withColumnRenamed("_id", "b")
    return (l.join(r, ["band", "sig"])
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("shared_bands")))
