"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface (driver mandate): treat media as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas``.

The container has no image/audio libraries, so the *decode kernels* are
stubbed exactly as mandated: ``decode_media`` raises ``NotImplementedError``
unless a real decoder is injected, and :func:`fake_features` is the
deterministic stand-in used by tests. Everything Spark-side — schema,
partition sizing, UDF signatures, Arrow batch shape — is real and tested.

Scale notes: media rows are huge (MBs) — ``media_batch_rows`` keeps Arrow
batches bounded; keep binary columns OUT of shuffle keys; store media in
parquet with metadata columns first so metadata-only queries never touch
the blob pages (parquet column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media schema: metadata first (prunable), blob last.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

Decoder = Callable[[bytes, str], list[float]]


def decode_media(content: bytes, media_type: str) -> list[float]:
    """Real decoder entry point — STUB.

    Decoding image/audio/video requires codec libraries not present in this
    environment. Inject a real decoder into :func:`extract_features`
    instead, or use :func:`fake_features` for plumbing tests.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg/torchaudio); "
        "inject a decoder via extract_features(decoder=...)"
    )


def fake_features(content: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in decoder: FEATURE_DIM doubles derived from the
    sha256 of the payload — stable across engines/runs, so the distributed
    plumbing can be verified end-to-end without codecs."""
    digest = hashlib.sha256(content or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / float(0xFFFFFFFF)
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame,
    decoder: Decoder | None = None,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    Arrow streams ``batch_rows``-sized record batches into Python; each
    batch yields one output frame — constant memory regardless of partition
    size, which is what keeps 100 TB of media from OOMing the Python
    workers. Metadata (n_bytes, sha256) is computed even when the decode
    kernel is stubbed.
    """
    decode = decoder or decode_media

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                contents = [bytes(c) if c is not None else b"" for c in chunk["content"]]
                out = pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "media_type": chunk["media_type"].values,
                        "n_bytes": [len(c) for c in contents],
                        "sha256": [hashlib.sha256(c).hexdigest() for c in contents],
                        "features": [
                            decode(c, t)
                            for c, t in zip(contents, chunk["media_type"])
                        ],
                    }
                )
                yield out

    return df.mapInPandas(_run, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp via
    a generator expression (no decode). Pairs with a decoder kernel that
    seeks to ``frame_ts_ms``. Demonstrates the explode-side of multimodal
    processing without codecs."""
    return df.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/bench: wrap the driver ``documents`` table as
    fake media rows (utf-8 payload bytes) matching MEDIA_SCHEMA."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )


CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def chunk_text_media(
    df: DataFrame,
    id_col: str = "media_id",
    text_col: str = "text",
    chunk_chars: int = 256,
) -> DataFrame:
    """Fixed-window chunking of text payloads via ``mapInPandas`` — the
    plumbing pattern for audio/video segmenting (windows of a big payload
    → per-chunk rows with content hashes), runnable without codecs because
    the payload here is text. Windows are counted in characters (hashes
    taken over the UTF-8 bytes), so the operation is exactly portable to
    the SQL oracle, which lacks byte-level blob slicing.

    Every document yields ≥ 1 chunk (an empty doc yields one empty chunk —
    downstream joins never lose rows). Constant memory per Arrow batch; at
    media scale, chunking early and dropping the parent blob keeps shuffle
    rows bounded by ``chunk_chars``, not by the original payload size.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ncs, nbs, hashes = [], [], [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                s = text or ""
                chunks = [
                    s[i : i + chunk_chars] for i in range(0, len(s), chunk_chars)
                ] or [""]
                for j, chunk in enumerate(chunks):
                    raw = chunk.encode("utf-8")
                    ids.append(mid)
                    idxs.append(j)
                    ncs.append(len(chunk))
                    nbs.append(len(raw))
                    hashes.append(hashlib.sha256(raw).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "chunk_index": pd.Series(idxs, dtype="int32"),
                    "n_chars": pd.Series(ncs, dtype="int32"),
                    "n_bytes": pd.Series(nbs, dtype="int64"),
                    "sha256": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _run, schema=CHUNKS_SCHEMA
    )


def parse_image_header(content: bytes) -> tuple[str, int, int]:
    """Extract (format, width, height) from raw image bytes by parsing the
    container header directly — PNG's IHDR chunk and JPEG's SOFn marker —
    with NO codec library: dimension metadata lives in the first bytes of
    the file, so corpus-wide image profiling never needs to decode pixels.

    Returns ("unknown", 0, 0) for unrecognized/truncated payloads (never
    raises — corrupt members must not kill a 100 TB scan).
    """
    try:
        if content[:8] == b"\x89PNG\r\n\x1a\n" and content[12:16] == b"IHDR":
            w = int.from_bytes(content[16:20], "big")
            h = int.from_bytes(content[20:24], "big")
            return ("png", w, h)
        if content[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            n = len(content)
            while i + 9 < n:
                if content[i] != 0xFF:
                    break
                # skip 0xFF fill bytes: the spec allows any number of
                # padding 0xFFs before a marker byte, so advance to the
                # first non-FF (otherwise the pad byte is misread as the
                # marker and a bogus seg_len is consumed)
                while i + 9 < n and content[i + 1] == 0xFF:
                    i += 1
                marker = content[i + 1]
                if marker == 0xDA or marker == 0xD9:
                    break  # SOS (entropy data follows) / EOI: no SOF seen
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
                # SOF0-SOF15 except DHT/JPG/DAC carry dimensions
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(content[i + 5 : i + 7], "big")
                    w = int.from_bytes(content[i + 7 : i + 9], "big")
                    return ("jpeg", w, h)
                i += 2 + seg_len
        if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
            return ("webp", 0, 0)  # dims live in per-codec chunks; format only
    except (IndexError, ValueError):  # pragma: no cover — malformed tails
        pass
    return ("unknown", 0, 0)


def image_header_stats(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Corpus-wide image metadata profiling over a binary column: format,
    width, height, n_bytes per media row — Arrow-batched ``mapInPandas``
    running :func:`parse_image_header` (bytes-level parsing, no decode,
    constant memory per batch). The triage pass that decides resize /
    filter / bucket-by-aspect long before any expensive pixel decode."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(content) if content is not None else b""
                fmt, w, h = parse_image_header(raw)
                rows.append((int(mid), fmt, w, h, len(raw)))
            yield pd.DataFrame(
                rows, columns=["media_id", "format", "width", "height", "n_bytes"]
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(_run, schema)
