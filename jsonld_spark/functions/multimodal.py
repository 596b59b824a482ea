"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages.  The actual codecs aren't available in this
container, so decoding is STUBBED (clearly-marked ``NotImplementedError``
or a deterministic fake) — the Spark-side plumbing (schema, batch shape,
partition flow) is real and tested, which is the part that matters at
100 TB: payload bytes stay columnar in Arrow; only metadata leaves the
stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload BINARY, media_type).  Test stand-in:
    the UTF-8 text bytes play the role of an undecoded media blob."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def decode_image(payload: bytes):
    """STUB: real decoder requires an image lib not present here."""
    raise NotImplementedError(
        "image decode requires pillow/opencv; not available in this runtime"
    )


def _fake_dims(digest: str) -> tuple[int, int]:
    """Deterministic fake for the decode step (documented stand-in)."""
    return 64 + int(digest[:2], 16), 64 + int(digest[2:4], 16)


def extract_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(b).hexdigest()
                w, h = _fake_dims(digest)
                out.append((int(doc_id), len(b), digest, w, h))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "digest", "width", "height"]
            )

    return payloads.select("doc_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def payload_meta(docs: DataFrame) -> DataFrame:
    """JVM-only metadata path (oracle-checkable: no Python involved)."""
    return attach_payload(docs).select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    ).orderBy("doc_id")


PAYLOAD_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest
FROM documents ORDER BY doc_id
"""

# Oracle for the mapInPandas feature stage: every output column is a
# deterministic function of the payload bytes (md5-derived fake dims
# stand in for the stubbed decode), so DuckDB can predict it exactly.
# coalesce(text, '') mirrors extract_features' NULL-payload → b"" branch
# (without it, DuckDB's NULL-skipping concat() yields '0x' and the INT
# cast crashes the oracle while Spark returns a normal row).
MULTIMODAL_FEATURES_SQL = """
WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS INTEGER) AS width,
       CAST(64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS INTEGER) AS height
FROM t ORDER BY doc_id
"""


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling PLUMBING: one payload row in → ``n_frames``
    frame rows out, the batch-shape-changing Arrow stage a real codec
    sampler has (pyav/ffmpeg are not in this runtime, so the "frame"
    is a deterministic fixed-stride byte slice — the stand-in is
    documented, the mapInPandas explode shape, schema and partition
    flow are the real thing).

    ``frame_digest`` is md5 over the frame's UPPERCASE HEX form — hex
    is ASCII, which keeps the digest byte-true AND mirrorable by a
    VARCHAR-only SQL md5 (DuckDB has no blob substring/md5); NULL
    payloads sample as b'' (all-empty frames), matching
    ``extract_features``.

    100-TB shape: payload bytes stay columnar in Arrow; only (ids,
    offsets, digests) leave the stage; no shuffle."""
    import pandas as pd

    if n_frames < 1:
        raise ValueError("sample_frames: n_frames must be >= 1")

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                for i in range(n_frames):
                    start = (i * n) // n_frames
                    end = ((i + 1) * n) // n_frames
                    frame = b[start:end]
                    digest = hashlib.md5(
                        frame.hex().upper().encode()
                    ).hexdigest()
                    out.append(
                        (int(doc_id), i, i * 1000, end - start, digest)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "frame_idx", "frame_ts_ms",
                    "n_frame_bytes", "frame_digest",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(fn, FRAME_SCHEMA)


def sample_frames_sql(n_frames: int = 4) -> str:
    """DuckDB mirror: hex the payload once, slice CHARACTERS (2 hex
    chars per byte — ASCII, so VARCHAR substring is byte-exact), md5
    the slice."""
    return f"""
WITH t AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS n
  FROM documents),
 f AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
         CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
         ((i + 1) * n) // {n_frames} - (i * n) // {n_frames} AS flen,
         (i * n) // {n_frames} AS fstart, hx
  FROM t, (SELECT unnest(range({n_frames})) AS i))
SELECT doc_id, frame_idx, frame_ts_ms,
       CAST(flen AS BIGINT) AS n_frame_bytes,
       md5(substring(hx, CAST(2 * fstart + 1 AS BIGINT), CAST(2 * flen AS BIGINT)))
         AS frame_digest
FROM f ORDER BY doc_id, frame_idx
"""
