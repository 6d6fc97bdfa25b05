"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as a ``binary`` column with a typed
metadata struct next to it. Decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas iterators over
``mapInPandas`` — the Spark-side contract (schema, partitioning, batch
shape) is real and tested. The pixel tier is layered (r11): Pillow
when importable, a dependency-free PNG IHDR header parse for
dimensions (real even in this codec-less container), and the
deterministic digest fake as the test default; a payload no enabled
tier can handle raises ``NotImplementedError``.

At 100 TB the payload column dominates I/O: keep it in its own parquet
column (column pruning skips it unless selected), size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits the
Arrow buffer, and never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# Typed metadata schema for extracted features.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload_bytes", IntegerType(), False),
        StructField("checksum_sha256", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: treat the document text's UTF-8 bytes as an
    opaque media payload (the container has no real media files)."""
    return df.withColumn("payload", F.col(text_col).cast(BinaryType()))


def _pillow():
    """Import-gated Pillow handle (None when absent — the container
    default). Cached per process so the executor-side per-batch loops
    pay one import, not one per call."""
    global _PIL_IMAGE
    if _PIL_IMAGE is _UNRESOLVED:
        try:
            from PIL import Image

            _PIL_IMAGE = Image
        except Exception:
            _PIL_IMAGE = None
    return _PIL_IMAGE


_UNRESOLVED = object()
_PIL_IMAGE = _UNRESOLVED

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_ihdr(payload: bytes):
    """Real, dependency-free PNG dimension decode: the IHDR chunk is
    mandatory, first, and fixed-layout (width/height as big-endian
    u32 at bytes 16..24), so a header peek needs only ``struct`` —
    the 100 TB shape for metadata extraction anyway (never inflate
    pixels to learn a size). Returns (w, h) or None."""
    import struct

    if (
        len(payload) >= 24
        and payload[:8] == _PNG_MAGIC
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    return None


def decode_media(payload: bytes, media_type: str = "image",
                 allow_fake: bool = False):
    """Decoder seam — three tiers, most-real-first:

    1. **Pillow**, when importable (not in this container): full
       decode, real dimensions, real frame count (``n_frames`` for
       animated formats).
    2. **stdlib PNG header parse** (always available): real
       width/height from the mandatory IHDR chunk — no codec library,
       no pixel inflation.
    3. **deterministic fake** (``allow_fake=True``): digest-derived
       dimensions, enough to exercise the full distributed plumbing
       and unit-test downstream logic. This remains the TEST DEFAULT
       for non-image payloads so fixtures behave identically with and
       without Pillow installed.

    A payload no available tier can decode raises
    (``NotImplementedError`` keeps the historical contract). Codec
    CHOICE beyond Pillow (turbojpeg, GPU, sandboxing untrusted
    payloads) stays a deployment concern (SCALE.md §8): a deployment
    plugs its decoder into this signature and the distributed
    plumbing (schema, partitioning, Arrow batch shape, determinism
    tests) is already in place.
    """
    Image = _pillow()
    if Image is not None:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as img:
                return {
                    "width": int(img.size[0]),
                    "height": int(img.size[1]),
                    "n_frames": int(getattr(img, "n_frames", 1)),
                }
        except Exception:
            pass  # not Pillow-decodable: fall through to the next tier
    dims = _png_ihdr(payload)
    if dims is not None:
        return {"width": dims[0], "height": dims[1], "n_frames": 1}
    if not allow_fake:
        raise NotImplementedError(
            "payload not decodable by any available tier (Pillow "
            "absent or failed; not a PNG); pass allow_fake=True for "
            "the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0] % 192,        # 64..255 px
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 8,
    }


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type: str = "image",
    allow_fake: bool = True,
) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    Arrow streams batches of (id, payload) into pandas; each batch
    yields one metadata frame. Per-batch (not per-row) Python — the
    pattern scales to any decode library. Batch size is controlled by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode_media(bytes(p), media_type, allow_fake=allow_fake)
                    for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_bytes": payloads.map(len).astype("int32"),
                    "checksum_sha256": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "media_type": media_type,
                    "width": pd.array([m["width"] for m in meta], dtype="Int32"),
                    "height": pd.array([m["height"] for m in meta], dtype="Int32"),
                    "n_frames": pd.array([m["n_frames"] for m in meta], dtype="Int32"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=MEDIA_META_SCHEMA
    )


def media_meta_oracle(table: str = "documents") -> str:
    """Oracle for the engine-verifiable part of the extraction (byte
    length + checksum are content-determined; fake dimensions are not
    SQL-expressible and are unit-tested instead)."""
    return f"""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS INT) AS payload_bytes,
               sha256(text) AS checksum_sha256
        FROM {table}
    """


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize_media(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    allow_fake: bool = True,
) -> DataFrame:
    """Resize every payload to (width, height) via ``mapInPandas``.

    Spark-side contract is real: binary in, binary out, one output row
    per input row, batch-at-a-time Python. Pixel work runs through
    Pillow when importable (bytes in → bilinear resize → PNG bytes
    out); otherwise — or for a payload Pillow cannot open — the fake
    "resized" payload is the SHA-256 of (payload ‖ dims), deterministic
    across runs/partitions, so downstream dedup/caching logic stays
    testable in codec-less containers. ``allow_fake=False`` makes an
    undecodable payload raise instead of degrading silently.
    """

    def _resize_one(raw: bytes, dims: bytes) -> bytes:
        Image = _pillow()
        if Image is not None:
            import io

            try:
                with Image.open(io.BytesIO(raw)) as img:
                    out = io.BytesIO()
                    # resample pinned explicitly: Pillow's default has
                    # changed across versions (bicubic today), and a
                    # version-dependent kernel would break byte-level
                    # determinism of the output payloads
                    img.resize(
                        (width, height), Image.Resampling.BILINEAR
                    ).save(out, format="PNG")
                    return out.getvalue()
            except Exception:
                pass  # not Pillow-decodable: fake tier below
        if not allow_fake:
            raise NotImplementedError(
                "payload not resizable (Pillow absent or failed); pass "
                "allow_fake=True for the deterministic stub"
            )
        return hashlib.sha256(raw + dims).digest()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        dims = f"{width}x{height}".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf[payload_col].map(
                        lambda p: _resize_one(bytes(p), dims)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    allow_fake: bool = True,
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video payload — a
    fan-out ``mapInPandas`` (one input row → k output rows, so the
    output row count is data-dependent; Spark handles this natively
    because mapInPandas yields frames, not row-aligned columns).

    Frame count comes from :func:`decode_media` (real under Pillow or
    the PNG tier, digest-derived under the fake). Frame PAYLOADS are
    real PNG re-encodes when Pillow can seek the payload's frames —
    the container opens ONCE per document and seeks per frame, never
    re-parsing the payload per frame; otherwise each fake frame
    payload is SHA-256(payload ‖ frame_idx), requiring
    ``allow_fake=True`` exactly like the other operators here.
    """

    def _doc_frames(raw: bytes, wanted: list[int]) -> list[bytes]:
        Image = _pillow()
        if Image is not None:
            import io

            try:
                with Image.open(io.BytesIO(raw)) as img:
                    out = []
                    for i in wanted:
                        img.seek(i)
                        buf = io.BytesIO()
                        img.convert("RGB").save(buf, format="PNG")
                        out.append(buf.getvalue())
                    return out
            except Exception:
                pass  # not Pillow-seekable: fake tier below
        if not allow_fake:
            raise NotImplementedError(
                "frame extraction not possible for this payload "
                "(Pillow absent or failed); pass allow_fake=True for "
                "the deterministic stub"
            )
        return [
            hashlib.sha256(raw + i.to_bytes(4, "big")).digest()
            for i in wanted
        ]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                meta = decode_media(raw, "video", allow_fake=allow_fake)
                wanted = list(range(0, meta["n_frames"], every_n))
                ids.extend([int(doc_id)] * len(wanted))
                idxs.extend(wanted)
                frames.extend(_doc_frames(raw, wanted))
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"),
                 "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_payload": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=FRAME_SCHEMA
    )
