"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north star).

The Spark-side plumbing is real and tested — BinaryType payload column,
typed metadata struct (schemas.MEDIA), Arrow-batched ``mapInPandas``
operators with explicit output schemas, partition-count-preserving
plans. The codec step itself (PIL/ffmpeg/librosa) is NOT in this
container, so decode is gated: ``decoder="fake"`` runs a deterministic
stand-in (md5-derived pixels/dims) used by tests and oracles;
``decoder="real"`` raises NotImplementedError unless the optional libs
import cleanly.

Scale notes: binary payloads dominate row size, so operators here
(a) never shuffle payload bytes — feature extraction happens before any
groupBy; (b) use ``mapInPandas`` (streaming Arrow batches, bounded
memory) rather than collect-style UDFs; (c) cap Arrow batch bytes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` in session.py.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional real decoders — not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

DECODE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_md5 string, "
    "width int, height int, n_frames int"
)


def attach_bytes(df: DataFrame, src_col: str, kind: str = "image") -> DataFrame:
    """Build a media table from any string/binary column: payload bytes
    + typed metadata struct (schemas.MEDIA shape)."""
    payload = F.col(src_col).cast("binary")
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("bytes"),
        F.struct(
            F.lit(f"application/x-{kind}").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from the md5 of the payload. Mirrors what a real decode
    would return shape-wise; values are stable for oracle checks."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 + h[2] % 8
    return width, height, n_frames


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract binary media via Arrow-batched
    ``mapInPandas``. Output schema is fixed (DECODE_SCHEMA) so the
    plan is stable regardless of decoder.
    """
    if decoder == "real" and not _HAS_PIL:
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg, not available in this container; "
            "use decoder='fake' for the deterministic stand-in"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["bytes"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    if decoder == "real":
        # real codecs burn CPU per row: spread a compacted input across
        # cores. The fake decoder is ~free, so fanning it out would pay
        # a byte-shuffle for nothing (measured 0.3 -> 0.8s at sf0.1).
        from ..sources.layout import fan_out

        df = fan_out(df)
    return df.mapInPandas(op, schema=DECODE_SCHEMA)


# -- pure-Python image HEADER codecs (round-5 verdict task #7) -----------
#
# The container ships no PIL/ffmpeg, but the JPEG/PNG CONTAINER formats
# are public knowledge and dependency-free to parse: PNG's IHDR chunk
# and JPEG's SOFn/APP1(EXIF) markers carry dimensions, channel count,
# and orientation. Parsing them closes the metadata half of the codec
# stub — decode_headers computes from REAL bytes; only pixel decode
# remains gated behind the optional libs.

PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG SOFn markers carrying frame dimensions (C4/C8/CC are
#: DHT/JPG/DAC, not frames)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def png_header(data: bytes) -> dict | None:
    """Parse a PNG signature + IHDR chunk. Returns kind/width/height/
    channels/orientation (PNG has no orientation — always 1), or None
    if the bytes are not a PNG."""
    if len(data) < 33 or not data.startswith(PNG_SIG) or data[12:16] != b"IHDR":
        return None
    channels = _PNG_CHANNELS.get(data[25])
    if channels is None:
        return None
    return {
        "kind": "png",
        "width": int.from_bytes(data[16:20], "big"),
        "height": int.from_bytes(data[20:24], "big"),
        "channels": channels,
        "orientation": 1,
    }


def _exif_orientation(tiff: bytes) -> int | None:
    """Orientation (tag 0x0112) from a TIFF blob inside an EXIF APP1
    segment; handles both byte orders, returns None when absent or
    malformed (caller keeps the default)."""
    if tiff[:2] == b"II":
        endian = "little"
    elif tiff[:2] == b"MM":
        endian = "big"
    else:
        return None
    if int.from_bytes(tiff[2:4], endian) != 42:
        return None
    off = int.from_bytes(tiff[4:8], endian)
    if off + 2 > len(tiff):
        return None
    n_entries = int.from_bytes(tiff[off : off + 2], endian)
    for i in range(n_entries):
        e = off + 2 + 12 * i
        if e + 12 > len(tiff):
            return None
        if int.from_bytes(tiff[e : e + 2], endian) == 0x0112:
            return int.from_bytes(tiff[e + 8 : e + 10], endian)
    return None


def jpeg_header(data: bytes) -> dict | None:
    """Walk a JPEG marker stream: dimensions + component count from
    the first SOFn frame header, EXIF orientation from APP1 when
    present (default 1). Returns None if the bytes are not a JPEG."""
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        return None
    pos = 2
    out: dict | None = None
    orientation = 1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            pos += 2
            continue
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > len(data):
            break
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            orientation = _exif_orientation(seg[6:]) or orientation
        if marker in _JPEG_SOF and len(seg) >= 6:
            out = {
                "kind": "jpeg",
                "height": int.from_bytes(seg[1:3], "big"),
                "width": int.from_bytes(seg[3:5], "big"),
                "channels": seg[5],
            }
        pos += 2 + seg_len
    if out is None:
        return None
    out["orientation"] = orientation
    return out


def parse_media_header(data: bytes) -> dict | None:
    """Dispatch on magic bytes: PNG, then JPEG; None for anything else
    (opaque payloads stay opaque — the multimodal contract)."""
    return png_header(data) or jpeg_header(data)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def synth_png(width: int, height: int, rgb: tuple[int, int, int] = (128, 128, 128)) -> bytes:
    """A REAL (spec-valid, zlib-compressed, CRC-correct) solid-color
    8-bit RGB PNG, stdlib-only — the deterministic fixture generator
    for header-parsing oracles. This is a genuine ENcode; pixel DEcode
    stays stubbed per the container's no-codec-libs constraint."""
    import struct

    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter type 0 per scanline
    idat = zlib.compress(row * height)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def synth_jpeg(width: int, height: int, orientation: int = 1) -> bytes:
    """A structurally-real JPEG marker stream: SOI, APP1/EXIF carrying
    the orientation tag (little-endian TIFF, IFD0), an SOF0 frame
    header with real dimensions, EOI. No entropy-coded scan — this is
    a HEADER fixture (the parse target), not a decodable image."""
    import struct

    tiff = b"II*\x00" + struct.pack("<I", 8)
    ifd = (
        struct.pack("<H", 1)  # one entry
        + struct.pack("<HHI", 0x0112, 3, 1)  # orientation, SHORT, count 1
        + struct.pack("<HH", orientation, 0)  # value in the 4-byte slot
        + struct.pack("<I", 0)  # no next IFD
    )
    exif = b"Exif\x00\x00" + tiff + ifd
    app1 = b"\xFF\xE1" + struct.pack(">H", len(exif) + 2) + exif
    sof0 = b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, height, width, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return b"\xFF\xD8" + app1 + sof0 + b"\xFF\xD9"


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-encoded media fixtures, one per input row:
    even ids get a real RGB PNG, odd ids a structurally-real
    EXIF-tagged JPEG header stream — dimensions/orientation derived
    from the id so DuckDB oracles can state them in closed form."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for raw in pdf[id_col]:
                i = int(raw)
                w, h = 16 + i % 48, 16 + (i * 7) % 48
                if i % 2 == 0:
                    payloads.append(
                        synth_png(w, h, (i % 256, (i * 3) % 256, (i * 5) % 256))
                    )
                else:
                    payloads.append(synth_jpeg(w, h, orientation=1 + i % 8))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": ["image"] * len(payloads),
                    "bytes": payloads,
                }
            )

    return df.mapInPandas(op, schema="media_id long, kind string, bytes binary")


HEADER_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "channels int, orientation int"
)


def decode_headers(df: DataFrame) -> DataFrame:
    """Metadata decode from REAL bytes: Arrow-batched mapInPandas over
    (media_id, bytes), parsing PNG IHDR / JPEG SOFn+EXIF headers.
    Unrecognized payloads come back kind='unknown' with null dims
    (opaque, never an error — a 100 TB crawl always carries junk).
    Same plumbing contract as decode_media: payload bytes never
    shuffle, output schema fixed, batches streamed."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, p in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(p)
                h = parse_media_header(b)
                if h is None:
                    recs.append((mid, "unknown", len(b), None, None, None, None))
                else:
                    recs.append(
                        (
                            mid,
                            h["kind"],
                            len(b),
                            h["width"],
                            h["height"],
                            h["channels"],
                            h["orientation"],
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "orientation",
                ],
            )

    return df.mapInPandas(op, schema=HEADER_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, out_width int, out_height int"


def resize_plan(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize planning (aspect-preserving fit into max_side^2) — pure
    column math; the pixel work would live in the decode UDF."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_height"),
    )


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plan for video-kind media: explode frame indices
    0..n_frames-1, keep every n-th (the decoded-frame fetch is the
    stubbed codec step)."""
    return (
        decoded.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .where(F.col("frame_idx") % every_n == 0)
    )


def perceptual_dhash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Perceptual difference-hash (dHash: 9x8 grayscale grid -> 64
    row-gradient bits; the standard public recipe, e.g. Krawetz's
    "Kind of Like That", 2013) over the media decode surface — the
    image near-dup signature a multimodal training pipeline dedups on.

    Pixel DECODE stays container-gated (driver mandate), so the 9x8
    grid derives deterministically from the payload digest (one md5
    per grid row — the same fake-decode device as decode_media); with
    codecs present, the grid source becomes the real resized-grayscale
    pixels and NOTHING downstream changes. Everything here is pure JVM
    expressions (md5/substr/conv/bitwise — zero Python), and the hash
    is emitted as two long halves each < 2^32 so no engine ever
    touches the sign bit.

    Returns (id, dhash_hi, dhash_lo)."""
    payload_md5 = F.md5(F.col("bytes"))
    row_hex = [F.md5(F.concat(payload_md5, F.lit(f":{r}"))) for r in range(8)]

    def px(r: int, c: int):
        # 9 pixels per row = hex pairs 1..18 of the row digest
        return F.conv(F.substring(row_hex[r], 2 * c + 1, 2), 16, 10).cast("int")

    hi = F.lit(0).cast("long")
    lo = F.lit(0).cast("long")
    for r in range(8):
        for c in range(8):
            b = r * 8 + c
            v = F.when(
                px(r, c) > px(r, c + 1),
                F.shiftleft(F.lit(1).cast("long"), b % 32),
            ).otherwise(F.lit(0).cast("long"))
            if b < 32:
                lo = lo.bitwiseOR(v)
            else:
                hi = hi.bitwiseOR(v)
    return media.select(F.col(id_col), hi.alias("dhash_hi"), lo.alias("dhash_lo"))


def dhash_hamming_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    max_band_size: int | None = None,
    overflow: str = "star",
) -> DataFrame:
    """Image near-dup pairs by dHash hamming distance — the
    dedup.simhash_hamming_pairs device applied to the two-half 64-bit
    signature: four 16-bit bands (pigeonhole-complete for
    max_hamming <= 3), band-bucket candidate generation via
    ``dedup.band_bucket_pairs`` (one grouped scan, no self-join),
    exact bit_count(xor) verify summed across the halves. At 100 TB
    each band bucket holds only colliding signatures; the verify is
    integer ALU work.

    A web-scale image corpus is full of byte-identical / near-blank
    images sharing ONE dHash — a single 16-bit band bucket going
    C(m,2) in one task. ``max_band_size`` with ``overflow="star"``
    (m-1 connectivity-equivalent edges to the bucket-min id, all
    hamming-0 for the identical-signature swarm that realistically
    overflows) is the escape hatch; ``overflow="drop"`` discards the
    bucket instead."""
    from .dedup import band_bucket_pairs

    mask = (1 << 16) - 1
    band_val = {
        0: F.col("dhash_lo").bitwiseAND(F.lit(mask)),
        1: F.shiftright(F.col("dhash_lo"), 16).bitwiseAND(F.lit(mask)),
        2: F.col("dhash_hi").bitwiseAND(F.lit(mask)),
        3: F.shiftright(F.col("dhash_hi"), 16).bitwiseAND(F.lit(mask)),
    }
    bands = sigs.select(
        F.col(id_col),
        "dhash_hi",
        "dhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_val[b].alias("val"))
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        F.col(id_col),
        "dhash_hi",
        "dhash_lo",
        F.col("bk.band").alias("band"),
        F.col("bk.val").alias("val"),
    )
    cand = band_bucket_pairs(
        bands, id_col, ["dhash_hi", "dhash_lo"], max_band_size, overflow
    )
    hamming = F.bit_count(
        F.col("dhash_hi_a").bitwiseXOR(F.col("dhash_hi_b"))
    ) + F.bit_count(F.col("dhash_lo_a").bitwiseXOR(F.col("dhash_lo_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"), "hamming")
    )
