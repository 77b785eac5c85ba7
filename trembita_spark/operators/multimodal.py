"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction
run as Arrow-batched ``mapInPandas`` over the bytes.

Header decode (``parse_image_header``) is REAL: pure-Python
struct-unpacking of PNG / JPEG / GIF / BMP container headers — format,
width, height — with no imaging library. Full pixel decode
(``decode_image_pixels``) still requires a codec library the container
doesn't ship and raises ``NotImplementedError``; on a cluster that body
is one PIL/torchvision call inside the same ``mapInPandas`` slot.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` moderate, never collect payloads,
and push metadata-only predicates (size/kind/checksum) BEFORE any decode
so partition/row pruning happens on the cheap columns.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: synthesizes a binary payload column from text
    (the testdata has no true binary column) + the metadata struct every
    real ingest would carry."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
            F.lit("text/plain").alias("kind"),
        ),
    )


# ---------------------------------------------------------------------------
# Real header decode: pure-Python container parsing, no imaging library.
# Synthesis (encode) and parsing (decode) are deliberately independent
# code paths so the round-trip test is not circular.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synth_image(fmt: str, width: int, height: int) -> bytes:
    """Build a minimal structurally-valid image file of the given format
    and dimensions (headers + empty body). Deterministic — used to give
    the text-only fixtures a true binary image column."""
    if fmt == "png":
        ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        crc = zlib.crc32(chunk) & 0xFFFFFFFF
        return _PNG_SIG + struct.pack(">I", len(ihdr)) + chunk + struct.pack(">I", crc)
    if fmt == "jpeg":
        # SOI + APP0/JFIF + SOF0 (baseline) carrying the dimensions.
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"
    if fmt == "bmp":
        info = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 24
        header = b"BM" + struct.pack("<IHHI", 14 + len(info), 0, 0, 14 + len(info))
        return header + info
    raise ValueError(f"unknown synth format: {fmt}")


def parse_image_header(b: bytes) -> tuple[str, int, int]:
    """Decode (format, width, height) from raw image bytes by parsing the
    container header — the real, no-deps core of image decode. Returns
    ``("unknown", -1, -1)`` for unrecognized/truncated payloads instead of
    raising: at 100 TB a corrupt asset must become a filterable row, not
    a task failure."""
    try:
        if b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return "png", w, h
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0xD9):  # SOI/EOI: no payload
                    i += 2
                    continue
                seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return "jpeg", w, h
                i += 2 + seg_len
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", w, h
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return "bmp", w, abs(h)
    except (struct.error, IndexError):
        pass
    return "unknown", -1, -1


def decode_image_pixels(payload_bytes: bytes):
    """Full pixel decode. Requires a codec library the container doesn't
    ship; on a real cluster this body is
    ``PIL.Image.open(io.BytesIO(payload_bytes))`` in the same
    ``mapInPandas`` slot ``decode_headers`` uses."""
    raise NotImplementedError(
        "pixel decode requires an imaging library not present in this "
        "environment; header decode (parse_image_header) is real"
    )


def attach_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: deterministic real image bytes per row (format
    and dimensions derived from the id), built with ``synth_image`` via
    Arrow-batched mapInPandas. Keeps all non-payload columns."""
    fmts = ["png", "jpeg", "gif", "bmp"]
    cols = df.columns
    in_schema = df.schema

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["image"] = [
                synth_image(fmts[int(i) % 4], 16 + int(i) % 64, 16 + int(i) % 48)
                for i in pdf[id_col]
            ]
            yield pdf

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)
    return df.select(*cols).mapInPandas(synth, f"{out_schema}, image binary")


def decode_headers(df: DataFrame, payload_col: str = "image", id_col: str = "doc_id") -> DataFrame:
    """Header-decode a binary image column → (id, format, width, height,
    n_bytes) via Arrow-batched mapInPandas. Select only (id, payload)
    upstream so column pruning keeps the scan narrow; corrupt payloads
    yield ('unknown', -1, -1) rows for downstream filtering."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                fmt, w, h = parse_image_header(b)
                rows.append(
                    {id_col: _id, "format": fmt, "width": w, "height": h, "n_bytes": len(b)}
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        dec, f"{id_col} long, format string, width int, height int, n_bytes long"
    )


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling over a binary stream column (the video-ingest
    keyframe pattern): cut the payload into fixed ``frame_bytes`` frames,
    keep every ``stride``-th, emit (id, frame_id, frame_md5). Pure
    Catalyst expressions — sequence + substring over binary + md5 —
    ZERO Python, zero shuffle: runs at scan bandwidth. Emitting the
    content hash (not the bytes) keeps result rows tiny; a real pipeline
    would instead hand the sampled frame bytes to the decode slot
    (``decode_image_pixels``)."""
    n_frames = f"CAST(floor(octet_length({payload_col}) / {frame_bytes}) AS INT)"
    # Guard the empty case: sequence(0, -1, k) throws on inverted bounds,
    # so payloads shorter than one frame must short-circuit to an empty
    # array (the row then vanishes at explode — same as the oracle's
    # generate_series semantics).
    frames = F.expr(
        f"CASE WHEN {n_frames} >= 1 THEN "
        f"transform(sequence(0, {n_frames} - 1, {stride}), "
        f"i -> struct(i AS frame_id, "
        f"md5(substring({payload_col}, i * {frame_bytes} + 1, {frame_bytes})) AS frame_md5)) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<frame_id: INT, frame_md5: STRING>>) END"
    )
    return (
        df.select(F.col(id_col), F.explode(frames).alias("f"))
        .select(
            id_col,
            F.col("f.frame_id").alias("frame_id"),
            F.col("f.frame_md5").alias("frame_md5"),
        )
    )


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (the real
    decode slot). Deterministic fake: first FEATURE_DIM byte values as
    float features + byte-sum — exercises the exact Arrow batch shape a
    real extractor (CLIP/whisper/resize) would use."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                head = list(b[:FEATURE_DIM]) + [0] * max(0, FEATURE_DIM - len(b))
                feats.append(
                    {
                        id_col: _id,
                        "features": [float(x) for x in head],
                        "byte_sum": int(sum(b)),
                    }
                )
            yield pd.DataFrame(feats)

    return df.select(id_col, payload_col).mapInPandas(
        fe, f"{id_col} long, features array<double>, byte_sum long"
    )
