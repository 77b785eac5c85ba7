"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction
run as Arrow-batched ``mapInPandas`` over the bytes.

Header decode (``parse_image_header``) is REAL: pure-Python
struct-unpacking of PNG / JPEG / GIF / BMP container headers — format,
width, height — with no imaging library. Full pixel decode
(``decode_image_pixels``) is ALSO real for PNG (chunk walk → zlib
inflate → all-five-filter scanline reconstruction) and 24bpp BMP
(stride padding, BGR swap, bottom-up rows), stdlib only; JPEG entropy
decode still needs a DCT codec — on a cluster that one branch is a
``PIL.Image.open`` call inside the same ``mapInPandas`` slot.

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


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int = 3) -> bytearray:
    """Reverse PNG scanline filtering (spec §9, all five filter types:
    None/Sub/Up/Average/Paeth) over decompressed IDAT bytes. Pure
    stdlib — this is the part an imaging library would normally hide."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        off = y * stride
        prev = out[off - stride : off] if y > 0 else bytes(stride)
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b_ = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[off : off + stride] = line
    return out


def decode_image_pixels(b: bytes) -> tuple[str, int, int, bytes]:
    """REAL full pixel decode, stdlib only: returns (format, width,
    height, row-major RGB bytes).

    - PNG: chunk walk → concatenated IDAT → ``zlib.decompress`` →
      scanline unfiltering (all 5 filter types). 8-bit RGB (color
      type 2) only — the shape every synthetic fixture and most
      ML-ingest thumbnails use.
    - BMP: BITMAPINFOHEADER, 24 bpp uncompressed; handles the 4-byte
      row padding, BGR→RGB swap, and bottom-up vs top-down (negative
      height) row order.

    Raises ``ValueError`` on anything else (JPEG entropy decode needs a
    DCT codec — on a cluster that is one ``PIL.Image.open`` in the same
    ``mapInPandas`` slot). Callers in the contract path catch and emit a
    filterable ('unknown', -1, -1) row, never a task failure."""
    if b[:8] == _PNG_SIG:
        pos = 8
        width = height = 0
        bit_depth = color_type = None
        idat = bytearray()
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos : pos + 4])
            ctype = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if bit_depth != 8 or color_type != 2:
            raise ValueError(f"png: unsupported bit_depth/color_type {bit_depth}/{color_type}")
        if not idat:
            raise ValueError("png: no IDAT pixel data")
        raw = zlib.decompress(bytes(idat))
        return "png", width, height, bytes(_png_unfilter(raw, width, height))
    if b[:2] == b"BM":
        (data_off,) = struct.unpack("<I", b[10:14])
        hdr_size, width, height_raw, _planes, bpp = struct.unpack("<IiiHH", b[14:30])
        (compression,) = struct.unpack("<I", b[30:34]) if hdr_size >= 20 else (0,)
        if bpp != 24 or compression != 0:
            raise ValueError(f"bmp: unsupported bpp/compression {bpp}/{compression}")
        height = abs(height_raw)
        bottom_up = height_raw > 0
        row_bytes = width * 3
        stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
        out = bytearray(height * row_bytes)
        for y in range(height):
            src_row = (height - 1 - y) if bottom_up else y
            row = b[data_off + src_row * stride : data_off + src_row * stride + row_bytes]
            for x in range(width):
                # BMP stores BGR
                out[(y * width + x) * 3 + 0] = row[x * 3 + 2]
                out[(y * width + x) * 3 + 1] = row[x * 3 + 1]
                out[(y * width + x) * 3 + 2] = row[x * 3 + 0]
        return "bmp", width, height, bytes(out)
    raise ValueError("pixel decode: unsupported container (png/bmp only)")


def _pixel_value(x: int, y: int, c: int, seed: int) -> int:
    """The closed-form pixel function the synthetic fixtures carry:
    channel c of pixel (x, y) = (7x + 13y + 3c + seed) mod 256. The
    DuckDB oracle recomputes this directly from (doc_id, x, y), so the
    Spark side must round-trip it through a real container encode +
    decode to match."""
    return (7 * x + 13 * y + 3 * c + seed) % 256


def _png_filter_line(line: bytes, prev: bytes, ftype: int, bpp: int = 3) -> bytes:
    """Apply PNG filter ``ftype`` to one scanline (encode direction)."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        a = line[i - bpp] if i >= bpp else 0
        b_ = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b_
        elif ftype == 3:
            pred = (a + b_) >> 1
        else:  # Paeth
            p = a + b_ - c
            pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    chunk = ctype + data
    return struct.pack(">I", len(data)) + chunk + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)


def synth_image_rgb(fmt: str, width: int, height: int, seed: int) -> bytes:
    """Build a REAL image file whose pixels follow ``_pixel_value``.

    - ``png``: 8-bit RGB, scanline ``y`` filtered with type ``y % 5`` —
      deliberately cycles through ALL five PNG filters so the decoder's
      Sub/Up/Average/Paeth reconstruction is exercised (and checked by
      the oracle), not just the trivial None path.
    - ``bmp``: 24 bpp bottom-up with 4-byte row padding and BGR order —
      the layout quirks a naive parser gets wrong.
    """
    if fmt == "png":
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        raw = bytearray()
        prev = bytes(width * 3)
        for y in range(height):
            line = bytes(
                _pixel_value(x, y, c, seed) for x in range(width) for c in range(3)
            )
            ftype = y % 5
            raw.append(ftype)
            raw += _png_filter_line(line, prev, ftype)
            prev = line
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b"")
        )
    if fmt == "bmp":
        row_bytes = width * 3
        stride = (row_bytes + 3) & ~3
        body = bytearray()
        for src_row in range(height - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(width):
                r = _pixel_value(x, src_row, 0, seed)
                g = _pixel_value(x, src_row, 1, seed)
                b_ = _pixel_value(x, src_row, 2, seed)
                row += bytes((b_, g, r))  # BGR on disk
            row += bytes(stride - row_bytes)
            body += row
        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        header = b"BM" + struct.pack("<IHHI", 14 + len(info) + len(body), 0, 0, 14 + len(info))
        return header + info + bytes(body)
    raise ValueError(f"synth_image_rgb: unsupported format {fmt}")


def attach_pixel_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: real decodable image bytes per row (format
    alternates png/bmp by id parity; dims and pixel content are
    deterministic functions of the id) via Arrow-batched mapInPandas."""
    from trembita_spark.io import spread_scan

    cols = df.columns
    in_schema = df.schema
    # Spread the under-split local scan BEFORE the Python boundary: the
    # synthesis (and every downstream decode pipelined with it)
    # otherwise runs inside the one scan task / one Python worker
    # (io.spread_scan; no-op at production split counts).
    df = spread_scan(df, id_col)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["image"] = [
                synth_image_rgb(
                    "png" if int(i) % 2 == 0 else "bmp",
                    8 + int(i) % 16,
                    8 + int(i) % 12,
                    int(i) % 256,
                )
                for i in pdf[id_col]
            ]
            yield pdf

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)
    return df.select(*cols).mapInPandas(synth, f"{out_schema}, image binary")


def pixel_stats(df: DataFrame, payload_col: str = "image", id_col: str = "doc_id") -> DataFrame:
    """Decode a binary image column to pixels (REAL decode —
    ``decode_image_pixels``) and reduce each image to exact integer
    channel sums + dimensions, via Arrow-batched mapInPandas. Emitting
    sums (not pixel arrays) keeps the operator's output tiny regardless
    of image size — decode cost scales with bytes scanned, output with
    row count. Undecodable payloads become ('unknown', -1, ...) rows."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    fmt, w, h, px = decode_image_pixels(bytes(buf))
                    rows.append(
                        {
                            id_col: _id, "format": fmt, "width": w, "height": h,
                            "sum_r": sum(px[0::3]), "sum_g": sum(px[1::3]),
                            "sum_b": sum(px[2::3]),
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            id_col: _id, "format": "unknown", "width": -1,
                            "height": -1, "sum_r": -1, "sum_g": -1, "sum_b": -1,
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        stats,
        f"{id_col} long, format string, width int, height int, "
        "sum_r long, sum_g long, sum_b long",
    )


def attach_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: deterministic real image bytes per row (format
    and dimensions derived from the id), built with ``synth_image`` via
    Arrow-batched mapInPandas. Keeps all non-payload columns."""
    fmts = ["png", "jpeg", "gif", "bmp"]
    from trembita_spark.io import spread_scan

    cols = df.columns
    in_schema = df.schema
    # Spread the under-split local scan BEFORE the Python boundary: the
    # synthesis (and every downstream decode pipelined with it)
    # otherwise runs inside the one scan task / one Python worker
    # (io.spread_scan; no-op at production split counts).
    df = spread_scan(df, id_col)

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


# ---------------------------------------------------------------------------
# Audio: real WAV (RIFF / 16-bit PCM) encode + decode, stdlib only.
# ---------------------------------------------------------------------------


def _audio_sample(i: int, seed: int) -> int:
    """Deterministic sawtooth sample: ((7i + seed) mod 2048) − 1024.
    Shared by the synthesizer and the closed-form oracle; the decoder
    must recover it from the PCM bytes."""
    return ((7 * i + seed) % 2048) - 1024


def synth_wav(n_samples: int, seed: int, sample_rate: int = 8000) -> bytes:
    """Minimal valid RIFF/WAVE file: fmt chunk (PCM, mono, 16-bit) +
    data chunk of little-endian samples from ``_audio_sample``."""
    data = b"".join(
        struct.pack("<h", _audio_sample(i, seed)) for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(b: bytes) -> tuple[int, int, list[int]]:
    """REAL WAV decode, stdlib only: RIFF chunk walk → fmt parse
    (PCM/16-bit/mono enforced) → data chunk to int samples. Returns
    (sample_rate, n_samples, samples). Raises ValueError on non-PCM or
    malformed containers — contract callers catch into filterable rows."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE container")
    pos = 12
    rate = None
    samples: list[int] | None = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"wav: unsupported fmt/channels/bits {audio_fmt}/{channels}/{bits}")
        elif cid == b"data":
            samples = list(struct.unpack(f"<{clen // 2}h", body[: (clen // 2) * 2]))
        pos += 8 + clen + (clen & 1)  # chunks pad to even length
    if rate is None or samples is None:
        raise ValueError("wav: missing fmt or data chunk")
    return rate, len(samples), samples


def attach_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: real WAV bytes per row (length and seed derived
    from the id) via Arrow-batched mapInPandas."""
    from trembita_spark.io import spread_scan

    cols = df.columns
    in_schema = df.schema
    # Spread the under-split local scan BEFORE the Python boundary: the
    # synthesis (and every downstream decode pipelined with it)
    # otherwise runs inside the one scan task / one Python worker
    # (io.spread_scan; no-op at production split counts).
    df = spread_scan(df, id_col)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["audio"] = [
                synth_wav(32 + int(i) % 64, int(i) % 509) for i in pdf[id_col]
            ]
            yield pdf

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)
    return df.select(*cols).mapInPandas(synth, f"{out_schema}, audio binary")


def audio_features(df: DataFrame, payload_col: str = "audio", id_col: str = "doc_id") -> DataFrame:
    """Decode a binary WAV column (REAL decode — ``decode_wav``) and
    reduce each clip to exact integer features: sample count, sum of
    squares (energy), and zero-crossing count — the standard cheap
    audio-quality signals, emitted as one tiny row per clip."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, n, xs = decode_wav(bytes(buf))
                    energy = sum(x * x for x in xs)
                    zc = sum(
                        1
                        for j in range(1, n)
                        if (xs[j - 1] < 0) != (xs[j] < 0)
                    )
                    rows.append(
                        {id_col: _id, "sample_rate": rate, "n_samples": n,
                         "energy": energy, "zero_crossings": zc}
                    )
                except ValueError:
                    rows.append(
                        {id_col: _id, "sample_rate": -1, "n_samples": -1,
                         "energy": -1, "zero_crossings": -1}
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        feats,
        f"{id_col} long, sample_rate int, n_samples int, energy long, zero_crossings int",
    )


def resize_stats(
    df: DataFrame,
    payload_col: str = "image",
    id_col: str = "doc_id",
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """REAL decode + nearest-neighbor resize to (out_w, out_h), reduced
    to exact integer channel sums over the resampled grid — the
    thumbnail/normalization step of an image-training pipeline. Sample
    coordinate for output (u, v) is ``x = u*width // out_w`` (floor
    nearest-neighbor, pure integer math — engine-replayable in closed
    form). Arrow-batched mapInPandas, one tiny row out per image
    regardless of pixel count; undecodable payloads degrade to -1 rows
    (filterable, never throwing the batch)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _fmt, w, h, px = decode_image_pixels(bytes(buf))
                    rs = gs = bs = 0
                    for v in range(out_h):
                        y = (v * h) // out_h
                        for u in range(out_w):
                            x = (u * w) // out_w
                            base = (y * w + x) * 3
                            rs += px[base]
                            gs += px[base + 1]
                            bs += px[base + 2]
                    rows.append(
                        {
                            id_col: _id, "width": w, "height": h,
                            "r_sum": rs, "g_sum": gs, "b_sum": bs,
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            id_col: _id, "width": -1, "height": -1,
                            "r_sum": -1, "g_sum": -1, "b_sum": -1,
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        stats,
        f"{id_col} long, width int, height int, "
        "r_sum long, g_sum long, b_sum long",
    )


def dhash_bands(
    df: DataFrame, payload_col: str = "image", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual difference-hash (dHash) over the REAL decoded-pixel
    path, emitted as 4 x 16-bit LSH bands: (id, band_idx, band_val).

    Per image: decode (``decode_image_pixels``), sample integer
    grayscale ((r+g+b)//3) on a fixed 9x8 nearest-neighbor grid
    (gx*w//9, gy*h//8), set bit (gx, gy) when sample(gx) > sample(gx+1)
    in the same row — the classic 64-bit dHash — then split the 64 bits
    into 4 bands of two rows each. Banding IS the scale story: two
    images within Hamming distance d share at least one identical band
    when d < 4 bands... pigeonhole for d <= 3, and near-dups at larger d
    still collide with high probability — so candidate generation is a
    GROUP BY on (band_idx, band_val), never corpus x corpus, mirroring
    the MinHash-LSH shape the text side uses. All math is integer ->
    cross-engine exact. Undecodable payloads are skipped."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _fmt, w, h, px = decode_image_pixels(bytes(buf))
                except ValueError:
                    continue

                def gray(x: int, y: int) -> int:
                    o = 3 * (y * w + x)
                    return (px[o] + px[o + 1] + px[o + 2]) // 3

                s = [
                    [gray(gx * w // 9, gy * h // 8) for gx in range(9)]
                    for gy in range(8)
                ]
                for band in range(4):
                    val = 0
                    for j in range(2):
                        gy = 2 * band + j
                        for gx in range(8):
                            if s[gy][gx] > s[gy][gx + 1]:
                                val |= 1 << (j * 8 + gx)
                    rows.append({id_col: _id, "band_idx": band, "band_val": val})
            yield pd.DataFrame(rows, columns=[id_col, "band_idx", "band_val"])

    return df.select(id_col, payload_col).mapInPandas(
        hash_batches, f"{id_col} long, band_idx int, band_val long"
    )


def audio_fingerprint(
    df: DataFrame, payload_col: str = "audio", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual audio fingerprint over the REAL decoded-sample path:
    (id, fp) where fp is a 15-bit delta-sign signature — bit j set when
    sample[2j+2] > sample[2j] over the first 32 samples (every clip in
    the fixture has >= 32; real pipelines frame + window first). The
    audio analogue of image dHash: identical audio collides exactly,
    level-shifted audio collides too (delta signs ignore DC offset),
    and grouping by fp is one fixed-width hash shuffle — the exact-dedup
    plan shape on a perceptual key. Undecodable payloads are skipped."""

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _rate, n, xs = decode_wav(bytes(buf))
                except ValueError:
                    continue
                if n < 32:
                    continue
                fp = 0
                for j in range(15):
                    if xs[2 * j + 2] > xs[2 * j]:
                        fp |= 1 << j
                rows.append({id_col: _id, "fp": fp})
            yield pd.DataFrame(rows, columns=[id_col, "fp"])

    return df.select(id_col, payload_col).mapInPandas(
        fp_batches, f"{id_col} long, fp int"
    )
