"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas UDFs over mapInPandas.

Decode depth is tiered by what the environment allows:
  * HEADER decode is REAL, stdlib-only (struct over the container
    formats): PNG/GIF/BMP/JPEG dimensions, WAV sample rate / channels /
    duration. No PIL/ffmpeg needed.
  * PIXEL/SAMPLE decode is REAL for the containers stdlib + numpy can
    carry (decode_values / pixel_stats): 24-bit BI_RGB BMP pixel rows
    (stride padding, BGR order, bottom-up layout), 8/16-bit PCM WAV
    samples, non-interlaced 8-bit-depth PNG (zlib IDAT inflate +
    full scanline unfilter — None/Sub/Up/Average/Paeth — for gray,
    RGB, and RGBA color types), and non-interlaced GIF (pure-Python
    variable-width LZW + palette mapping, first frame).
  * REMAINING codecs (JPEG pixel data, palette/interlaced/16-bit PNG,
    interlaced/animated GIF frames past the first, lossy audio) stay a
    clearly-marked stub (decode_pixels_stub / error
    'codec_unavailable'): those need PIL/ffmpeg, absent in this
    container; a real deployment swaps that one function body.
The Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested either way.

Reference lineage: the per-language frontend boundary
(cpg-language-python PythonLanguageFrontend.kt:89-91 crosses into an
embedded interpreter per file) — here the boundary is executor-side
Arrow batches, the only sanctioned Python hot path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("magic", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("error", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

# magic-byte sniffing is real (pure bytes, no decoder needed)
_MAGICS = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "riff"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "mkv"),
]


def sniff_magic(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, name in _MAGICS:
        if payload.startswith(magic):
            return name
    return "unknown"


def parse_header(payload: bytes | None) -> dict:
    """REAL header-level decode, stdlib struct only — the metadata a
    curation pipeline filters on (resolution gates, sample-rate gates,
    duration caps) without ever touching a codec.

    Supported containers:
      PNG  — IHDR width/height (big-endian u32 at offset 16)
      GIF  — logical screen w/h (little-endian u16 at offset 6)
      BMP  — BITMAPINFOHEADER w/h (little-endian i32 at offset 18)
      JPEG — SOFn segment scan for height/width
      WAV  — RIFF/WAVE fmt chunk: channels, sample rate; data chunk
             size → duration_ms
    Unknown/truncated payloads return error='unsupported'/'truncated'
    with NULL fields (skip, don't fail — the frontend contract)."""
    out = {
        "width": None, "height": None, "sample_rate": None,
        "channels": None, "duration_ms": None, "error": None,
    }
    try:
        if not payload:
            out["error"] = "empty"
        elif payload.startswith(b"\x89PNG"):
            if len(payload) >= 24:
                w, h = struct.unpack(">II", payload[16:24])
                out["width"], out["height"] = w, h
            else:
                out["error"] = "truncated"
        elif payload.startswith((b"GIF87a", b"GIF89a")):
            if len(payload) >= 10:
                w, h = struct.unpack("<HH", payload[6:10])
                out["width"], out["height"] = w, h
            else:
                out["error"] = "truncated"
        elif payload.startswith(b"BM"):
            if len(payload) >= 26:
                w, h = struct.unpack("<ii", payload[18:26])
                out["width"], out["height"] = w, abs(h)  # h<0 = top-down
            else:
                out["error"] = "truncated"
        elif payload.startswith(b"\xff\xd8\xff"):
            out.update(_jpeg_dims(payload))
        elif payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            out.update(_wav_params(payload))
        else:
            out["error"] = "unsupported"
    except Exception:  # malformed container: never fail the batch
        out["error"] = "malformed"
    return out


def _jpeg_dims(payload: bytes) -> dict:
    """Walk JPEG segments to the first SOFn frame header."""
    i = 2
    n = len(payload)
    while i + 9 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return {"width": w, "height": h}
        i += 2 + seg_len
    return {"error": "truncated"}


def _wav_params(payload: bytes) -> dict:
    """RIFF chunk walk: fmt → channels/sample_rate/byte_rate,
    data → duration."""
    i = 12
    n = len(payload)
    channels = rate = byte_rate = data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, rate, byte_rate = struct.unpack(
                "<HIi", payload[i + 10 : i + 20]
            )
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None:
        return {"error": "truncated"}
    out = {"sample_rate": rate, "channels": channels}
    if data_size is not None and byte_rate:
        out["duration_ms"] = int(data_size * 1000 // byte_rate)
    return out


def decode_pixels_stub(payloads: pd.Series) -> pd.Series:
    """REMAINING-codec decode stub — the one function a real
    deployment replaces with PIL.Image.open / an audio codec. The
    container lacks those libraries, so this raises by contract rather
    than fake pixels. BMP pixels, WAV PCM samples, 8-bit non-interlaced
    PNG, and non-interlaced GIF ARE decoded for real — see
    decode_values / pixel_stats."""
    raise NotImplementedError(
        "JPEG pixels, palette/interlaced/16-bit PNG, interlaced GIF, "
        "and lossy audio require PIL/ffmpeg (absent in this "
        "environment); header decode (parse_header) and "
        "BMP/WAV/PNG/GIF value decode (decode_values) are real"
    )


def _lzw_decode(data: bytes, min_code: int) -> bytes | None:
    """GIF-flavor LZW (variable width, LSB-first bit packing, clear/end
    codes, 12-bit cap) — pure stdlib. Returns the index stream, or
    None on a corrupt code."""
    clear = 1 << min_code
    end = clear + 1
    init = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(init)
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(init)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _gif_pixels(payload: bytes) -> tuple | str:
    """Real GIF pixel decode, stdlib-only: logical-screen + color-table
    parse, extension-block skip, sub-block reassembly, LZW inflate
    (_lzw_decode), palette mapping to RGB byte triples. First image
    frame only (animation = the remaining honest gap, with interlace);
    returns (rgb ndarray [n_px, 3] int64, n_px) or an error string."""
    import numpy as np

    n = len(payload)
    if n < 13:
        return "truncated"
    packed = payload[10]
    gct_size = 2 << (packed & 0x07)
    i = 13
    gct = None
    if packed & 0x80:
        if i + 3 * gct_size > n:
            return "truncated"
        gct = payload[i : i + 3 * gct_size]
        i += 3 * gct_size
    while i < n:
        b = payload[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < n and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            if i + 10 > n:
                return "truncated"
            w, h = struct.unpack("<HH", payload[i + 5 : i + 9])
            ipack = payload[i + 9]
            i += 10
            if ipack & 0x40:  # interlaced
                return "codec_unavailable"
            pal = gct
            if ipack & 0x80:
                lct_size = 2 << (ipack & 0x07)
                if i + 3 * lct_size > n:
                    return "truncated"
                pal = payload[i : i + 3 * lct_size]
                i += 3 * lct_size
            if pal is None or i >= n:
                return "truncated"
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < n and payload[i] != 0:
                ln = payload[i]
                data += payload[i + 1 : i + 1 + ln]
                i += 1 + ln
            if i >= n:
                return "truncated"
            if not (2 <= min_code <= 8):
                return "malformed"
            idx = _lzw_decode(bytes(data), min_code)
            if idx is None:
                return "malformed"
            if len(idx) < w * h:
                return "truncated"
            arr = np.frombuffer(idx, dtype=np.uint8, count=w * h).astype(
                np.int64
            )
            if int(arr.max(initial=0)) * 3 + 2 >= len(pal):
                return "malformed"
            p = np.frombuffer(pal, dtype=np.uint8).astype(np.int64)
            rgb = p.reshape(-1, 3)[arr]
            return rgb, w * h
        elif b == 0x3B:  # trailer
            break
        else:
            return "malformed"
    return "truncated"


def _png_unfilter(payload: bytes) -> tuple | str:
    """Real PNG pixel decode, stdlib-only: chunk walk -> concatenated
    IDAT zlib inflate -> per-scanline reconstruction of all five
    filter types (RFC 2083 §6). Supported: bit depth 8, color types
    0 (gray), 2 (RGB), 6 (RGBA), non-interlaced — the shapes a
    training-data pipeline's synthetic/screenshot corpus actually
    carries. Palette/16-bit/interlaced return 'codec_unavailable'.

    Returns (recon ndarray [h, w*nch] uint8-valued int64, nch) or an
    error string. Sub/Average/Paeth recursions are per-byte sequential
    by definition; Sub vectorizes as a per-lane cumsum, Up as a row
    add, and Average/Paeth fall back to the honest per-byte loop —
    this runs executor-side inside mapInPandas, so a slow row costs
    one Arrow batch slot, never a stage."""
    import zlib

    import numpy as np

    if len(payload) < 33:
        return "truncated"
    w, h = struct.unpack(">II", payload[16:24])
    depth, ctype, _comp, _filt, interlace = payload[24:29]
    nch = {0: 1, 2: 3, 6: 4}.get(ctype)
    if depth != 8 or nch is None or interlace != 0:
        return "codec_unavailable"
    if w == 0 or h == 0:
        return "truncated"
    idat = bytearray()
    i, n = 8, len(payload)
    while i + 8 <= n:
        (clen,) = struct.unpack(">I", payload[i : i + 4])
        cid = payload[i + 4 : i + 8]
        if cid == b"IDAT":
            idat += payload[i + 8 : i + 8 + clen]
        elif cid == b"IEND":
            break
        i += 12 + clen  # length + type + data + crc
    if not idat:
        return "truncated"
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return "malformed"
    rb = w * nch  # bytes per scanline (depth 8)
    if len(raw) < h * (rb + 1):
        return "truncated"
    recon = np.zeros((h, rb), dtype=np.int64)
    prev = np.zeros(rb, dtype=np.int64)
    for y in range(h):
        off = y * (rb + 1)
        f = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=rb, offset=off + 1)
        line = line.astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: per-lane cumsum mod 256
            rec = (line.reshape(w, nch).cumsum(axis=0) % 256).reshape(rb)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average — sequential in x by definition
            rec = np.zeros(rb, dtype=np.int64)
            for j in range(rb):
                a = rec[j - nch] if j >= nch else 0
                rec[j] = (line[j] + (a + prev[j]) // 2) % 256
        elif f == 4:  # Paeth — sequential in x by definition
            rec = np.zeros(rb, dtype=np.int64)
            for j in range(rb):
                a = rec[j - nch] if j >= nch else 0
                c = prev[j - nch] if j >= nch else 0
                b = prev[j]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[j] = (line[j] + pred) % 256
        else:
            return "malformed"
        recon[y] = rec
        prev = rec
    return recon, nch


PIXEL_STATS = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_values", LongType()),
        StructField("sum_v", LongType()),
        StructField("min_v", IntegerType()),
        StructField("max_v", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("mean_v", DoubleType()),
        StructField("error", StringType()),
    ]
)


def decode_values(payload: bytes | None) -> dict:
    """REAL pixel/sample decode for the uncompressed containers the
    stdlib + numpy can carry — no PIL, no ffmpeg:

      BMP  — BI_RGB (compression 0) 24-bit only: honors the pixel-data
             offset, 4-byte row stride padding, bottom-up vs top-down
             (negative height) layout, and BGR channel order. Emits
             per-channel integer sums (sum_r/g/b), total sum, min/max
             over all channel bytes.
      WAV  — PCM (format 1), 16-bit signed LE or 8-bit unsigned, any
             channel count (samples flattened in file order). Emits
             sum/min/max over raw sample values (8-bit reported raw
             0..255 — the container convention, documented not
             rescaled).
      PNG  — non-interlaced 8-bit depth, gray/RGB/RGBA: zlib IDAT
             inflate + full five-filter scanline reconstruction
             (_png_unfilter). sum_r/g/b for RGB(A) (alpha counts in
             sum_v/n_values only); palette/16-bit/interlaced remain
             'codec_unavailable'.

    Integer sums are EXACT (no float accumulation), so the stats are
    oracle-checkable by replaying the fixture formula in SQL; mean_v
    is the single division sum_v/n_values — bit-identical in both
    engines. Compressed codecs return error='codec_unavailable' (the
    honest remaining stub); malformed containers never raise (the
    skip-don't-fail frontend contract)."""
    import numpy as np

    out = {
        "kind": None, "n_values": None, "sum_v": None, "min_v": None,
        "max_v": None, "sum_r": None, "sum_g": None, "sum_b": None,
        "mean_v": None, "error": None,
    }
    try:
        if not payload:
            out["kind"], out["error"] = "empty", "empty"
            return out
        if payload.startswith(b"BM"):
            out["kind"] = "bmp"
            if len(payload) < 34:
                out["error"] = "truncated"
                return out
            (data_off,) = struct.unpack("<I", payload[10:14])
            w, h = struct.unpack("<ii", payload[18:26])
            (bpp,) = struct.unpack("<H", payload[28:30])
            (comp,) = struct.unpack("<I", payload[30:34])
            if comp != 0 or bpp != 24:
                out["error"] = "codec_unavailable"
                return out
            habs = abs(h)
            stride = ((w * 3 + 3) // 4) * 4
            need = data_off + habs * stride
            if w <= 0 or habs == 0 or len(payload) < need:
                out["error"] = "truncated"
                return out
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=habs * stride, offset=data_off
            ).reshape(habs, stride)[:, : w * 3]
            px = rows.reshape(-1, 3).astype(np.int64)  # columns: B, G, R
            out["n_values"] = int(px.size)
            out["sum_b"] = int(px[:, 0].sum())
            out["sum_g"] = int(px[:, 1].sum())
            out["sum_r"] = int(px[:, 2].sum())
            out["sum_v"] = out["sum_b"] + out["sum_g"] + out["sum_r"]
            out["min_v"], out["max_v"] = int(px.min()), int(px.max())
        elif payload.startswith(b"\x89PNG\r\n\x1a\n"):
            out["kind"] = "png"
            dec = _png_unfilter(payload)
            if isinstance(dec, str):
                out["error"] = dec
                return out
            recon, nch = dec
            px = recon.reshape(-1, nch)
            out["n_values"] = int(px.size)
            out["sum_v"] = int(px.sum())
            out["min_v"], out["max_v"] = int(px.min()), int(px.max())
            if nch >= 3:  # RGB(A); alpha counts in sum_v only
                out["sum_r"] = int(px[:, 0].sum())
                out["sum_g"] = int(px[:, 1].sum())
                out["sum_b"] = int(px[:, 2].sum())
        elif payload.startswith((b"GIF87a", b"GIF89a")):
            out["kind"] = "gif"
            dec = _gif_pixels(payload)
            if isinstance(dec, str):
                out["error"] = dec
                return out
            rgb, _npx = dec
            out["n_values"] = int(rgb.size)
            out["sum_v"] = int(rgb.sum())
            out["min_v"], out["max_v"] = int(rgb.min()), int(rgb.max())
            out["sum_r"] = int(rgb[:, 0].sum())
            out["sum_g"] = int(rgb[:, 1].sum())
            out["sum_b"] = int(rgb[:, 2].sum())
        elif payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            out["kind"] = "wav"
            i, n = 12, len(payload)
            fmt_code = bits = None
            data = None
            while i + 8 <= n:
                cid = payload[i : i + 4]
                (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
                body = payload[i + 8 : i + 8 + size]
                if cid == b"fmt " and size >= 16:
                    fmt_code, _ch, _rate, _br, _ba, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                elif cid == b"data":
                    data = body
                i += 8 + size + (size % 2)  # chunks are word-aligned
            if fmt_code is None or data is None:
                out["error"] = "truncated"
                return out
            if fmt_code != 1 or bits not in (8, 16):
                out["error"] = "codec_unavailable"
                return out
            if bits == 16:
                vals = np.frombuffer(
                    data, dtype="<i2", count=len(data) // 2
                ).astype(np.int64)
            else:
                vals = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
            if vals.size == 0:
                out["error"] = "truncated"
                return out
            out["n_values"] = int(vals.size)
            out["sum_v"] = int(vals.sum())
            out["min_v"], out["max_v"] = int(vals.min()), int(vals.max())
        else:
            out["kind"] = sniff_magic(payload)
            out["error"] = "codec_unavailable"
            return out
        out["mean_v"] = out["sum_v"] / out["n_values"]
    except Exception:  # malformed container: never fail the batch
        # reset any partially populated stats (e.g. a zero-pixel GIF
        # sets n_values/sum_v before min() raises) so a malformed row
        # never carries misleading numbers alongside its error flag
        # (r6 ADVICE finding); only the sniffed kind survives
        kind = out.get("kind")
        out = {key: None for key in out}
        out["kind"], out["error"] = kind, "malformed"
    return out


def pixel_stats(media: DataFrame) -> DataFrame:
    """(media_id, payload:binary) -> PIXEL_STATS rows via mapInPandas:
    real value-level decode (decode_values) of uncompressed BMP pixels
    and WAV PCM samples, Arrow batches in and out — the quality-gate
    inputs (brightness/clipping/silence filters) computed without any
    codec dependency."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fields = [f.name for f in PIXEL_STATS.fields[1:]]
        for pdf in batches:
            recs = [decode_values(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    **{f: [r[f] for r in recs] for f in fields},
                }
            )

    return media.mapInPandas(extract, PIXEL_STATS)


_INT_FIELDS = ("width", "height", "sample_rate", "channels", "duration_ms")


def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, payload:binary, media_type) -> MEDIA_META rows via
    mapInPandas: one Arrow batch in, one metadata frame out; header
    fields decoded with stdlib struct (parse_header)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdrs = [parse_header(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].str.len().fillna(0).astype("int32"),
                    "magic": pdf["payload"].map(sniff_magic),
                    **{
                        f: pd.array([h[f] for h in hdrs], dtype="Int32")
                        for f in _INT_FIELDS
                    },
                    "error": pd.Series(
                        [h["error"] for h in hdrs], dtype="object"
                    ),
                }
            )
            yield out

    return media.mapInPandas(extract, MEDIA_META)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: emit one fake 'frame' per every_n_bytes
    chunk of the payload (a real deployment decodes actual frames). Shows
    the 1-to-many mapInPandas shape with stable frame indices."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                for i in range(max(1, len(payload) // every_n_bytes)):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": blobs}
            )

    return media.mapInPandas(frames, FRAME_SCHEMA)


def payload_dedup(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact byte-level dedup over an opaque binary payload — the FIRST
    pass of any multimodal curation run (identical images/audio recur
    massively on the open web), and the one that needs no codec at all:
    sha-256 over the raw bytes, corpus-first keeps the smallest id.

    Scale shape: the hash is computed JVM-side in the scan projection,
    and the payload bytes are dropped BEFORE the shuffle — only
    (id, 32-byte digest) rows move. One shuffle by digest; min/count
    are both re-aggregable, so a heavy-hitter digest (the blank-image
    problem) stays safe under AQE skew handling or an explicit salted
    pre-aggregation (operators/skew.py).

    Returns (id_col, payload_sha256, canonical_id, is_duplicate,
    n_copies); callers drop is_duplicate rows and keep the canonical —
    the decision stays theirs (drop accounting, never silent)."""
    from pyspark.sql import Window

    h = media.select(
        id_col, F.sha2(F.col(payload_col), 256).alias("payload_sha256")
    )
    w = Window.partitionBy("payload_sha256")
    canonical = F.min(id_col).over(w)
    return h.select(
        id_col,
        "payload_sha256",
        canonical.alias("canonical_id"),
        (F.col(id_col) != canonical).alias("is_duplicate"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_copies"),
    )


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the
    multimodal path is testable without binary fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text").alias("media_type"),
    )
