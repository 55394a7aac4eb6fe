"""Multimodal column handling: opaque binary payloads + typed metadata.

The *decode* step is REAL for two formats with stdlib-only codecs:

- **PNG**: ``png_encode`` builds valid 8-bit-grayscale PNGs (signature,
  IHDR, zlib IDAT with per-row filter bytes, CRC-32 per chunk) and
  ``decode_png_metadata`` parses them back — signature check, IHDR
  field extraction, CRC verification, and a full IDAT inflate whose
  length is checked against height·(width+1).
- **WAV**: ``wav_encode`` builds valid RIFF/WAVE PCM files and
  ``decode_wav_metadata`` walks the chunk list to the ``fmt `` and
  ``data`` chunks — sample rate, channels, bit depth, sample count,
  duration.

Because the container has no image/audio testdata, payload *synthesis*
derives dimensions/rates from the doc id and pixel/sample content from
the document text — so the DuckDB oracle can predict the decoded header
values arithmetically while the Spark side genuinely round-trips real
binary formats (a broken encoder or parser fails the CRC/inflate/chunk
checks, not just an echo comparison).

Model-backed steps (feature extraction, resize re-encode) remain
clearly-marked ``NotImplementedError`` stubs — those genuinely need
codec/model libraries this container lacks.

At 100 TB: payloads stay in executor-local Arrow batches end-to-end
(never on the driver); batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``; per-row cost is
embarrassingly parallel."""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (utf-8 payload standing in
    for image/audio bytes) + byte length, as a real BinaryType column."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "n_bytes", F.octet_length("payload").cast("long")
    )


# ---------------------------------------------------------------------------
# Real stdlib codecs: PNG (zlib/struct) and WAV (RIFF/struct)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Valid 8-bit grayscale PNG: signature, IHDR, one zlib IDAT with
    filter byte 0 per scanline, IEND — all CRCs real."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        # level 1: the synthetic pixel bytes are hash output
        # (incompressible), so higher levels only burn encoder CPU
        + _png_chunk(b"IDAT", zlib.compress(raw, 1))
        + _png_chunk(b"IEND", b"")
    )


def png_parse(raw: bytes) -> Tuple[int, int, int, int, bool]:
    """Parse and verify a PNG: returns (width, height, bit_depth,
    color_type, pixels_ok). Checks the 8-byte signature, IHDR length and
    CRC, then inflates the IDAT stream and verifies the decompressed
    length equals height·(width+1) (one filter byte per scanline) —
    i.e. the image data is genuinely decoded, not just the header."""
    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    (length,) = struct.unpack(">I", raw[8:12])
    if raw[12:16] != b"IHDR" or length != 13:
        raise ValueError("first chunk is not IHDR")
    ihdr = raw[16:29]
    (crc,) = struct.unpack(">I", raw[29:33])
    if zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF != crc:
        raise ValueError("IHDR CRC mismatch")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", ihdr[:10])
    # walk chunks, concatenating IDAT data
    idat, pos = b"", 33
    while pos + 8 <= len(raw):
        (clen,) = struct.unpack(">I", raw[pos : pos + 4])
        if pos + 12 + clen > len(raw):
            # malformed input must surface as the ValueError contract,
            # not a struct.error from a short CRC slice
            raise ValueError("truncated PNG chunk")
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + clen]
        (ccrc,) = struct.unpack(">I", raw[pos + 8 + clen : pos + 12 + clen])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != ccrc:
            raise ValueError(f"{tag!r} CRC mismatch")
        if tag == b"IDAT":
            idat += data
        if tag == b"IEND":
            break
        pos += 12 + clen
    pixels_ok = len(zlib.decompress(idat)) == height * (width + 1)
    return width, height, bit_depth, color_type, pixels_ok


def wav_encode(sample_rate: int, n_channels: int, samples: bytes) -> bytes:
    """Valid RIFF/WAVE PCM-16 file: RIFF header, ``fmt `` chunk, ``data``
    chunk. ``samples`` is the raw little-endian PCM byte stream (length
    must be a multiple of the 16-bit frame size)."""
    bits = 16
    block_align = n_channels * bits // 8
    if len(samples) % block_align:
        raise ValueError("samples not frame-aligned")
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_parse(raw: bytes) -> Tuple[int, int, int, int]:
    """Parse a RIFF/WAVE file by walking its chunk list: returns
    (sample_rate, n_channels, bits_per_sample, n_samples). Verifies the
    RIFF/WAVE magic, the declared RIFF size, and PCM format."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", raw[4:8])
    if riff_size != len(raw) - 8:
        raise ValueError("RIFF size mismatch")
    pos, fmt_info, data_len = 12, None, None
    while pos + 8 <= len(raw):
        tag = raw[pos : pos + 4]
        (clen,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if tag == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, block_align, bits = (
                struct.unpack("<HHIIHH", raw[pos + 8 : pos + 24])
            )
            if audio_fmt != 1:
                raise ValueError("not PCM")
            fmt_info = (sample_rate, n_channels, bits, block_align)
        elif tag == b"data":
            data_len = clen
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt_info is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    sample_rate, n_channels, bits, block_align = fmt_info
    return sample_rate, n_channels, bits, data_len // block_align


def _tile(seed: bytes, n: int) -> bytes:
    """Deterministically expand a digest to n bytes by repetition (no
    RNG — reproducible across partitions). Repetition, not counter-mode
    rehashing: the decode queries verify structure (CRCs, inflate
    length, chunk walk), never payload entropy, and rehashing costs
    ~n/16 md5 calls per document on the hot path for nothing."""
    return (seed * (n // len(seed) + 1))[:n]


PNG_DECODE_SCHEMA = (
    "doc_id long, width int, height int, bit_depth int, color_type int, "
    "pixels_ok boolean"
)
WAV_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, bits_per_sample int, "
    "n_samples int, duration_ms double"
)


def attach_png_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a real PNG per document: width/height from doc-id
    arithmetic (so the oracle can predict them), pixel bytes tiled from
    the text digest. Output: (doc_id, payload binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = 1 + int(doc_id) % 64
                h = 1 + (int(doc_id) * 7) % 48
                pix = _tile(hashlib.md5(text.encode()).digest(), w * h)
                payloads.append(png_encode(w, h, pix))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id long, payload binary"
    )


def decode_png_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL PNG decode over the binary column: signature +
    IHDR + per-chunk CRC verification + full IDAT inflate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [png_parse(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([r[0] for r in rows], dtype="int32"),
                    "height": pd.Series([r[1] for r in rows], dtype="int32"),
                    "bit_depth": pd.Series([r[2] for r in rows], dtype="int32"),
                    "color_type": pd.Series([r[3] for r in rows], dtype="int32"),
                    "pixels_ok": pd.Series([r[4] for r in rows], dtype="bool"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, PNG_DECODE_SCHEMA)


def attach_wav_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a real WAV per document: rate/channels/length from
    doc-id arithmetic, PCM sample bytes tiled from the text digest."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                d = int(doc_id)
                rate = 8000 + (d % 8) * 1000
                ch = 1 + d % 2
                n_samples = 100 + d % 50
                pcm = _tile(
                    hashlib.md5(text.encode()).digest(), n_samples * ch * 2
                )
                payloads.append(wav_encode(rate, ch, pcm))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id long, payload binary"
    )


def decode_wav_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode: RIFF chunk walk → rate, channels,
    bit depth, sample count, duration (ms, one IEEE division)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [wav_parse(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series([r[0] for r in rows], dtype="int32"),
                    "n_channels": pd.Series([r[1] for r in rows], dtype="int32"),
                    "bits_per_sample": pd.Series(
                        [r[2] for r in rows], dtype="int32"
                    ),
                    "n_samples": pd.Series([r[3] for r in rows], dtype="int32"),
                    "duration_ms": pd.Series(
                        [r[3] * 1000.0 / r[0] for r in rows], dtype="float64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, WAV_DECODE_SCHEMA)


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id long, features array<double>"
RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes long"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def extract_features(df: DataFrame, real_extract: bool = False) -> DataFrame:
    """Feature-extraction operator shape: binary payload → fixed-length
    embedding (``array<double>``). The real extractor (image/audio
    model) is the ``real_extract=True`` integration point — STUB
    (``NotImplementedError``) since no model runtime is present; the
    deterministic default derives features from byte statistics so the
    Arrow plumbing and output schema are real and testable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_extract:
                raise NotImplementedError(
                    "real feature extraction requires a model runtime not "
                    "present in this environment (STUB)"
                )
            feats = [
                [
                    float(int(hashlib.md5(bytes(b) + bytes([i])).hexdigest()[:8], 16))
                    / 16**8
                    for i in range(FEATURE_DIM)
                ]
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


def resize_stub(df: DataFrame, width: int = 224, height: int = 224,
                real_resize: bool = False) -> DataFrame:
    """Resize operator shape: new target dims + untouched byte length
    (a real implementation re-encodes the payload — STUB, codec libs
    absent)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_resize:
                raise NotImplementedError("real resize requires codec libs (STUB)")
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "n_bytes": n,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling operator shape for video-like payloads: one output
    row per sampled frame (byte-stride stand-in for time-stride),
    frame id = hash of the sampled slice — shows the 1→N mapInPandas
    row-expansion pattern with bounded memory per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for k, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(k)
                    hashes.append(hashlib.md5(raw[off:off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)


def png_gray_pixels(raw: bytes):
    """Full PNG decode to grayscale pixel bytes: one validated chunk
    walk (signature, IHDR length + CRC, per-chunk CRC — the same checks
    as :func:`png_parse`), ONE inflate, then a vectorized strip of the
    per-scanline filter byte (the encoder writes filter 0 / None).
    Returns ``(width, height, pixels)`` with
    ``len(pixels) == width·height``. (Earlier revisions delegated the
    walk to ``png_parse`` and re-inflated the IDAT stream a second time
    for the pixels — this is the single-pass rewrite.)"""
    import numpy as np

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    (length,) = struct.unpack(">I", raw[8:12])
    if raw[12:16] != b"IHDR" or length != 13:
        raise ValueError("first chunk is not IHDR")
    ihdr = raw[16:29]
    (crc,) = struct.unpack(">I", raw[29:33])
    if zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF != crc:
        raise ValueError("IHDR CRC mismatch")
    width, height, _bd, _ct = struct.unpack(">IIBB", ihdr[:10])
    idat, pos = b"", 33
    while pos + 8 <= len(raw):
        (clen,) = struct.unpack(">I", raw[pos : pos + 4])
        if pos + 12 + clen > len(raw):
            # malformed input must surface as the ValueError contract,
            # not a struct.error from a short CRC slice
            raise ValueError("truncated PNG chunk")
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + clen]
        (ccrc,) = struct.unpack(">I", raw[pos + 8 + clen : pos + 12 + clen])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != ccrc:
            raise ValueError(f"{tag!r} CRC mismatch")
        if tag == b"IDAT":
            idat += data
        if tag == b"IEND":
            break
        pos += 12 + clen
    flat = zlib.decompress(idat)
    if len(flat) != height * (width + 1):
        raise ValueError("PNG pixel stream length mismatch")
    pixels = (
        np.frombuffer(flat, dtype=np.uint8)
        .reshape(height, width + 1)[:, 1:]
        .tobytes()
    )
    return width, height, pixels


AHASH_SCHEMA = (
    "doc_id long, width int, height int, ahash_bits string, n_set_bits int"
)


def perceptual_ahash(df: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual image fingerprint over REAL
    decoded pixels — the image-dedup primitive (near-identical images
    land on nearby 64-bit hashes; pair with the SimHash chunk-blocked
    Hamming pairing for the dedup join).

    Per image: genuinely decode the PNG (CRC walk + inflate + filter
    strip), map every pixel to one of 8×8 grid cells, per-cell integer
    floor-mean, threshold each populated cell against the integer mean
    of the populated cell values (ties → 0), empty cells (images
    narrower/shorter than 8) → 0. Integer arithmetic end-to-end, so
    the DuckDB oracle reproduces the 64-bit string exactly from its
    analytic restatement of the synthetic pixel generator.

    Arrow-batched ``mapInPandas`` — embarrassingly parallel, one scan,
    no shuffle. The grid binning is vectorized across the WHOLE Arrow
    batch: all decoded images are concatenated into one pixel vector,
    cell ids are offset per image (image i owns cells [64·i, 64·i+64)),
    and a single ``bincount`` per batch produces every image's 8×8
    grid at once — no per-image numpy round trips. ``bincount``'s
    float64 weighted sums are exact here (a cell sum is ≤ 255·W·H,
    integer-exact in float64 below 2^53 — i.e. up to ~184-gigapixel
    images), so the int64 cast loses nothing."""
    import numpy as np

    _empty = {
        "doc_id": pd.Series([], dtype="int64"),
        "width": pd.Series([], dtype="int32"),
        "height": pd.Series([], dtype="int32"),
        "ahash_bits": pd.Series([], dtype="object"),
        "n_set_bits": pd.Series([], dtype="int32"),
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(_empty)
                continue
            widths = np.empty(n, dtype=np.int64)
            heights = np.empty(n, dtype=np.int64)
            pix_parts = []
            for i, payload in enumerate(pdf["payload"]):
                w, h, pix = png_gray_pixels(bytes(payload))
                widths[i], heights[i] = w, h
                pix_parts.append(np.frombuffer(pix, dtype=np.uint8))
            sizes = widths * heights
            flat = np.concatenate(pix_parts).astype(np.int64)
            img = np.repeat(np.arange(n), sizes)
            starts = np.cumsum(sizes) - sizes
            off = np.arange(flat.size) - np.repeat(starts, sizes)
            wv, hv = widths[img], heights[img]
            x, y = off % wv, off // wv
            cell = img * 64 + (y * 8 // hv) * 8 + (x * 8 // wv)
            sums = (
                np.bincount(cell, weights=flat, minlength=64 * n)
                .astype(np.int64)
                .reshape(n, 64)
            )
            counts = np.bincount(cell, minlength=64 * n).reshape(n, 64)
            pop = counts > 0
            v = np.zeros((n, 64), dtype=np.int64)
            np.floor_divide(sums, counts, out=v, where=pop)
            # every image has ≥1 populated cell (w·h ≥ 1), so the
            # per-image threshold division is always defined
            thresh = np.where(pop, v, 0).sum(axis=1) // pop.sum(axis=1)
            bits = (v > thresh[:, None]) & pop
            chars = np.where(bits, 49, 48).astype(np.uint8).tobytes()
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(
                        pdf["doc_id"].to_numpy(), dtype="int64"
                    ),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "ahash_bits": [
                        chars[i * 64 : (i + 1) * 64].decode("ascii")
                        for i in range(n)
                    ],
                    "n_set_bits": pd.Series(
                        bits.sum(axis=1), dtype="int32"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, AHASH_SCHEMA)
