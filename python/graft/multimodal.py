"""Multimodal column plumbing over ``mapInPandas``.

Image/audio/video payloads are opaque binary columns; this module gives
the Pandas-UDF side of the pipeline: schema handling, Arrow batch shape
and per-batch vectorized processing. Image decode is REAL for the common
containers — PNG (IHDR), JPEG (SOF frame header) and GIF (logical screen
descriptor) are parsed with the stdlib only, mirroring what the JVM side
reads via ``javax.imageio`` — so ``decode_images`` cross-checks
row-for-row against the ``mm_decode_image`` Catalyst expression on real
image payloads. Payloads no parser recognizes yield all-null fields,
matching the JVM's null struct. Swap in PIL/ffmpeg for full-raster
access — the Spark plumbing does not change.
"""

import numpy as np
import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

_M64 = (1 << 64) - 1


def _mix64(z):
    """splitmix64 finalizer — mirrors graft.pipeline.Hashing.mix64."""
    z = (z + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _hash_bytes(data, seed):
    """FNV-1a 64 + mix — mirrors graft.pipeline.Hashing.hashBytes."""
    h = 0xCBF29CE484222325 ^ (seed & _M64)
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & _M64
    return _mix64(h)


def _decode_stub(blob):
    """Pseudo-decode matching the JVM DecodeImageStub (mm_decode_image_stub)."""
    h = _hash_bytes(blob, 99)
    return 64 + (h & 0xFF), 64 + ((h >> 8) & 0xFF), 3, len(blob)


# PNG color type -> component count, as java.awt color models report it
# (palette entries expand to RGB).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}


def _decode_image(blob):
    """Real container-header decode of PNG/JPEG/GIF payloads, mirroring
    the JVM ``mm_decode_image``; (None,)*4 when the bytes aren't a
    recognized image (the JVM returns a null struct)."""
    b = bytes(blob)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        channels = _PNG_CHANNELS.get(b[25], None)
        if channels is not None:
            return w, h, channels, len(b)
    elif b[:2] == b"\xff\xd8":  # JPEG: scan markers for the SOF frame header
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5:i + 7], "big")
                w = int.from_bytes(b[i + 7:i + 9], "big")
                return w, h, b[i + 9], len(b)
            i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return w, h, 3, len(b)
    return None, None, None, None


def decode_images(df, blob_col, prefix=""):
    """Append ``width/height/channels/byte_len`` columns decoded from
    `blob_col` via mapInPandas (one Arrow batch at a time)."""
    fields = [
        StructField(prefix + "width", IntegerType()),
        StructField(prefix + "height", IntegerType()),
        StructField(prefix + "channels", IntegerType()),
        StructField(prefix + "byte_len", IntegerType()),
    ]
    schema = StructType(list(df.schema.fields) + fields)

    def decode(batches):
        for pdf in batches:
            decoded = [_decode_image(b) for b in pdf[blob_col]]
            w, h, c, n = (list(t) for t in zip(*decoded)) if decoded else ([], [], [], [])
            yield pdf.assign(**{
                prefix + "width": pd.Series(w, dtype="Int32", index=pdf.index),
                prefix + "height": pd.Series(h, dtype="Int32", index=pdf.index),
                prefix + "channels": pd.Series(c, dtype="Int32", index=pdf.index),
                prefix + "byte_len": pd.Series(n, dtype="Int32", index=pdf.index),
            })

    return df.mapInPandas(decode, schema)


def byte_histograms(df, blob_col, bins=16, out_col="hist"):
    """Append a normalized `bins`-bucket byte histogram (float32 array)
    per row — numpy-vectorized per batch, same math as the JVM
    ``mm_byte_histogram``."""
    schema = StructType(list(df.schema.fields) + [
        StructField(out_col, ArrayType(FloatType(), containsNull=False))])
    width = 256 // bins

    def hist(batches):
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                counts = np.bincount(arr // width, minlength=bins)[:bins]
                out.append((counts / max(len(arr), 1)).astype(np.float32))
            yield pdf.assign(**{out_col: pd.Series(out, index=pdf.index)})

    return df.mapInPandas(hist, schema)


def sample_frames(df, blob_col, frame_size, stride, out_col="frames"):
    """Append every `stride`-th `frame_size`-byte window of the payload
    as an array of binaries (the video-frame-sampling shape, on bytes)."""
    schema = StructType(list(df.schema.fields) + [
        StructField(out_col, ArrayType(BinaryType(), containsNull=False))])

    def frames(batches):
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                raw = bytes(b)
                out.append([
                    bytearray(raw[off:off + frame_size])
                    for off in range(0, max(len(raw) - frame_size + 1, 0), stride)
                ])
            yield pdf.assign(**{out_col: pd.Series(out, index=pdf.index)})

    return df.mapInPandas(frames, schema)
