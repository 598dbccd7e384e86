"""Pure-Python media codecs for uncompressed formats.

The multimodal pattern keeps media as opaque parquet ``binary``; decode
runs Arrow-batched inside ``mapInPandas``. This module provides REAL
decoders for the container formats that need no external codec
libraries — binary netpbm images (PGM ``P5`` / PPM ``P6``) and RIFF
WAVE PCM audio — plus their encoders for fixture construction.
Compressed codecs (JPEG/PNG/MP3/H.264) genuinely require native
libraries and stay behind the documented
:func:`..operators.multimodal.decode_media` hook.

Both formats are public specs: netpbm's header-then-raster layout and
RIFF's chunked fmt/data layout (PCM fields little-endian).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ---------------------------------------------------------------------------
# netpbm (PGM P5 grayscale / PPM P6 rgb), binary variants
# ---------------------------------------------------------------------------


def encode_pgm(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """Serialize a 2-D uint8 array as binary PGM (``P5``)."""
    h, w = pixels.shape
    return f"P5 {w} {h} {maxval}\n".encode("ascii") + pixels.astype(np.uint8).tobytes()


def _read_pnm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers after the magic,
    skipping ``#`` comments; returns (values, raster offset)."""
    vals: list[int] = []
    pos = 2  # past magic
    tok = b""
    while len(vals) < n:
        c = buf[pos : pos + 1]
        if not c:
            raise ValueError("truncated pnm header")
        pos += 1
        if c == b"#":  # comment to end of line
            while buf[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        if c.isspace():
            if tok:
                vals.append(int(tok))
                tok = b""
            continue
        tok += c
    return vals, pos


def decode_pnm(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode binary PGM/PPM: returns (width, height, maxval, pixels);
    pixels is (h, w) uint8 for P5 and (h, w, 3) for P6."""
    magic = bytes(buf[:2])
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary pgm/ppm: {magic!r}")
    (w, h, maxval), pos = _read_pnm_tokens(buf, 3)
    channels = 3 if magic == b"P6" else 1
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * channels, offset=pos)
    pixels = raster.reshape((h, w, 3) if channels == 3 else (h, w))
    return w, h, maxval, pixels


def mean_pool(pixels: np.ndarray, k: int = 2) -> np.ndarray:
    """k x k mean-pool downsample (the thumbnail/resize step)."""
    h, w = pixels.shape[:2]
    h2, w2 = h - h % k, w - w % k
    p = pixels[:h2, :w2].astype(np.float64)
    return p.reshape(h2 // k, k, w2 // k, k, *p.shape[2:]).mean(axis=(1, 3))


# ---------------------------------------------------------------------------
# RIFF WAVE, PCM
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize int16 mono samples as a RIFF WAVE file."""
    out = io.BytesIO()
    with wave.open(out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return out.getvalue()


def decode_wav(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode RIFF WAVE PCM: returns (n_channels, sample_rate,
    sample_width_bytes, samples[int]); samples interleave channels."""
    if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a RIFF WAVE payload")
    with wave.open(io.BytesIO(bytes(buf)), "rb") as wf:
        nch, width, rate, nframes = (
            wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    elif width == 1:  # unsigned in WAV
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    else:
        # Little-endian: pad on the LOW side so the sample lands in the
        # high bytes, then arithmetic-shift back down — this sign-extends
        # 24-bit PCM correctly (appending the pad instead would zero the
        # sign and divide the magnitude by 256).
        samples = np.array(
            [
                struct.unpack("<i", b"\x00" * (4 - width) + raw[i : i + width])[0]
                >> (8 * (4 - width))
                for i in range(0, len(raw), width)
            ],
            dtype=np.int64,
        )
    return nch, rate, width, samples


# ship by value into mapInPandas closures (the workers may not have
# the package on sys.path when the driver runs from another cwd)
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
