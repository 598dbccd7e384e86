"""Golden-vector tests for the pure-Python media codecs
(functions/media.py) and the decode_media magic-byte dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from astarte_data_updater_plant_spark.functions.media import (
    decode_pnm,
    decode_wav,
    encode_pgm,
    encode_wav_pcm16,
    mean_pool,
)
from astarte_data_updater_plant_spark.operators.multimodal import decode_media


def test_pgm_roundtrip():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = encode_pgm(px)
    assert buf.startswith(b"P5 8 8 255\n")
    w, h, maxval, decoded = decode_pnm(buf)
    assert (w, h, maxval) == (8, 8, 255)
    assert np.array_equal(decoded, px)


def test_pgm_header_variants():
    # whitespace-flexible header with a comment — the spec's layout
    raw = bytes(range(6))
    buf = b"P5\n# a comment\n3 2\n255\n" + raw
    w, h, maxval, px = decode_pnm(buf)
    assert (w, h, maxval) == (3, 2, 255)
    assert px.tobytes() == raw


def test_ppm_rgb_decode():
    raw = bytes(range(2 * 2 * 3))
    buf = b"P6 2 2 255\n" + raw
    w, h, maxval, px = decode_pnm(buf)
    assert px.shape == (2, 2, 3)
    assert px.tobytes() == raw


def test_mean_pool_linearity():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    thumb = mean_pool(px)
    assert thumb.shape == (4, 4)
    # mean-pool preserves total mass: sum(thumb) * k^2 == sum(pixels)
    assert thumb.sum() * 4 == px.astype(np.int64).sum()
    assert thumb[0, 0] == (0 + 1 + 8 + 9) / 4


def test_wav_roundtrip():
    samples = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int16)
    buf = encode_wav_pcm16(samples, 16000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    nch, rate, width, decoded = decode_wav(buf)
    assert (nch, rate, width) == (1, 16000, 2)
    assert np.array_equal(decoded, samples.astype(np.int64))


def test_wav_24bit_sign_extension():
    # 24-bit PCM: the pad bytes must go on the LOW side so the
    # arithmetic shift sign-extends; 1 must decode as 1 (not 0) and
    # -1 as -1 (not a huge positive)
    import io as _io
    import wave as _wave

    samples = [1, -1, 8388607, -8388608, 0, 256]
    raw = b"".join(s.to_bytes(3, "little", signed=True) for s in samples)
    out = _io.BytesIO()
    with _wave.open(out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(48000)
        wf.writeframes(raw)
    nch, rate, width, decoded = decode_wav(out.getvalue())
    assert (nch, rate, width) == (1, 48000, 3)
    assert decoded.tolist() == samples


def test_png_roundtrip_gray():
    from astarte_data_updater_plant_spark.functions.media import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    # 7 rows -> filters 0,1,2,3,4,0,1 all exercised
    px = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    buf = encode_png(px)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, depth, ctype, back = decode_png(buf)
    assert (w, h, depth, ctype) == (5, 7, 8, 0)
    assert np.array_equal(back, px)


def test_png_roundtrip_rgb():
    from astarte_data_updater_plant_spark.functions.media import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    w, h, depth, ctype, back = decode_png(encode_png(px))
    assert (w, h, depth, ctype) == (4, 6, 8, 2)
    assert np.array_equal(back, px)


def test_png_crc_corruption_detected():
    from astarte_data_updater_plant_spark.functions.media import (
        decode_png,
        encode_png,
    )

    buf = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    buf[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError):
        decode_png(bytes(buf))


def test_decode_media_dispatch():
    img = encode_pgm(np.zeros((2, 2), dtype=np.uint8))
    w, h, maxval, _ = decode_media(img)
    assert (w, h) == (2, 2)
    wav = encode_wav_pcm16(np.zeros(4, dtype=np.int16), 8000)
    nch, rate, width, s = decode_media(wav)
    assert (nch, rate, width, len(s)) == (1, 8000, 2, 4)
    from astarte_data_updater_plant_spark.functions.media import encode_png

    png = encode_png(np.zeros((3, 3), dtype=np.uint8))
    w, h, depth, ctype, px = decode_media(png)
    assert (w, h, depth, ctype) == (3, 3, 8, 0)
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff\xe0 jpeg-ish")
