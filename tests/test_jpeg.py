"""Baseline JPEG codec (operators/jpeg.py — ITU-T T.81 baseline, JFIF):
roundtrip through the from-spec encoder/decoder pair at every structural
variation (4:4:4 / 4:2:0, grey/colour, odd dims, restart markers,
quality extremes), plus the codecs.py dispatch and honest failure
modes. Retires the multimodal JPEG NotImplementedError."""

from __future__ import annotations

import numpy as np
import pytest

from dexscraper_spark.operators.jpeg import (
    _build_decode_table, _dct2, _idct2, decode_jpeg, encode_jpeg,
    AC_LUMA_BITS, AC_LUMA_VALS)


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    gx, gy = np.meshgrid(x, y)
    return np.stack([gx, gy, (gx + gy) / 2], axis=-1).astype(np.uint8)


def _roundtrip(img, channels, **kw):
    h, w = img.shape[:2]
    enc = encode_jpeg(img.tobytes(), w, h, channels, **kw)
    d = decode_jpeg(enc)
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(img.shape)
    return got, enc


def test_dct_idct_inverse():
    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.abs(_idct2(_dct2(b)) - b).max() < 1e-10


def test_flat_image_roundtrips_exactly():
    img = np.full((16, 24, 3), 128, dtype=np.uint8)
    got, _ = _roundtrip(img, 3, quality=90)
    assert np.array_equal(got, img)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (37, 53), (1, 1),
                                 (9, 17)])
def test_gradient_roundtrip_all_dims(h, w):
    """Odd dims exercise edge padding + crop on both sides."""
    img = _gradient(h, w)
    got, _ = _roundtrip(img, 3, quality=90)
    err = np.abs(got.astype(int) - img.astype(int))
    # tight bounds on purpose: the zigzag/natural dequantization mixup
    # hid behind loose ones (measured post-fix: mean <= 1.5, max <= 6)
    assert err.mean() < 3 and err.max() < 12


def test_greyscale_roundtrip():
    h, w = 24, 31
    img = np.outer(np.linspace(0, 255, h),
                   np.ones(w)).astype(np.uint8)
    got, _ = _roundtrip(img, 1, quality=90)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 6


def test_quality_100_near_lossless_on_noise():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    got, _ = _roundtrip(img, 3, quality=100)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_420_subsampling_roundtrip_and_smaller_stream():
    img = _gradient(37, 53)
    got444, enc444 = _roundtrip(img, 3, quality=90, subsampling="444")
    got420, enc420 = _roundtrip(img, 3, quality=90, subsampling="420")
    err = np.abs(got420.astype(int) - img.astype(int))
    assert err.mean() < 4            # chroma pooling loses a little...
    assert len(enc420) < len(enc444)  # ...and buys a smaller stream


def test_restart_markers_resync():
    """DRI + RSTn every 2 MCUs (dc predictors reset, bit alignment):
    decode must be identical to the no-restart stream's decode."""
    img = _gradient(24, 40)
    got_plain, _ = _roundtrip(img, 3, quality=90)
    got_rst, enc = _roundtrip(img, 3, quality=90, restart_interval=2)
    assert b"\xFF\xDD" in enc and b"\xFF\xD0" in enc
    assert np.array_equal(got_plain, got_rst)
    got_420rst, _ = _roundtrip(img, 3, quality=90, subsampling="420",
                               restart_interval=1)
    assert np.abs(got_420rst.astype(int) - img.astype(int)).mean() < 4


def test_byte_stuffing_survives():
    """A stream long enough to contain 0xFF bytes in entropy data must
    still decode (unstuffing path)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    _, enc = _roundtrip(img, 3, quality=97)
    assert b"\xFF\x00" in enc  # stuffing actually occurred


def test_progressive_and_malformed_raise():
    img = _gradient(8, 8)
    enc = bytearray(encode_jpeg(img.tobytes(), 8, 8, 3))
    sof = enc.find(b"\xFF\xC0")
    enc[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_huffman_table_construction_is_canonical():
    table = _build_decode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(table) == sum(AC_LUMA_BITS) == len(AC_LUMA_VALS)
    # prefix-free: no code is a prefix of a longer code
    codes = sorted((ln, c) for (ln, c) in table)
    for i, (ln1, c1) in enumerate(codes):
        for ln2, c2 in codes[i + 1:]:
            if ln2 > ln1:
                assert (c2 >> (ln2 - ln1)) != c1


def test_codecs_dispatch_and_probe():
    from dexscraper_spark.operators.codecs import (
        decode_image, probe_image, sniff_format)
    img = _gradient(10, 12)
    enc = encode_jpeg(img.tobytes(), 12, 10, 3, quality=90)
    assert sniff_format(enc) == "jpeg"
    assert probe_image(enc) == {"format": "jpeg", "width": 12,
                                "height": 10, "channels": 3}
    d = decode_image(enc)
    assert (d["width"], d["height"], d["channels"]) == (12, 10, 3)
    assert probe_image(b"\xFF\xD8\xFF") is None  # truncated: no SOF
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBP")  # still-unsupported format


def test_restart_alignment_fuzz():
    """Bit-alignment fuzz across dims x restart intervals x subsampling:
    the original restart() required the eager bit-fill to have already
    reached the RST marker — a partially-consumed pad byte made resync
    raise. The scan-forward fix must hold everywhere."""
    rng_master = np.random.default_rng(99)
    for _ in range(8):
        h = int(rng_master.integers(8, 40))
        w = int(rng_master.integers(8, 40))
        img = rng_master.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ri in (1, 3):
            for sub in ("444", "420"):
                enc = encode_jpeg(img.tobytes(), w, h, 3, quality=85,
                                  restart_interval=ri, subsampling=sub)
                d = decode_jpeg(enc)
                assert (d["width"], d["height"]) == (w, h)


def test_multi_component_frames_raise_cleanly():
    """2- and 4-component (CMYK) frames must raise NotImplementedError,
    not decode into metadata inconsistent with the pixel buffer."""
    img = _gradient(8, 8)
    enc = bytearray(encode_jpeg(img.tobytes(), 8, 8, 3))
    sof = enc.find(b"\xFF\xC0")
    for nc in (2, 4):
        bad = bytearray(enc)
        bad[sof + 9] = nc  # component count field in SOF0
        with pytest.raises((NotImplementedError, ValueError)):
            decode_jpeg(bytes(bad))
