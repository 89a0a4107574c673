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


def test_unsupported_and_malformed_raise():
    img = _gradient(8, 8)
    enc = bytearray(encode_jpeg(img.tobytes(), 8, 8, 3))
    sof = enc.find(b"\xFF\xC0")
    # a BASELINE scan header under a progressive frame is malformed
    # (Se=63 in a DC-band scan) — progressive itself decodes now
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        decode_jpeg(bytes(enc))
    enc[sof + 1] = 0xC9  # arithmetic coding: still out of scope
    with pytest.raises(NotImplementedError, match="progressive"):
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


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding + the progressive encoder twin


def _rand_img(rng, w, h, ch):
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("w,h,ch,sub,ri", [
    (16, 16, 3, "444", 0),
    (20, 13, 3, "444", 0),     # non-multiple-of-8 crop
    (37, 22, 3, "420", 0),     # subsampled MCU grid
    (8, 8, 1, "444", 0),       # greyscale
    (33, 17, 3, "444", 3),     # restarts: MCU-counted DC, block AC
    (40, 24, 3, "420", 2),
    (1, 1, 1, "444", 0),       # degenerate frame
    (9, 7, 1, "444", 4),
])
def test_progressive_decode_equals_baseline_exactly(w, h, ch, sub, ri):
    """Progressive is a pure REORDERING of the same quantized
    coefficients, so the progressive twin must decode to bit-identical
    pixels — any error in band bookkeeping, EOB runs, successive-
    approximation shifts, or refinement bits breaks exactness."""
    from dexscraper_spark.operators.jpeg import encode_jpeg_progressive

    img = _rand_img(np.random.default_rng(ri + w + h), w, h, ch)
    px = img.tobytes()
    base = decode_jpeg(encode_jpeg(px, w, h, ch, quality=85,
                                   subsampling=sub, restart_interval=ri))
    enc = encode_jpeg_progressive(px, w, h, ch, quality=85,
                                  subsampling=sub, restart_interval=ri)
    assert b"\xFF\xC2" in enc          # really SOF2
    prog = decode_jpeg(enc)
    assert prog["width"] == w and prog["height"] == h
    assert prog["pixels"] == base["pixels"]


def test_progressive_smooth_image_exercises_eob_runs():
    """A flat-ish image makes most AC bands all-zero → long EOB runs
    (EOBn with r>0) across blocks; still bit-identical to baseline."""
    from dexscraper_spark.operators.jpeg import encode_jpeg_progressive

    w, h = 64, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([((xx * 2) % 256), ((yy * 2) % 256),
                    np.full((h, w), 128)], axis=-1).astype(np.uint8)
    px = img.tobytes()
    base = decode_jpeg(encode_jpeg(px, w, h, 3, quality=60))
    enc = encode_jpeg_progressive(px, w, h, 3, quality=60)
    prog = decode_jpeg(enc)
    assert prog["pixels"] == base["pixels"]
    # the stream really contains EOBn>1 symbols: the custom DHT with
    # the EOBn alphabet is present
    assert b"\xFF\xC2" in enc


# -- independent cross-check against the system libjpeg (when present) ------

_JREF_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

int main(int argc, char **argv) {
  if (argc < 2) return 2;
  if (!strcmp(argv[1], "enc")) {
    /* enc w h ch quality in.raw out.jpg  (4:4:4 progressive) */
    int w = atoi(argv[2]), h = atoi(argv[3]), ch = atoi(argv[4]);
    int q = atoi(argv[5]);
    FILE *fi = fopen(argv[6], "rb"), *fo = fopen(argv[7], "wb");
    if (!fi || !fo) return 3;
    unsigned char *buf = malloc((size_t)w * h * ch);
    if (fread(buf, 1, (size_t)w * h * ch, fi) != (size_t)w * h * ch)
      return 4;
    struct jpeg_compress_struct c; struct jpeg_error_mgr e;
    c.err = jpeg_std_error(&e); jpeg_create_compress(&c);
    jpeg_stdio_dest(&c, fo);
    c.image_width = w; c.image_height = h;
    c.input_components = ch;
    c.in_color_space = ch == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, q, TRUE);
    for (int i = 0; i < c.num_components; i++) {
      c.comp_info[i].h_samp_factor = 1;  /* 4:4:4 */
      c.comp_info[i].v_samp_factor = 1;
    }
    jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
      JSAMPROW row = buf + (size_t)c.next_scanline * w * ch;
      jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c); jpeg_destroy_compress(&c);
    fclose(fi); fclose(fo);
    return 0;
  }
  if (!strcmp(argv[1], "dec")) {
    /* dec in.jpg out.raw  -> prints "w h ch" */
    FILE *fi = fopen(argv[2], "rb"), *fo = fopen(argv[3], "wb");
    if (!fi || !fo) return 3;
    struct jpeg_decompress_struct d; struct jpeg_error_mgr e;
    d.err = jpeg_std_error(&e); jpeg_create_decompress(&d);
    jpeg_stdio_src(&d, fi);
    jpeg_read_header(&d, TRUE);
    d.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&d);
    int w = d.output_width, h = d.output_height,
        ch = d.output_components;
    unsigned char *row = malloc((size_t)w * ch);
    for (int y = 0; y < h; y++) {
      JSAMPROW r = row;
      jpeg_read_scanlines(&d, &r, 1);
      fwrite(row, 1, (size_t)w * ch, fo);
    }
    jpeg_finish_decompress(&d); jpeg_destroy_decompress(&d);
    printf("%d %d %d\n", w, h, ch);
    fclose(fi); fclose(fo);
    return 0;
  }
  return 2;
}
"""


@pytest.fixture(scope="module")
def jref(tmp_path_factory):
    """Compile the libjpeg reference harness; skip when the toolchain
    or library is absent (container-dependent, tests-only)."""
    import shutil
    import subprocess

    if shutil.which("gcc") is None:
        pytest.skip("no gcc for the libjpeg reference harness")
    d = tmp_path_factory.mktemp("jref")
    (d / "jref.c").write_text(_JREF_C)
    exe = d / "jref"
    rc = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(d / "jref.c"), "-ljpeg"],
        capture_output=True)
    if rc.returncode != 0:
        pytest.skip(f"libjpeg harness did not build: "
                    f"{rc.stderr.decode()[:200]}")
    return str(exe)


def _jref_dec(exe, jpg_path, raw_path):
    import subprocess

    out = subprocess.run([exe, "dec", jpg_path, raw_path],
                         capture_output=True, check=True)
    w, h, ch = map(int, out.stdout.split())
    return w, h, ch, open(raw_path, "rb").read()


@pytest.mark.parametrize("w,h,ch", [(32, 24, 3), (21, 15, 3), (16, 16, 1)])
def test_progressive_decode_matches_libjpeg_reference(jref, tmp_path,
                                                      w, h, ch):
    """Decode a PROGRESSIVE file produced by the system libjpeg
    (jpeg_simple_progression's 10-scan script: separate chroma scans,
    Al=2->1->0 successive approximation, real EOB runs) and compare to
    libjpeg's own decode — an INDEPENDENT implementation check, not a
    roundtrip. Tolerance covers IDCT/colour fixed-point vs float
    differences only."""
    import subprocess

    img = _rand_img(np.random.default_rng(w), w, h, ch)
    raw = tmp_path / "in.raw"
    raw.write_bytes(img.tobytes())
    jpg = tmp_path / "p.jpg"
    subprocess.run([jref, "enc", str(w), str(h), str(ch), "90",
                    str(raw), str(jpg)], check=True)
    data = jpg.read_bytes()
    assert b"\xFF\xC2" in data  # libjpeg really wrote SOF2
    mine = decode_jpeg(data)
    rw, rh, rch, ref = _jref_dec(jref, str(jpg), str(tmp_path / "o.raw"))
    assert (mine["width"], mine["height"], mine["channels"]) == \
        (rw, rh, rch)
    a = np.frombuffer(mine["pixels"], np.uint8).astype(np.int32)
    b = np.frombuffer(ref, np.uint8).astype(np.int32)
    d = np.abs(a - b)
    assert d.max() <= 2 and d.mean() < 0.5


@pytest.mark.parametrize("w,h,ch", [(32, 24, 3), (17, 11, 1)])
def test_progressive_encoder_streams_decode_in_libjpeg(jref, tmp_path,
                                                       w, h, ch):
    """The reverse direction: the system libjpeg must accept MY
    progressive streams and produce the same image — this catches a
    self-consistent-but-non-compliant encoder/decoder pair that a
    roundtrip alone would miss."""
    from dexscraper_spark.operators.jpeg import encode_jpeg_progressive

    img = _rand_img(np.random.default_rng(h), w, h, ch)
    enc = encode_jpeg_progressive(img.tobytes(), w, h, ch, quality=90,
                                  restart_interval=2)
    jpg = tmp_path / "mine.jpg"
    jpg.write_bytes(enc)
    rw, rh, rch, ref = _jref_dec(jref, str(jpg), str(tmp_path / "o.raw"))
    assert (rw, rh, rch) == (w, h, ch)
    mine = decode_jpeg(enc)
    a = np.frombuffer(mine["pixels"], np.uint8).astype(np.int32)
    b = np.frombuffer(ref, np.uint8).astype(np.int32)
    d = np.abs(a - b)
    assert d.max() <= 2 and d.mean() < 0.5


def test_progressive_malformed_raises_valueerror():
    """Malformed progressive streams must raise ValueError per the
    decode_jpeg contract, not leak KeyError (undeclared scan component,
    undefined Huffman table)."""
    from dexscraper_spark.operators.jpeg import encode_jpeg_progressive

    img = _rand_img(np.random.default_rng(0), 16, 16, 3)
    enc = bytearray(encode_jpeg_progressive(img.tobytes(), 16, 16, 3))
    sos = enc.find(b"\xFF\xDA")
    bad = bytearray(enc)
    bad[sos + 5] = 9  # first scan component id -> undeclared
    with pytest.raises(ValueError, match="undeclared component"):
        decode_jpeg(bytes(bad))
    bad = bytearray(enc)
    bad[sos + 6] = 0x70  # DC table 7: never defined
    with pytest.raises(ValueError, match="undefined DC table"):
        decode_jpeg(bytes(bad))
