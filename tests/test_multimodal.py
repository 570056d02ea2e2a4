"""Real uncompressed-image decode (operators/multimodal.real_decode):
pure python/numpy PPM/PGM/BMP parsers, value-checked pixel-for-pixel
against hand-built payloads. The gate-level value check (decoded sums
== closed-form SQL) is the mm_decode_real oracle entry."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from remediner_spark.operators.multimodal import (
    _ppm_dims,
    encode_ppm_bytes,
    real_decode,
)


def test_ppm_roundtrip_exact():
    for doc_id in (0, 7, 63, 123):
        w, h = _ppm_dims(doc_id)
        px = real_decode(encode_ppm_bytes(doc_id))
        assert px.shape == (h, w, 3)
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        want = ((doc_id * 31 + r * 7 + c * 3 + ch) % 256).astype(np.uint8)
        assert np.array_equal(px, want)


def test_ppm_header_comments_and_whitespace():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6 # magic\n# full comment line\n 2\t2 \n255\n" + px.tobytes()
    assert np.array_equal(real_decode(payload), px)


def test_pgm_grayscale():
    px = np.array([[0, 255], [7, 42]], dtype=np.uint8)
    payload = b"P5\n2 2\n255\n" + px.tobytes()
    got = real_decode(payload)
    assert got.shape == (2, 2, 1)
    assert np.array_equal(got[:, :, 0], px)


def _bmp_bytes(px_rgb: np.ndarray, bottom_up: bool = True) -> bytes:
    """Hand-built 24-bit BI_RGB BMP from an RGB array [h, w, 3]."""
    h, w, _ = px_rgb.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    rows = px_rgb[::-1] if bottom_up else px_rgb
    for row in rows:
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h if bottom_up else -h, 1, 24, 0, len(body), 2835, 2835,
            0, 0,
        )
    )
    return bytes(header) + bytes(body)


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_roundtrip(bottom_up):
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(real_decode(_bmp_bytes(px, bottom_up)), px)


def test_bmp_row_padding():
    # width 3 -> 9-byte rows padded to 12; padding must not leak
    px = np.full((2, 3, 3), 200, dtype=np.uint8)
    assert np.array_equal(real_decode(_bmp_bytes(px)), px)


def test_unsupported_payloads_are_loud():
    with pytest.raises(ValueError, match="magic"):
        real_decode(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError, match="24-bit"):
        bad = bytearray(_bmp_bytes(np.zeros((1, 1, 3), dtype=np.uint8)))
        struct.pack_into("<H", bad, 28, 8)  # claim 8bpp
        real_decode(bytes(bad))
    with pytest.raises(ValueError, match="2-byte"):
        real_decode(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


# ------------------------------------------------------- hypothesis fuzz

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["ppm", "pgm", "bmp_up", "bmp_down"]),
)
def test_codec_roundtrip_fuzz(w, h, seed, fmt):
    """Any pixel array must survive encode->decode bit-for-bit across
    all supported formats, dims, and padding widths."""
    rng = np.random.RandomState(seed)
    if fmt == "pgm":
        px = rng.randint(0, 256, size=(h, w, 1), dtype=np.uint8)
        payload = f"P5\n{w} {h}\n255\n".encode() + px.tobytes()
    elif fmt == "ppm":
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    else:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = _bmp_bytes(px, bottom_up=(fmt == "bmp_up"))
    assert np.array_equal(real_decode(payload), px)


# --------------------------------------------------------------- WAV

from remediner_spark.operators.multimodal import (  # noqa: E402
    _wav_dims,
    encode_wav_bytes,
)


def test_wav_roundtrip_exact():
    for doc_id in (0, 1, 17, 123):
        n, ch = _wav_dims(doc_id)
        rate, got_ch, samples = real_decode(encode_wav_bytes(doc_id))
        assert (rate, got_ch) == (8000, ch)
        assert samples.shape == (n, ch)
        i = np.arange(n)[:, None]
        c = np.arange(ch)[None, :]
        want = (((doc_id * 13 + i * 7 + c * 3) % 4096) - 2048).astype("<i2")
        assert np.array_equal(samples, want)


def test_wav_junk_chunk_and_padding_skipped():
    # encode_wav_bytes embeds an odd-sized junk chunk before 'data';
    # the parser must skip it via declared size + word alignment
    payload = encode_wav_bytes(5)
    assert b"jnk " in payload
    rate, ch, samples = real_decode(payload)
    assert samples.shape[0] == _wav_dims(5)[0]


def test_wav_unsupported_is_loud():
    import struct as _s

    with pytest.raises(ValueError, match="16-bit PCM"):
        bad = bytearray(encode_wav_bytes(3))
        off = bad.index(b"fmt ") + 8
        _s.pack_into("<H", bad, off, 3)  # claim IEEE float format
        real_decode(bytes(bad))
    with pytest.raises(ValueError, match="missing fmt/data"):
        real_decode(b"RIFF\x04\x00\x00\x00WAVE")


@settings(max_examples=40, deadline=None)
@given(doc_id=st.integers(0, 10_000))
def test_wav_roundtrip_fuzz(doc_id):
    n, ch = _wav_dims(doc_id)
    rate, got_ch, samples = real_decode(encode_wav_bytes(doc_id))
    assert (rate, got_ch, samples.shape) == (8000, ch, (n, ch))


# ------------------------------------------------------- Y4M + resize

from remediner_spark.operators.multimodal import (  # noqa: E402
    _y4m_dims,
    encode_y4m_bytes,
    nn_resize,
)


def test_y4m_roundtrip_exact():
    for doc_id in (0, 3, 29, 101):
        w, h, nf = _y4m_dims(doc_id)
        got_w, got_h, frames = real_decode(encode_y4m_bytes(doc_id))
        assert (got_w, got_h, frames.shape) == (w, h, (nf, h, w))
        f = np.arange(nf)[:, None, None]
        r = np.arange(h)[None, :, None]
        c = np.arange(w)[None, None, :]
        want = ((doc_id * 11 + f * 17 + r * 5 + c * 2) % 256).astype(np.uint8)
        assert np.array_equal(frames, want)


def test_y4m_c444_and_corrupt_are_handled():
    # C444: frame payload carries 3 planes; only luma retained
    w, h = 2, 2
    luma = np.arange(4, dtype=np.uint8).reshape(h, w)
    chroma = np.full((h, w), 128, dtype=np.uint8)
    payload = (
        f"YUV4MPEG2 W{w} H{h} F25:1 C444\n".encode()
        + b"FRAME\n" + luma.tobytes() + chroma.tobytes() + chroma.tobytes()
    )
    _, _, frames = real_decode(payload)
    assert np.array_equal(frames[0], luma)
    with pytest.raises(ValueError, match="FRAME"):
        real_decode(b"YUV4MPEG2 W2 H2 Cmono\nJUNK")
    with pytest.raises(ValueError, match="colorspace"):
        real_decode(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n\x00\x00\x00\x00\x00\x00")


def test_nn_resize_indices():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    small = nn_resize(px, 2, 3)
    # rows: floor(i*4/2) -> 0,2 ; cols: floor(j*6/3) -> 0,2,4
    assert np.array_equal(small, px[[0, 2]][:, [0, 2, 4]])
    # identity when dims match
    assert np.array_equal(nn_resize(px, 4, 6), px)


def test_wav_truncated_chunk_is_loud():
    payload = encode_wav_bytes(7)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        real_decode(payload[:-10])


# ------------------------------------------------------------- PNG


def test_png_roundtrip_all_filters():
    """encode_png_bytes writes filter type row%5, so any image with
    h >= 5 exercises None/Sub/Up/Average/Paeth against a real zlib
    stream; decode must recover the closed-form pixels exactly."""
    import numpy as np

    from remediner_spark.operators.multimodal import (
        _parse_png,
        _png_dims,
        encode_png_bytes,
    )

    for doc_id in (0, 7, 36, 45, 62, 511):  # dims 2..10 x 2..8
        w, h = _png_dims(doc_id)
        px = _parse_png(encode_png_bytes(doc_id))
        assert px.shape == (h, w, 3)
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        want = ((doc_id * 31 + r * 7 + c * 3 + ch) % 256).astype(np.uint8)
        assert (px == want).all()
    assert any(_png_dims(d)[1] >= 5 for d in (36, 45, 62, 511))


def _build_png(w, h, color_type, raw_rows, bit_depth=8, interlace=0):
    """Hand-assemble a PNG from pre-filtered scanlines (test helper)."""
    import zlib

    from remediner_spark.operators.multimodal import _PNG_SIG, _png_chunk

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw_rows))
        + _png_chunk(b"IEND", b"")
    )


def test_png_grayscale_and_rgba():
    from remediner_spark.operators.multimodal import _parse_png

    # 3x2 grayscale, filter None rows: values 10..15
    gray = _build_png(
        3, 2, 0, bytes([0, 10, 11, 12]) + bytes([0, 13, 14, 15])
    )
    px = _parse_png(gray)
    assert px.shape == (2, 3, 1)
    assert px.reshape(-1).tolist() == [10, 11, 12, 13, 14, 15]

    # 2x1 RGBA, filter Sub (delta 1 per byte after the first pixel)
    rgba = _build_png(2, 1, 6, bytes([1, 5, 6, 7, 8, 1, 1, 1, 1]))
    px = _parse_png(rgba)
    assert px.shape == (1, 2, 4)
    assert px.reshape(-1).tolist() == [5, 6, 7, 8, 6, 7, 8, 9]


def test_png_split_idat_and_ancillary_chunks():
    """IDAT may be split across chunks; unknown ancillary chunks are
    skipped (both appear constantly in crawled PNGs)."""
    import zlib

    from remediner_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
    )

    ihdr = (
        (2).to_bytes(4, "big") + (1).to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 0])
    )
    z = zlib.compress(bytes([0, 42, 43]))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00hello")
        + _png_chunk(b"IDAT", z[:3])
        + _png_chunk(b"IDAT", z[3:])
        + _png_chunk(b"IEND", b"")
    )
    assert _parse_png(payload).reshape(-1).tolist() == [42, 43]


def test_png_rejections_are_loud():
    import pytest

    from remediner_spark.operators.multimodal import (
        _parse_png,
        encode_png_bytes,
        real_decode,
    )

    good = encode_png_bytes(36)

    with pytest.raises(ValueError, match="signature"):
        _parse_png(b"\x89PNX" + good[4:])
    # interlaced (Adam7) declared in IHDR
    with pytest.raises(ValueError, match="interlace"):
        _parse_png(_build_png(2, 1, 0, bytes([0, 1, 2]), interlace=1))
    # 16-bit depth
    with pytest.raises(ValueError, match="8-bit"):
        _parse_png(_build_png(2, 1, 0, bytes([0, 1, 2]), bit_depth=16))
    # gray+alpha color type (valid PNG, outside the supported set)
    with pytest.raises(ValueError, match="color type"):
        _parse_png(_build_png(2, 1, 4, bytes([0, 1, 2, 3, 4])))
    # corrupt a CRC-covered byte inside the IDAT chunk
    bad = bytearray(good)
    idat_at = bytes(bad).index(b"IDAT")
    bad[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(bad))
    # truncated payload
    with pytest.raises(ValueError, match="truncated|IEND"):
        _parse_png(good[:-6])
    # dispatcher routes PNG magic to the parser
    assert real_decode(good).shape[2] == 3


def test_png_wrong_inflated_size_is_loud():
    import pytest

    from remediner_spark.operators.multimodal import _parse_png

    # header says 3x2 gray but rows carry only one scanline
    with pytest.raises(ValueError, match="inflated size"):
        _parse_png(_build_png(3, 2, 0, bytes([0, 1, 2, 3])))


def test_png_palette_and_trns():
    """Color type 3: indices resolve through PLTE (RGB), and a tRNS
    chunk upgrades the output to RGBA — transparency never silently
    dropped; short tRNS pads opaque."""
    import zlib

    import numpy as np

    from remediner_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
    )

    def build(plte, rows, trns=None, w=3, h=2):
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 3, 0, 0, 0])
        )
        out = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", plte)
        if trns is not None:
            out += _png_chunk(b"tRNS", trns)
        return out + _png_chunk(
            b"IDAT", zlib.compress(rows)
        ) + _png_chunk(b"IEND", b"")

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    rows = bytes([0, 0, 1, 2]) + bytes([0, 1, 2, 0])  # filter None rows
    px = _parse_png(build(plte, rows))
    assert px.shape == (2, 3, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 2].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [0, 0, 255]
    assert px[1, 2].tolist() == [255, 0, 0]

    # tRNS: entry 0 transparent, entries beyond its length opaque
    pxa = _parse_png(build(plte, rows, trns=bytes([0])))
    assert pxa.shape == (2, 3, 4)
    assert pxa[0, 0].tolist() == [255, 0, 0, 0]  # index 0 -> alpha 0
    assert pxa[0, 1].tolist() == [0, 255, 0, 255]  # padded opaque

    # Sub filter applies to INDEX bytes (bpp=1)
    rows_sub = bytes([1, 0, 1, 1]) + bytes([0, 2, 0, 0])
    pxs = _parse_png(build(plte, rows_sub))
    assert pxs[0].reshape(-1).tolist() == [255, 0, 0, 0, 255, 0, 0, 0, 255]

    # out-of-range index is loud
    import pytest

    bad = bytes([0, 0, 1, 7]) + bytes([0, 0, 0, 0])
    with pytest.raises(ValueError, match="palette index"):
        _parse_png(build(plte, bad))
    # palette image without PLTE is loud
    ihdr = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
        [8, 3, 0, 0, 0]
    )
    no_plte = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        _parse_png(no_plte)


def test_png_corruption_never_escapes():
    """Any single-bit flip or truncation of a valid PNG raises
    ValueError — never zlib.error/IndexError/struct garbage, and never
    a silent wrong decode (CRC32 detects all single-bit errors). Also
    pins the bounded inflate: a crafted bomb IDAT is rejected without
    materializing its output."""
    import zlib as _zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from remediner_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
        encode_png_bytes,
    )

    payload = encode_png_bytes(45)  # h >= 5: all five filters present

    @settings(max_examples=150, deadline=None)
    @given(st.data())
    def run(data):
        mode = data.draw(st.sampled_from(["flip", "cut"]))
        if mode == "flip":
            i = data.draw(st.integers(0, len(payload) - 1))
            bit = data.draw(st.integers(0, 7))
            bad = bytearray(payload)
            bad[i] ^= 1 << bit
            try:
                _parse_png(bytes(bad))
                raise AssertionError(f"flip at {i} bit {bit} undetected")
            except ValueError:
                pass
        else:
            i = data.draw(st.integers(0, len(payload) - 1))
            try:
                _parse_png(payload[:i])
            except ValueError:
                pass  # the only acceptable failure type

    run()

    # decompression bomb: header says 2x1 gray but IDAT inflates huge
    ihdr = (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes(
        [8, 0, 0, 0, 0]
    )
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * 10_000_000))
        + _png_chunk(b"IEND", b"")
    )
    import pytest

    with pytest.raises(ValueError, match="inflated size"):
        _parse_png(bomb)
