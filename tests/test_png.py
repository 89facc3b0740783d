"""PNG codec (operators/png.py): byte-exact decode pinned against
hand-assembled containers (built with struct+zlib directly, NOT the
module's encoder — independent of the code under test), round trips
across every filter × color type, error paths, and the Spark
multimodal integration."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from udacitycapstonedataengineer_spark.operators.png import (
    SIGNATURE,
    png_decode,
    png_encode,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _container(w, h, color_type, raw, palette=None) -> bytes:
    out = bytearray(SIGNATURE)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_decode_handbuilt_rgb_filter_none():
    # 2x2 RGB, filter 0 on both rows: scanline bytes ARE the pixels
    raw = bytes([0, 255, 0, 0, 0, 255, 0]) + bytes([0, 0, 0, 255, 9, 8, 7])
    got = png_decode(_container(2, 2, 2, raw))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]], dtype=np.uint8
    )
    assert got.dtype == np.uint8 and np.array_equal(got, want)


def test_decode_handbuilt_gray_all_filters():
    # 4-wide grayscale rows, one per filter type, deltas hand-computed:
    # row0 None:    10 20 30 40
    # row1 Sub:     f = [5, 7, 9, 11]  -> 5 12 21 32   (left only)
    # row2 Up:      f = [1, 1, 1, 1]   -> 6 13 22 33
    # row3 Average: f = [3, 250, 2, 2] -> recon[0]=3+(0+6)//2=6;
    #   recon[1]=250+(6+13)//2=250+9=259&255=3; recon[2]=2+(3+22)//2=14;
    #   recon[3]=2+(14+33)//2=25
    # row4 Paeth:   f = [1, 2, 3, 4]; preds: x0 p(0,6,0)=6 ->7;
    #   x1 a=7 b=3 c=6: p=4, pa=3 pb=1 pc=2 -> b=3 ->5;
    #   x2 a=5 b=14 c=3: p=16, pa=11 pb=2 pc=13 -> b=14 ->17;
    #   x3 a=17 b=25 c=14: p=28, pa=11 pb=3 pc=14 -> b=25 ->29
    raw = (
        bytes([0, 10, 20, 30, 40])
        + bytes([1, 5, 7, 9, 11])
        + bytes([2, 1, 1, 1, 1])
        + bytes([3, 3, 250, 2, 2])
        + bytes([4, 1, 2, 3, 4])
    )
    got = png_decode(_container(4, 5, 0, raw))
    want = np.array(
        [
            [10, 20, 30, 40],
            [5, 12, 21, 32],
            [6, 13, 22, 33],
            [6, 3, 14, 25],
            [7, 5, 17, 29],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)


def test_decode_handbuilt_palette():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1]) + bytes([0, 2, 0])  # 2x2 indexes
    got = png_decode(_container(2, 2, 3, raw, palette=pal))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters_and_colortypes(filter_type, channels):
    rng = np.random.RandomState(filter_type * 10 + channels)
    shape = (7, 5) if channels == 1 else (7, 5, channels)
    px = rng.randint(0, 256, size=shape).astype(np.uint8)
    got = png_decode(png_encode(px, filter_type=filter_type))
    assert np.array_equal(got, px)


def test_roundtrip_palette_encoding():
    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(6, 4)).astype(np.uint8)
    got = png_decode(png_encode(idx, filter_type=1, palette=palette))
    assert np.array_equal(got, palette[idx])


def test_error_paths():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = png_encode(px)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + good)
    # flip one IDAT payload byte -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        png_decode(good[:-6])
    # interlaced IHDR -> explicit NotImplementedError
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    interlaced = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Adam7"):
        png_decode(interlaced)
    # 16-bit depth -> explicit NotImplementedError
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(deep)


def test_ancillary_chunks_skipped():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    good = png_encode(px)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = len(SIGNATURE) + 12 + 13
    spliced = (
        good[:ihdr_end] + _chunk(b"tEXt", b"k\x00v") + good[ihdr_end:]
    )
    assert np.array_equal(png_decode(spliced), px)


def test_decode_media_png_branch():
    """decode_media's image slot now really decodes PNG (no library);
    non-PNG images stay a documented stub."""
    from udacitycapstonedataengineer_spark.operators.multimodal import (
        decode_media,
    )

    px = np.random.RandomState(0).randint(0, 256, (5, 3, 3)).astype(np.uint8)
    got = decode_media(png_encode(px, filter_type=4), "image")
    assert np.array_equal(got, px)
    with pytest.raises(NotImplementedError, match="non-PNG"):
        decode_media(b"\xff\xd8\xff\xe0jpegdata", "image")


def test_png_roundtrip_operator(spark, sf_dir):
    """Spark-side: every synthesized image survives encode→decode
    byte-exact, across all five filters, and pixel_md5 matches a
    driver-side numpy recomputation for a sample."""
    import hashlib

    from udacitycapstonedataengineer_spark.operators.multimodal import (
        png_roundtrip,
        synthesize_media,
    )
    from udacitycapstonedataengineer_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    rt = png_roundtrip(synthesize_media(docs)).cache()
    rows = rt.collect()
    assert rows
    assert {r["filter_type"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r["roundtrip_ok"] for r in rows)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter("doc_id % 3 = 0").select("doc_id", "text").collect()
    }
    for r in rows[:5]:
        raw = np.frombuffer(texts[r["doc_id"]].encode(), dtype=np.uint8)
        n = r["width"] * r["height"] * 3
        px = np.tile(raw, -(-n // raw.size))[:n]
        assert hashlib.md5(px.tobytes()).hexdigest() == r["pixel_md5"]
    rt.unpersist()


def test_unfilter_02_whole_image_fast_path(monkeypatch):
    """Filter-0/2-only images (the dominant real-corpus case) must
    decode through the vectorized whole-image path — the per-scanline
    fallback is forbidden (VERDICT r7 #8), pinned by making it raise.
    Exactness is pinned across segment boundaries and mod-256 wrap."""
    from udacitycapstonedataengineer_spark.operators import png as P

    # mixed None/Up rows incl. wrap-around (200+200 = 144 mod 256)
    raw = (
        bytes([0, 200, 10, 0, 40])   # None: starts segment
        + bytes([2, 200, 5, 1, 1])   # Up: 144 15 1 41 (wraps)
        + bytes([2, 1, 1, 1, 1])     # Up: 145 16 2 42
        + bytes([0, 7, 8, 9, 10])    # None: new segment
        + bytes([2, 250, 1, 1, 1])   # Up: 1 9 10 11 (wraps)
    )
    want = np.array(
        [
            [200, 10, 0, 40],
            [144, 15, 1, 41],
            [145, 16, 2, 42],
            [7, 8, 9, 10],
            [1, 9, 10, 11],
        ],
        dtype=np.uint8,
    )

    def _boom(*a, **k):
        raise AssertionError("per-scanline fallback used for 0/2 image")

    monkeypatch.setattr(P, "_unfilter_scanline", _boom)
    got = P.png_decode(_container(4, 5, 0, raw))
    assert np.array_equal(got, want)
    # all-Up image (no None row at all): virtual zero previous row
    raw_up = bytes([2, 3, 4, 5, 6]) + bytes([2, 1, 1, 1, 1])
    got_up = P.png_decode(_container(4, 2, 0, raw_up))
    assert np.array_equal(
        got_up, np.array([[3, 4, 5, 6], [4, 5, 6, 7]], dtype=np.uint8)
    )


def test_unfilter_fallback_still_used_for_other_filters(monkeypatch):
    """A single Sub/Average/Paeth scanline routes the image through
    the per-scanline path (and the fast path must not misfire)."""
    from udacitycapstonedataengineer_spark.operators import png as P

    calls = []
    orig = P._unfilter_scanline

    def spy(line, prev, ftype, bpp):
        calls.append(ftype)
        return orig(line, prev, ftype, bpp)

    monkeypatch.setattr(P, "_unfilter_scanline", spy)
    raw = bytes([0, 10, 20, 30, 40]) + bytes([1, 5, 7, 9, 11])
    got = P.png_decode(_container(4, 2, 0, raw))
    assert np.array_equal(
        got, np.array([[10, 20, 30, 40], [5, 12, 21, 32]], dtype=np.uint8)
    )
    assert calls == [0, 1]
