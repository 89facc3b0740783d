"""Minimal SAS7BDAT *writer* — test scaffolding for the SAS converter.

Generates a tiny, uncompressed, 32-bit little-endian .sas7bdat that
public readers (pandas ``read_sas``) parse, so the repo can round-trip
test SAS ingestion without shipping binary fixtures or depending on
SAS itself. Layout: one metadata page (row-size, column-size,
column-text, column-name, column-attribute, and per-column
format-and-label subheaders) followed by one data page of packed rows.

Format references (public): the sas7bdat format write-up shipped with
the R ``sas7bdat`` package (BioStatMatt), and the parso/readstat
readers. Supports exactly what the round-trip test needs: float64
columns (optionally with a SAS date format) and fixed-width latin-1
strings.
"""

from __future__ import annotations

import struct
from datetime import date

MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)

HEADER_SIZE = 1024
PAGE_SIZE = 4096
PAGE_BIT_OFFSET = 16  # x86 (32-bit) layout
SUBHEADER_PTR_LEN = 12

SIG_ROW_SIZE = b"\xf7\xf7\xf7\xf7"
SIG_COL_SIZE = b"\xf6\xf6\xf6\xf6"
SIG_COL_TEXT = b"\xfd\xff\xff\xff"
SIG_COL_NAME = b"\xff\xff\xff\xff"
SIG_COL_ATTR = b"\xfc\xff\xff\xff"
SIG_FMT_LABEL = b"\xfe\xfb\xff\xff"

SAS_EPOCH_OFFSET_DAYS = (date(1970, 1, 1) - date(1960, 1, 1)).days  # 3653


def _u16(v: int) -> bytes:
    return struct.pack("<H", v)


def _u32(v: int) -> bytes:
    return struct.pack("<I", v)


def _f64(v: float) -> bytes:
    return struct.pack("<d", v)


class _Blob:
    """The column-text blob: names/formats live here; other subheaders
    point at (offset, length) pairs. Offsets are relative to the blob
    start, which INCLUDES the leading u16 size field."""

    def __init__(self) -> None:
        # bytes 0-1: size field (patched at build); keep the first 16
        # bytes clear of real text — the reader probes this region for
        # compression literals / creator-proc strings
        self.buf = bytearray(16)

    def add(self, text: str) -> tuple[int, int]:
        raw = text.encode("latin-1")
        off = len(self.buf)
        self.buf.extend(raw)
        while len(self.buf) % 4:
            self.buf.append(0x20)  # space padding, stripped by readers
        return off, len(raw)

    def build(self) -> bytes:
        size = len(self.buf)
        self.buf[0:2] = _u16(size)
        return bytes(self.buf)


def write_sas7bdat(path: str, columns: list[dict], rows: list[tuple]) -> None:
    """Write an uncompressed single-data-page SAS7BDAT.

    ``columns``: dicts with ``name``, ``kind`` ('num' | 'str'),
    optional ``length`` (string width, default 16) and ``format``
    (e.g. 'DATE' to mark a numeric column as a SAS date).
    ``rows``: tuples of float/None (num) or str/None (str) values.
    """
    ncols = len(columns)

    blob = _Blob()
    name_ptrs = [blob.add(c["name"]) for c in columns]
    fmt_ptrs = [blob.add(c["format"]) if c.get("format") else (0, 0) for c in columns]
    blob_bytes = blob.build()

    # row layout: column offsets in declaration order, doubles 8-wide
    offsets, lengths, types = [], [], []
    cursor = 0
    for c in columns:
        width = 8 if c["kind"] == "num" else int(c.get("length", 16))
        offsets.append(cursor)
        lengths.append(width)
        types.append(1 if c["kind"] == "num" else 2)
        cursor += width
    row_length = cursor

    # ---- metadata subheaders (content only; pointers added later) ----
    row_size = bytearray(480)
    row_size[0:4] = SIG_ROW_SIZE
    row_size[20:24] = _u32(row_length)  # offset + 5*int_len
    row_size[24:28] = _u32(len(rows))  # offset + 6*int_len
    row_size[36:40] = _u32(ncols)  # col_count_p1
    row_size[40:44] = _u32(0)  # col_count_p2
    row_size[60:64] = _u32(0)  # rows on mix page (none)
    row_size[354:356] = _u16(0)  # lcs
    row_size[378:380] = _u16(0)  # lcp

    col_size = bytearray(12)
    col_size[0:4] = SIG_COL_SIZE
    col_size[4:8] = _u32(ncols)

    col_text = bytearray(SIG_COL_TEXT) + blob_bytes

    col_name = bytearray(12 + 8 * ncols + 8)
    col_name[0:4] = SIG_COL_NAME
    for i, (off, ln) in enumerate(name_ptrs):
        base = 12 + 8 * i  # entry i read at subheader_start + 4 + 8*(i+1)
        col_name[base : base + 2] = _u16(0)  # text-blob index
        col_name[base + 2 : base + 4] = _u16(off)
        col_name[base + 4 : base + 6] = _u16(ln)

    col_attr = bytearray(20 + 12 * ncols)
    col_attr[0:4] = SIG_COL_ATTR
    for i in range(ncols):
        base = 12 + 12 * i
        col_attr[base : base + 4] = _u32(offsets[i])
        col_attr[base + 4 : base + 8] = _u32(lengths[i])
        col_attr[base + 10] = types[i]

    fmt_subs = []
    for i in range(ncols):
        fs = bytearray(52)
        fs[0:4] = SIG_FMT_LABEL
        off, ln = fmt_ptrs[i]
        fs[34:36] = _u16(0)  # format text-blob index
        fs[36:38] = _u16(off)
        fs[38:40] = _u16(ln)
        fs[40:42] = _u16(0)  # label text-blob index
        fs[42:44] = _u16(0)
        fs[44:46] = _u16(0)
        fmt_subs.append(fs)

    subheaders = [row_size, col_size, col_text, col_name, col_attr, *fmt_subs]

    # ---- meta page: pointers grow from the front, content from the back
    meta = bytearray(PAGE_SIZE)
    meta[PAGE_BIT_OFFSET : PAGE_BIT_OFFSET + 2] = _u16(0x0000)  # meta type
    meta[PAGE_BIT_OFFSET + 4 : PAGE_BIT_OFFSET + 6] = _u16(len(subheaders))
    tail = PAGE_SIZE
    ptr_base = PAGE_BIT_OFFSET + 8
    for i, sub in enumerate(subheaders):
        tail -= len(sub)
        meta[tail : tail + len(sub)] = sub
        p = ptr_base + SUBHEADER_PTR_LEN * i
        meta[p : p + 4] = _u32(tail)
        meta[p + 4 : p + 8] = _u32(len(sub))
        meta[p + 8] = 0  # uncompressed
        meta[p + 9] = 0
    meta[PAGE_BIT_OFFSET + 2 : PAGE_BIT_OFFSET + 4] = _u16(len(subheaders))

    # ---- data page: packed rows right after the (empty) pointer area
    data = bytearray(PAGE_SIZE)
    data[PAGE_BIT_OFFSET : PAGE_BIT_OFFSET + 2] = _u16(0x0100)  # data type
    data[PAGE_BIT_OFFSET + 2 : PAGE_BIT_OFFSET + 4] = _u16(len(rows))
    data[PAGE_BIT_OFFSET + 4 : PAGE_BIT_OFFSET + 6] = _u16(0)
    base = PAGE_BIT_OFFSET + 8
    for r, row in enumerate(rows):
        ro = base + r * row_length
        for i, c in enumerate(columns):
            v = row[i]
            cell = ro + offsets[i]
            if c["kind"] == "num":
                data[cell : cell + 8] = _f64(float("nan") if v is None else float(v))
            else:
                raw = ("" if v is None else v).encode("latin-1")[: lengths[i]]
                raw = raw.ljust(lengths[i], b" ")
                data[cell : cell + lengths[i]] = raw
    if base + len(rows) * row_length > PAGE_SIZE:
        raise ValueError("rows exceed one page; enlarge PAGE_SIZE or split pages")

    # ---- file header
    hdr = bytearray(HEADER_SIZE)
    hdr[0:32] = MAGIC
    hdr[32] = 0x22  # not '3' => 32-bit layout
    hdr[35] = 0x22  # not '3' => align1 = 0
    hdr[37] = 0x01  # little-endian
    hdr[39] = ord("1")  # unix
    hdr[70] = 20  # utf-8
    hdr[92:96] = b"TEST"  # dataset name
    hdr[156:164] = b"DATA    "
    hdr[164:172] = _f64(0.0)  # created (1960 epoch)
    hdr[172:180] = _f64(0.0)  # modified
    hdr[196:200] = _u32(HEADER_SIZE)
    hdr[200:204] = _u32(PAGE_SIZE)
    hdr[204:208] = _u32(2)  # page count
    hdr[216:224] = b"9.0401M2"
    hdr[224:229] = b"Linux"

    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(bytes(meta))
        f.write(bytes(data))


def sas_days(d: date) -> float:
    """Days since the SAS epoch (1960-01-01) — the on-disk encoding of
    a DATE-formatted numeric."""
    return float((d - date(1960, 1, 1)).days)
