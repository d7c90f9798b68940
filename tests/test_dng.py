"""DNG raw import (io/dng.py): TIFF structure, bit unpacking, lossless
JPEG tiles (native + python decoders), black/white scaling, CFA pattern.

The tests synthesize DNGs (and hand-encode lossless JPEG streams) so no
fixtures are needed."""

import struct

import numpy as np
import pytest

from siril_tpu.io import dng as dngmod


# ---------------------------------------------------------------------------
# minimal LJPEG encoder (test oracle for the decoders)
# ---------------------------------------------------------------------------


def _huff_table():
    """Canonical table: category i ← code of length i+1 (0 → length 1)."""
    counts = [0] * 16
    symbols = list(range(17))
    # one code per length 1..17 doesn't fit; use lengths 2..6 for cats 0-4,
    # rest at length 8+: simple layout — cats 0..16 at increasing lengths
    lens = [2, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    for ln in lens:
        counts[ln - 1] += 1
    order = sorted(range(17), key=lambda i: (lens[i], i))
    symbols = order
    # generate canonical codes
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(counts[l - 1]):
            codes[symbols[k]] = (l, code)
            code += 1
            k += 1
        code <<= 1
    return counts, symbols, codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)        # stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1   # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def encode_ljpeg(img: np.ndarray, precision=16, predictor=1):
    """img: (H, W) uint16 single component."""
    h, w = img.shape
    counts, symbols, codes = _huff_table()
    out = bytearray(b"\xff\xd8")
    # DHT
    payload = bytes([0x00]) + bytes(counts) + bytes(symbols)
    out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    # SOF3
    sof = struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    # SOS
    sos = bytes([1, 1, 0x00, predictor, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = BitWriter()
    default_pred = 1 << (precision - 1)
    prev_row = None
    cur = np.zeros(w, np.int64)
    ii = img.astype(np.int64)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = default_pred
            elif x == 0:
                pred = int(prev_row[0])
            elif y == 0:
                pred = int(cur[x - 1])
            else:
                ra, rb, rc = int(cur[x - 1]), int(prev_row[x]), \
                    int(prev_row[x - 1])
                pred = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1}[predictor]
            diff = ((int(ii[y, x]) - pred + 32768) & 0xFFFF) - 32768
            cur[x] = ii[y, x]
            # category + extra bits (diff ∈ [−32768, 32767] after mod-2¹⁶)
            if diff == 0:
                t = 0
            elif diff == -32768:
                t = 16                      # ssss=16: no extra bits
            else:
                t = max(diff, -diff).bit_length()
            l, c = codes[t]
            bw.put(c, l)
            if t and t != 16:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw.put(v & ((1 << t) - 1), t)
        prev_row = cur.copy()
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("predictor", [1, 2, 4, 7])
def test_ljpeg_python_roundtrip(rng, predictor):
    img = rng.integers(0, 60000, (24, 18)).astype(np.uint16)
    blob = encode_ljpeg(img, predictor=predictor)
    res = dngmod._ljpeg_decode_py(blob)
    assert res is not None
    out, nc = res
    assert nc == 1
    np.testing.assert_array_equal(out, img)


def test_ljpeg_native_matches_python(rng):
    from siril_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    img = rng.integers(0, 65535, (40, 32)).astype(np.uint16)
    blob = encode_ljpeg(img)
    res = native.decode_ljpeg(blob)
    assert res is not None
    out, nc = res
    np.testing.assert_array_equal(out, img)


# ---------------------------------------------------------------------------
# DNG writer (test fixture generator)
# ---------------------------------------------------------------------------


def write_dng(path, cfa: np.ndarray, bits=16, compression=1,
              black=0, white=None, pattern=(0, 1, 1, 2)):
    """Minimal but valid DNG: IFD0 with SubIFD → raw CFA IFD (strips)."""
    h, w = cfa.shape
    white = white if white is not None else (1 << bits) - 1
    if compression == 1:
        if bits == 16:
            # the file header is 'II' (little-endian): 16-bit samples
            # follow the file byte order per TIFF6 — real camera DNGs
            # are packed this way
            raw = cfa.astype("<u2").tobytes()
        else:
            b = np.unpackbits(cfa.astype(">u2").view(np.uint8)
                              .reshape(-1, 2), axis=1)[:, 16 - bits:]
            raw = np.packbits(b.reshape(-1)).tobytes()
    else:
        raw = encode_ljpeg(cfa, precision=bits)

    def entry(tag, typ, vals):
        if typ == 3:
            data = struct.pack("<" + "H" * len(vals), *vals)
        elif typ == 4:
            data = struct.pack("<" + "I" * len(vals), *vals)
        elif typ == 1:
            data = bytes(vals)
        elif typ == 2:
            data = vals[0].encode() + b"\0"
        return tag, typ, len(vals) if typ != 2 else len(data), data

    blobs = []

    def build_ifd(entries, ifd_off, heap_off):
        heap = bytearray()
        out = struct.pack("<H", len(entries))
        for tag, typ, n, data in sorted(entries):
            if len(data) <= 4:
                val = data.ljust(4, b"\0")
            else:
                val = struct.pack("<I", heap_off + len(heap))
                heap += data
            out += struct.pack("<HHI", tag, typ, n) + val
        out += struct.pack("<I", 0)
        return out, bytes(heap)

    # layout: header(8) | ifd0 | ifd0 heap | raw ifd | raw heap | pixels
    ifd0_entries = [
        entry(256, 3, [8]), entry(257, 3, [8]),      # thumbnail dims (fake)
        entry(271, 2, ["testmake"]), entry(272, 2, ["testcam"]),
        entry(330, 4, [0]),                          # SubIFD placeholder
    ]
    # sizes: compute with two passes
    ifd0_size = 2 + 12 * len(ifd0_entries) + 4
    ifd0_heap_guess = 64
    raw_entries_n = 10
    raw_ifd_off = 8 + ifd0_size + ifd0_heap_guess
    raw_size = 2 + 12 * raw_entries_n + 4
    raw_heap_off = raw_ifd_off + raw_size
    pix_off = raw_heap_off + 64
    raw_entries = [
        entry(256, 3, [w]), entry(257, 3, [h]), entry(258, 3, [bits]),
        entry(259, 3, [compression]), entry(262, 3, [32803]),
        entry(273, 4, [pix_off]), entry(279, 4, [len(raw)]),
        entry(33421, 3, [2, 2]), entry(33422, 1, list(pattern)),
        entry(50714, 3, [black]),
    ]
    assert len(raw_entries) == raw_entries_n
    ifd0_entries = [e if e[0] != 330 else entry(330, 4, [raw_ifd_off])
                    for e in ifd0_entries]
    ifd0_bytes, ifd0_heap = build_ifd(ifd0_entries, 8, 8 + ifd0_size)
    assert len(ifd0_heap) <= ifd0_heap_guess
    ifd0_heap = ifd0_heap.ljust(ifd0_heap_guess, b"\0")
    raw_bytes, raw_heap = build_ifd(raw_entries, raw_ifd_off, raw_heap_off)
    assert len(raw_heap) <= 64
    raw_heap = raw_heap.ljust(64, b"\0")

    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(ifd0_bytes)
        f.write(ifd0_heap)
        f.write(raw_bytes)
        f.write(raw_heap)
        f.write(raw)


def test_dng_uncompressed_16bit(tmp_path, rng):
    cfa = rng.integers(100, 60000, (32, 48)).astype(np.uint16)
    p = str(tmp_path / "t.dng")
    write_dng(p, cfa, bits=16)
    img = dngmod.read_dng(p)
    assert img.nchans == 1 and img.height == 32 and img.width == 48
    np.testing.assert_allclose(img.host()[0], cfa / 65535.0, atol=1e-6)
    assert img.keywords.bayer_pattern == "RGGB"
    assert "testmake" in img.keywords.instrume


def test_dng_12bit_packed(tmp_path, rng):
    cfa = rng.integers(0, 4095, (16, 20)).astype(np.uint16)
    p = str(tmp_path / "t12.dng")
    write_dng(p, cfa, bits=12)
    img = dngmod.read_dng(p)
    np.testing.assert_allclose(img.host()[0], cfa / 4095.0, atol=1e-6)


def test_dng_ljpeg_compressed(tmp_path, rng):
    cfa = (2048 + rng.integers(-500, 500, (24, 32))).astype(np.uint16)
    p = str(tmp_path / "tl.dng")
    write_dng(p, cfa, bits=16, compression=7)
    img = dngmod.read_dng(p)
    np.testing.assert_allclose(img.host()[0], cfa / 65535.0, atol=1e-6)


def test_dng_black_level(tmp_path, rng):
    cfa = rng.integers(512, 16000, (16, 16)).astype(np.uint16)
    p = str(tmp_path / "tb.dng")
    write_dng(p, cfa, bits=16, black=512)
    img = dngmod.read_dng(p)
    want = np.clip((cfa.astype(np.float32) - 512) / (65535 - 512), 0, 1)
    np.testing.assert_allclose(img.host()[0], want, atol=1e-6)


def test_convert_dng_sequence(tmp_path, rng):
    """convert picks up .dng files and debayers them."""
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    for i in range(3):
        rgbish = rng.integers(1000, 50000, (32, 32)).astype(np.uint16)
        write_dng(str(tmp_path / f"shot{i}.dng"), rgbish)
    ctx = Session(cwd=str(tmp_path))
    rc = process_command_line(ctx, "convert raw -debayer -out=.")
    assert rc == 0
    assert ctx.seq is not None and ctx.seq.number == 3
    img = ctx.seq.read_frame(0)
    assert img.nchans == 3          # debayered
