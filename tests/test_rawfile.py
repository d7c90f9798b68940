"""CR2/NEF raw import: fixture files are synthesized byte-by-byte per
the container specs (CR2 slice re-assembly over a lossless-JPEG stream;
Nikon LSB-first 12/14-bit packing), then read back through
io/rawfile.py and the `convert` CLI path."""

import struct

import numpy as np
import pytest

from siril_tpu.io.rawfile import (
    _unpack_nikon12,
    _unpack_nikon14,
    is_cr2,
    is_nef,
    read_cr2,
    read_nef,
)
from tests.test_dng import encode_ljpeg


def _entry(tag, typ, vals):
    if typ == 3:
        data = struct.pack("<" + "H" * len(vals), *vals)
    elif typ == 4:
        data = struct.pack("<" + "I" * len(vals), *vals)
    elif typ == 1:
        data = bytes(vals)
    elif typ == 2:
        data = vals[0].encode() + b"\0"
    return tag, typ, len(vals) if typ != 2 else len(data), data


def _build_ifd(entries, heap_off, next_off=0):
    heap = bytearray()
    out = struct.pack("<H", len(entries))
    for tag, typ, n, data in sorted(entries):
        if len(data) <= 4:
            val = data.ljust(4, b"\0")
        else:
            val = struct.pack("<I", heap_off + len(heap))
            heap += data
        out += struct.pack("<HHI", tag, typ, n) + val
    out += struct.pack("<I", next_off)
    return out, bytes(heap)


# ---------------------------------------------------------------------------
# CR2
# ---------------------------------------------------------------------------


def write_cr2(path, sensor: np.ndarray, slices=(2, 8, 4), bits=14):
    """Minimal CR2: II header + 'CR' magic; IFD0 (make/model) chains to
    the raw IFD holding one SOF3 strip and the 0xC640 slice tag."""
    h, w = sensor.shape
    n, w1, w2 = slices
    assert n * w1 + w2 == w
    # slice-major stream, then encode as a single-component LJPEG
    parts = []
    x0 = 0
    for ws in [w1] * n + [w2]:
        parts.append(sensor[:, x0:x0 + ws].reshape(-1))
        x0 += ws
    stream = np.concatenate(parts).reshape(h, w)
    raw = encode_ljpeg(stream, precision=bits)

    ifd0_entries = [
        _entry(271, 2, ["Canon"]), _entry(272, 2, ["EOS test"]),
    ]
    ifd0_size = 2 + 12 * len(ifd0_entries) + 4
    heap_guess = 64
    raw_ifd_off = 16 + ifd0_size + heap_guess
    raw_entries_n = 4
    raw_size = 2 + 12 * raw_entries_n + 4
    pix_off = raw_ifd_off + raw_size + 64
    raw_entries = [
        _entry(259, 3, [6]),
        _entry(273, 4, [pix_off]), _entry(279, 4, [len(raw)]),
        _entry(0xC640, 3, [n, w1, w2]),
    ]
    assert len(raw_entries) == raw_entries_n
    ifd0_bytes, ifd0_heap = _build_ifd(ifd0_entries, 16 + ifd0_size,
                                       next_off=raw_ifd_off)
    assert len(ifd0_heap) <= heap_guess
    raw_bytes, raw_heap = _build_ifd(raw_entries, raw_ifd_off + raw_size)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 16))
        f.write(b"CR\x02\x00" + b"\0" * 4)
        f.write(ifd0_bytes)
        f.write(ifd0_heap.ljust(heap_guess, b"\0"))
        f.write(raw_bytes)
        f.write(raw_heap.ljust(64, b"\0"))
        f.write(raw)


def test_cr2_slice_reassembly(tmp_path, rng):
    h, w, bits = 16, 20, 14
    sensor = rng.integers(1800, 16384, (h, w)).astype(np.uint16)
    p = str(tmp_path / "shot.cr2")
    write_cr2(p, sensor)
    assert is_cr2(p)
    img = read_cr2(p)
    assert img.height == h and img.width == w
    assert img.keywords.bayer_pattern == "RGGB"
    assert "Canon" in img.keywords.instrume
    expect = np.clip((sensor.astype(np.float32) - 2048.0)
                     / (16383.0 - 2048.0), 0, 1)
    np.testing.assert_allclose(img.host()[0], expect, atol=1e-6)


def test_cr2_via_convert_cli(tmp_path, rng):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line as cmd

    sensor = rng.integers(2048, 16384, (16, 20)).astype(np.uint16)
    for i in range(2):
        write_cr2(str(tmp_path / f"img{i}.cr2"), sensor)
    ctx = Session(cwd=str(tmp_path))
    assert cmd(ctx, "convertraw cl") == 0
    assert ctx.seq.number == 2
    f = ctx.seq.read_frame(0)
    assert f.keywords.bayer_pattern == "RGGB"


# ---------------------------------------------------------------------------
# NEF
# ---------------------------------------------------------------------------


def _pack_nikon12(vals: np.ndarray) -> bytes:
    v = vals.astype(np.uint16)
    assert len(v) % 2 == 0
    pairs = v.reshape(-1, 2)
    out = np.empty((len(pairs), 3), np.uint8)
    out[:, 0] = pairs[:, 0] & 0xFF
    out[:, 1] = ((pairs[:, 0] >> 8) & 0x0F) | ((pairs[:, 1] & 0x0F) << 4)
    out[:, 2] = pairs[:, 1] >> 4
    return out.tobytes()


def _pack_nikon14(vals: np.ndarray) -> bytes:
    v = vals.astype(np.uint32)
    assert len(v) % 4 == 0
    q = v.reshape(-1, 4)
    out = np.empty((len(q), 7), np.uint8)
    out[:, 0] = q[:, 0] & 0xFF
    out[:, 1] = ((q[:, 0] >> 8) & 0x3F) | ((q[:, 1] & 0x03) << 6)
    out[:, 2] = (q[:, 1] >> 2) & 0xFF
    out[:, 3] = ((q[:, 1] >> 10) & 0x0F) | ((q[:, 2] & 0x0F) << 4)
    out[:, 4] = (q[:, 2] >> 4) & 0xFF
    out[:, 5] = ((q[:, 2] >> 12) & 0x03) | ((q[:, 3] & 0x3F) << 2)
    out[:, 6] = q[:, 3] >> 6
    return out.tobytes()


@pytest.mark.parametrize("bits", [12, 14])
def test_nikon_packing_roundtrip(rng, bits):
    n = 64
    vals = rng.integers(0, 1 << bits, n).astype(np.uint16)
    if bits == 12:
        back = _unpack_nikon12(_pack_nikon12(vals), n)
    else:
        back = _unpack_nikon14(_pack_nikon14(vals), n)
    np.testing.assert_array_equal(back, vals)


def write_nef(path, sensor: np.ndarray, bits=12):
    h, w = sensor.shape
    flat = sensor.reshape(-1)
    raw = _pack_nikon12(flat) if bits == 12 else _pack_nikon14(flat)

    ifd0_entries = [
        _entry(271, 2, ["NIKON CORPORATION"]), _entry(272, 2, ["D test"]),
        _entry(330, 4, [0]),                    # SubIFD placeholder
    ]
    ifd0_size = 2 + 12 * len(ifd0_entries) + 4
    heap_guess = 64
    raw_ifd_off = 8 + ifd0_size + heap_guess
    raw_entries_n = 9
    raw_size = 2 + 12 * raw_entries_n + 4
    pix_off = raw_ifd_off + raw_size + 64
    raw_entries = [
        _entry(256, 3, [w]), _entry(257, 3, [h]), _entry(258, 3, [bits]),
        _entry(259, 3, [1]), _entry(262, 3, [32803]),
        _entry(273, 4, [pix_off]), _entry(279, 4, [len(raw)]),
        _entry(278, 3, [h]),
        _entry(33422, 1, [0, 1, 1, 2]),
    ]
    assert len(raw_entries) == raw_entries_n
    ifd0_entries = [e if e[0] != 330 else _entry(330, 4, [raw_ifd_off])
                    for e in ifd0_entries]
    ifd0_bytes, ifd0_heap = _build_ifd(ifd0_entries, 8 + ifd0_size)
    assert len(ifd0_heap) <= heap_guess
    raw_bytes, raw_heap = _build_ifd(raw_entries, raw_ifd_off + raw_size)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(ifd0_bytes)
        f.write(ifd0_heap.ljust(heap_guess, b"\0"))
        f.write(raw_bytes)
        f.write(raw_heap.ljust(64, b"\0"))
        f.write(raw)


@pytest.mark.parametrize("bits", [12, 14])
def test_nef_packed(tmp_path, rng, bits):
    h, w = 12, 16
    sensor = rng.integers(0, 1 << bits, (h, w)).astype(np.uint16)
    p = str(tmp_path / "shot.nef")
    write_nef(p, sensor, bits=bits)
    assert is_nef(p)
    img = read_nef(p)
    assert img.height == h and img.width == w
    assert img.keywords.bayer_pattern == "RGGB"
    expect = sensor.astype(np.float32) / ((1 << bits) - 1)
    np.testing.assert_allclose(img.host()[0], expect, atol=1e-6)


# (compressed-NEF coverage lives in the 34713 section below)


# ---------------------------------------------------------------------------
# ARW
# ---------------------------------------------------------------------------


def _encode_arw2_block(vmax, vmin, imax, imin, deltas):
    """Pack one 16-byte ARW2 block (14 seven-bit deltas from bit 30)."""
    big = ((vmax & 0x7FF) | ((vmin & 0x7FF) << 11)
           | ((imax & 0xF) << 22) | ((imin & 0xF) << 26))
    pos = 30
    for d in deltas:
        big |= (d & 0x7F) << pos
        pos += 7
    return big.to_bytes(16, "little")


def _decode_arw2_block_ref(block):
    """Independent scalar oracle: dcraw sony_arw2_load_raw inner loop."""
    big = int.from_bytes(block, "little")
    vmax = big & 0x7FF
    vmin = (big >> 11) & 0x7FF
    imax = (big >> 22) & 0xF
    imin = (big >> 26) & 0xF
    sh = 0
    while sh < 4 and (0x80 << sh) <= vmax - vmin:
        sh += 1
    pix = [0] * 16
    bit = 30
    for i in range(16):
        if i == imax:
            pix[i] = vmax
        elif i == imin:
            pix[i] = vmin
        else:
            pix[i] = min((((big >> bit) & 0x7F) << sh) + vmin, 0x7FF)
            bit += 7
    from siril_tpu.io.rawfile import _sony_curve

    curve = _sony_curve()
    return [int(curve[p << 1]) >> 2 for p in pix]


def write_arw(path, blob: bytes, h, w, comp, bits=12):
    ifd0_entries = [
        _entry(271, 2, ["SONY"]), _entry(272, 2, ["ILCE test"]),
        _entry(330, 4, [0]),
    ]
    ifd0_size = 2 + 12 * len(ifd0_entries) + 4
    heap_guess = 64
    raw_ifd_off = 8 + ifd0_size + heap_guess
    raw_entries_n = 9
    raw_size = 2 + 12 * raw_entries_n + 4
    pix_off = raw_ifd_off + raw_size + 64
    raw_entries = [
        _entry(256, 3, [w]), _entry(257, 3, [h]), _entry(258, 3, [bits]),
        _entry(259, 3, [comp]), _entry(262, 3, [32803]),
        _entry(273, 4, [pix_off]), _entry(279, 4, [len(blob)]),
        _entry(278, 3, [h]),
        _entry(33422, 1, [0, 1, 1, 2]),
    ]
    assert len(raw_entries) == raw_entries_n
    ifd0_entries = [e if e[0] != 330 else _entry(330, 4, [raw_ifd_off])
                    for e in ifd0_entries]
    ifd0_bytes, ifd0_heap = _build_ifd(ifd0_entries, 8 + ifd0_size)
    assert len(ifd0_heap) <= heap_guess
    raw_bytes, raw_heap = _build_ifd(raw_entries, raw_ifd_off + raw_size)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(ifd0_bytes)
        f.write(ifd0_heap.ljust(heap_guess, b"\0"))
        f.write(raw_bytes)
        f.write(raw_heap.ljust(64, b"\0"))
        f.write(blob)


def test_arw2_blocks_vs_oracle(tmp_path, rng):
    from siril_tpu.io.rawfile import is_arw, read_arw, _sony_curve

    h, w = 4, 64                           # 4 rows x 4 blocks (2 spans)
    blocks = []
    expected = np.zeros((h, w), np.uint16)
    for row in range(h):
        row_blocks = []
        for b in range(w // 16):
            vmin = int(rng.integers(0, 900))
            vmax = min(vmin + int(rng.integers(1, 1100)), 0x7FF)
            imax, imin = 3, 11
            deltas = rng.integers(0, 128, 14).tolist()
            blk = _encode_arw2_block(vmax, vmin, imax, imin, deltas)
            row_blocks.append(blk)
            pix = _decode_arw2_block_ref(blk)
            span, parity = b // 2, b % 2
            cols = np.arange(16) * 2 + span * 32 + parity
            expected[row, cols] = pix
        blocks.append(b"".join(row_blocks))
    blob = b"".join(blocks)
    white = float(int(_sony_curve()[0x7FF << 1]) >> 2)
    p = str(tmp_path / "shot.arw")
    write_arw(p, blob, h, w, comp=32767)
    assert is_arw(p)
    img = read_arw(p)
    assert img.height == h and img.width == w
    assert img.keywords.bayer_pattern == "RGGB"
    want = np.clip((expected.astype(np.float32) - 512.0)
                   / (white - 512.0), 0, 1)
    np.testing.assert_allclose(img.host()[0], want, atol=1e-6)


def test_arw2_degenerate_imax_eq_imin(tmp_path, rng):
    """imax == imin consumes 15 deltas (dcraw reads its slack byte)."""
    from siril_tpu.io.rawfile import read_arw

    h, w = 2, 32
    blocks = []
    exp_rows = []
    for row in range(h):
        rb = []
        exp = []
        for b in range(2):
            blk = _encode_arw2_block(700, 700, 5, 5,
                                     rng.integers(0, 128, 14).tolist())
            rb.append(blk)
            exp.append(_decode_arw2_block_ref(blk))
        blocks.append(b"".join(rb))
        exp_rows.append(exp)
    p = str(tmp_path / "deg.arw")
    write_arw(p, b"".join(blocks), h, w, comp=32767)
    img = read_arw(p)          # must not crash; imax pixel wins
    assert np.isfinite(img.host()).all()


def test_arw2_width_not_multiple_of_32(tmp_path, rng):
    """dcraw's span loop (col < raw_width-30) decodes only FULL
    32-column spans; a width % 32 != 0 tail must not crash the import
    (row stride stays `width` bytes, tail bytes ignored)."""
    from siril_tpu.io.rawfile import read_arw, _sony_curve

    h, w = 3, 48                           # 1 full span + 16-col tail
    rows = []
    expected = np.zeros((h, 32), np.uint16)
    for row in range(h):
        blks = []
        for b in range(2):                 # the one decodable span
            vmin = int(rng.integers(0, 900))
            vmax = min(vmin + int(rng.integers(1, 1100)), 0x7FF)
            blk = _encode_arw2_block(vmax, vmin, 3, 11,
                                     rng.integers(0, 128, 14).tolist())
            blks.append(blk)
            pix = _decode_arw2_block_ref(blk)
            expected[row, np.arange(16) * 2 + b] = pix
        # tail: 16 stride-filler bytes dcraw would skip
        rows.append(b"".join(blks) + b"\xee" * 16)
    p = str(tmp_path / "tail.arw")
    write_arw(p, b"".join(rows), h, w, comp=32767)
    img = read_arw(p)                      # must not raise
    assert img.height == h and img.width == w
    white = float(int(_sony_curve()[0x7FF << 1]) >> 2)
    want = np.clip((expected.astype(np.float32) - 512.0)
                   / (white - 512.0), 0, 1)
    np.testing.assert_allclose(img.host()[0, :, :32], want, atol=1e-6)
    # tail columns are edge-replicated from the last decoded column
    np.testing.assert_allclose(img.host()[0, :, 32:],
                               np.repeat(want[:, -1:], 16, axis=1),
                               atol=1e-6)


def test_arw_uncompressed(tmp_path, rng):
    from siril_tpu.io.rawfile import read_arw

    h, w = 6, 8
    sensor = rng.integers(0, 1 << 14, (h, w)).astype(np.uint16)
    p = str(tmp_path / "un.arw")
    write_arw(p, sensor.astype("<u2").tobytes(), h, w, comp=1, bits=14)
    img = read_arw(p)
    want = np.clip((sensor.astype(np.float32) - 512.0)
                   / ((1 << 14) - 1 - 512.0), 0, 1)
    np.testing.assert_allclose(img.host()[0], want, atol=1e-6)


def test_arw_via_convert_cli(tmp_path, rng):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line as cmd

    h, w = 4, 32
    blk = _encode_arw2_block(600, 300, 0, 15, rng.integers(0, 128, 14)
                             .tolist())
    blob = (blk * 2) * h
    write_arw(str(tmp_path / "a_001.arw"), blob, h, w, comp=32767)
    ctx = Session(cwd=str(tmp_path))
    assert cmd(ctx, "convert lights") == 0
    import glob as g
    assert g.glob(str(tmp_path / "lights*.fit"))


# ---------------------------------------------------------------------------
# Nikon-compressed NEF (compression 34713)
# ---------------------------------------------------------------------------


def _nikon_codes(tree):
    """Canonical Huffman assignment for one fixed tree:
    leaf value -> (code, nbits)."""
    from siril_tpu.io.rawfile import NIKON_TREES

    counts, values = NIKON_TREES[tree]
    codes = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes.setdefault(values[k], (code, ln))
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self):
        arr = np.array(self.bits + [0] * (-len(self.bits) % 8), np.uint8)
        return np.packbits(arr).tobytes()


def _nikon_encode(sensor, tree, vpred, split=0):
    """Inverse of the decoder for plain (shl=0) leaves: JPEG-style
    category + extra bits, predictor state identical to the decoder."""
    codes = [_nikon_codes(tree)]
    if split:
        codes.append(_nikon_codes(tree + 1))
    cur = codes[0]
    bw = _BitWriter()
    vp = [[int(vpred[0]), int(vpred[1])], [int(vpred[2]), int(vpred[3])]]
    h, w = sensor.shape
    for row in range(h):
        if split and row == split:
            cur = codes[1]
        hpred = [0, 0]
        for col in range(w):
            tgt = int(sensor[row, col])
            pred = vp[row & 1][col] if col < 2 else hpred[col & 1]
            diff = tgt - pred
            cat = abs(diff).bit_length()
            assert cat in cur, f"category {cat} not plain in tree"
            code, nbits = cur[cat]
            bw.put(code, nbits)
            if cat:
                extra = diff if diff > 0 else diff + (1 << cat) - 1
                bw.put(extra, cat)
            if col < 2:
                vp[row & 1][col] = tgt
                hpred[col] = tgt
            else:
                hpred[col & 1] = tgt
    return bw.tobytes()


def _makernote(lintable: bytes) -> bytes:
    """Nikon MakerNote: 'Nikon' + version, embedded II TIFF whose IFD0
    carries tag 0x96; value offsets are relative to the embedded TIFF."""
    ifd_off = 8
    n_entries = 1
    heap_off = ifd_off + 2 + 12 * n_entries + 4
    ifd = struct.pack("<H", n_entries)
    ifd += struct.pack("<HHII", 0x0096, 7, len(lintable), heap_off)
    ifd += struct.pack("<I", 0)
    tiff = b"II*\x00" + struct.pack("<I", ifd_off) + ifd + lintable
    return b"Nikon\x00\x02\x11\x00\x00" + tiff


def write_nef_compressed(path, sensor, bits, lintable, vpred, split=0,
                         tree=None):
    """Minimal compressed NEF: IFD0 (Make, SubIFD, Exif), Exif IFD
    (MakerNote), raw SubIFD with compression 34713."""
    from siril_tpu.io.rawfile import _parse_nikon_lintable

    if tree is None:
        tree, _, _, _, _ = _parse_nikon_lintable(lintable, "<", bits)
    raw = _nikon_encode(sensor, tree, vpred, split)
    mn = _makernote(lintable)
    h, w = sensor.shape

    ifd0_entries = [
        _entry(271, 2, ["NIKON CORPORATION"]), _entry(272, 2, ["D comp"]),
        _entry(330, 4, [0]),                    # SubIFD placeholder
        _entry(0x8769, 4, [0]),                 # Exif placeholder
    ]
    ifd0_size = 2 + 12 * len(ifd0_entries) + 4
    heap_guess = 64
    exif_off = 8 + ifd0_size + heap_guess
    exif_size = 2 + 12 * 1 + 4
    mn_off = exif_off + exif_size
    raw_ifd_off = mn_off + len(mn)
    raw_entries = [
        _entry(256, 3, [w]), _entry(257, 3, [h]), _entry(258, 3, [bits]),
        _entry(259, 3, [34713]), _entry(262, 3, [32803]),
        _entry(273, 4, [0]),                    # pixel offset placeholder
        _entry(279, 4, [len(raw)]), _entry(278, 3, [h]),
        _entry(33422, 1, [0, 1, 1, 2]),
    ]
    raw_size = 2 + 12 * len(raw_entries) + 4
    pix_off = raw_ifd_off + raw_size + 64
    raw_entries = [e if e[0] != 273 else _entry(273, 4, [pix_off])
                   for e in raw_entries]
    ifd0_entries = [
        _entry(330, 4, [raw_ifd_off]) if e[0] == 330 else
        _entry(0x8769, 4, [exif_off]) if e[0] == 0x8769 else e
        for e in ifd0_entries]
    ifd0_bytes, ifd0_heap = _build_ifd(ifd0_entries, 8 + ifd0_size)
    assert len(ifd0_heap) <= heap_guess
    exif_bytes = struct.pack("<H", 1)
    exif_bytes += struct.pack("<HHII", 0x927C, 7, len(mn), mn_off)
    exif_bytes += struct.pack("<I", 0)
    raw_bytes, raw_heap = _build_ifd(raw_entries, raw_ifd_off + raw_size)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(ifd0_bytes)
        f.write(ifd0_heap.ljust(heap_guess, b"\0"))
        f.write(exif_bytes)
        f.write(mn)
        f.write(raw_bytes)
        f.write(raw_heap.ljust(64, b"\0"))
        f.write(raw)


def _smooth_sensor(rng, h, w, lo, hi, max_step):
    """Random walk with bounded steps so every diff stays in a plain
    Huffman category."""
    out = np.zeros((h, w), np.int32)
    out[:, 0] = rng.integers(lo + max_step, hi - max_step, h)
    for col in range(1, w):
        out[:, col] = np.clip(
            out[:, col - 1] + rng.integers(-max_step, max_step + 1, h),
            lo, hi)
    return out.astype(np.uint16)


@pytest.mark.parametrize("bits", [12, 14])
def test_nef_compressed_lossless_roundtrip(tmp_path, rng, bits):
    """ver0=0x46 lossless: identity curve, white = 2^bits - 1."""
    h, w = 10, 24
    white = (1 << bits) - 1
    sensor = _smooth_sensor(rng, h, w, 0, white, 900)
    vpred = [white // 4] * 4
    lintable = bytes([0x46, 0x30]) + struct.pack("<4H", *vpred) \
        + struct.pack("<H", 1)
    p = str(tmp_path / "lossless.nef")
    write_nef_compressed(p, sensor, bits, lintable, vpred)
    assert is_nef(p)
    img = read_nef(p)
    assert img.height == h and img.width == w
    np.testing.assert_allclose(img.host()[0],
                               sensor.astype(np.float32) / white,
                               atol=1e-6)


def test_nef_compressed_lossy_curve_and_split(tmp_path, rng):
    """ver0=0x44/ver1=0x20 lossy: interpolated curve, tree switch at
    the split row (post-split diffs restricted to the plain categories
    tree 1 retains)."""
    bits, h, w = 12, 12, 16
    split = 6
    # tree 1 (after the split) keeps only categories {0..5, 11, 12} as
    # plain leaves; horizontal prediction runs over same-parity columns
    # (2-column stride) and col<2 predicts from the same-parity ROW two
    # back, so per-step bounds must stay ≤ 15 for every diff (incl.
    # across the split) to remain plainly encodable in both trees
    row0 = 1000 + np.cumsum(rng.integers(-15, 16, w))
    drift = np.cumsum(rng.integers(-7, 8, h))[:, None]
    sensor = (row0[None, :] + drift).astype(np.uint16)
    vpred = [1000, 1000, 1000, 1000]
    csize = 17
    step = ((1 << bits) & 0x7FFF) // (csize - 1)
    pts = (np.linspace(0, 3000, csize) ** 1.1)
    pts = (pts / pts.max() * 3000).astype(np.uint16)
    tbl = bytearray(bytes([0x44, 0x20]) + struct.pack("<4H", *vpred)
                    + struct.pack("<H", csize)
                    + struct.pack(f"<{csize}H", *pts))
    tbl = tbl.ljust(562, b"\0") + struct.pack("<H", split)
    p = str(tmp_path / "lossy.nef")
    write_nef_compressed(p, sensor, bits, bytes(tbl), vpred, split=split,
                         tree=0)
    img = read_nef(p)
    # expected: curve lookup then /white, curve trimmed of its flat tail
    from siril_tpu.io.rawfile import _parse_nikon_lintable

    tree, vp, curve, sp, white = _parse_nikon_lintable(bytes(tbl), "<", bits)
    assert tree == 0 and sp == split
    expect = curve[sensor].astype(np.float32) / white
    np.testing.assert_allclose(img.host()[0], np.clip(expect, 0, 1),
                               atol=1e-6)
    assert step > 0 and int(curve[step]) == int(pts[1])


def test_nef_compressed_native_matches_python(tmp_path, rng):
    """The native decoder and the pure-python fallback must agree
    bit-for-bit on the same stream."""
    from siril_tpu import native
    from siril_tpu.io.rawfile import _nikon_decode_py

    if not native.available():
        pytest.skip("native library unavailable")
    h, w = 9, 20
    sensor = _smooth_sensor(rng, h, w, 0, 4095, 800)
    vpred = np.array([512, 512, 512, 512], np.uint16)
    raw = _nikon_encode(sensor, 2, vpred, 0)
    a = native.decode_nikon(raw, w, h, 2, vpred, 0)
    b = _nikon_decode_py(raw, w, h, 2, vpred, 0)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, sensor)


def test_nef_shl_leaf_decode():
    """Tree 1's shifted leaves (leaf = shl<<4 | len) decode via
    diff = ((extra << 1) + 1) << shl >> 1 with the shl-aware sign rule —
    checked against an independent computation of the same formula."""
    from siril_tpu.io.rawfile import _nikon_decode_py

    leaf, shl, ln = 0x16, 1, 6
    codes = _nikon_codes(1)
    code, nbits = codes[leaf]
    for extra in (0, 5, 17, 31):           # 5 payload bits (len - shl)
        bw = _BitWriter()
        bw.put(codes[0][0], codes[0][1])   # col 0: diff 0
        bw.put(code, nbits)                # col 1: the shl leaf
        bw.put(extra, ln - shl)
        out = _nikon_decode_py(bw.tobytes(), 2, 1, 1,
                               np.array([800, 800, 0, 0], np.uint16), 0)
        diff = ((extra << 1) + 1) << shl >> 1
        if diff & (1 << (ln - 1)) == 0:
            diff -= (1 << ln)              # shl != 0: no -1 correction
        np.testing.assert_array_equal(out[0], [800, (800 + diff) & 0xFFFF])


def test_nef_compressed_without_makernote(tmp_path, rng):
    """A 34713 strip with no Nikon MakerNote must fail loudly, not
    produce garbage."""
    h, w = 8, 8
    sensor = rng.integers(0, 4096, (h, w)).astype(np.uint16)
    p = str(tmp_path / "comp.nef")
    write_nef(p, sensor, bits=12)
    data = bytearray(open(p, "rb").read())
    idx = data.find(struct.pack("<HHI", 259, 3, 1))
    data[idx + 8:idx + 10] = struct.pack("<H", 34713)
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="MakerNote"):
        read_nef(p)


# ---------------------------------------------------------------------------
# Fujifilm RAF
# ---------------------------------------------------------------------------


def write_raf(path, sensor: np.ndarray, xtrans36=None, model="X-T5"):
    """Minimal RAF: magic, model at 0x1C, u32be CFA-table pointer at 92
    and raw-data pointer at 100; CFA table with tags 0x100 (dims) and
    optionally 0x131 (6×6 grid, stored last-cell-first)."""
    h, w = sensor.shape
    hdr = bytearray(160)
    hdr[:16] = b"FUJIFILMCCD-RAW "
    hdr[0x10:0x14] = b"0201"
    hdr[0x1C:0x1C + len(model)] = model.encode()
    tbl = bytearray()
    recs = [(0x100, struct.pack(">HH", h, w))]
    if xtrans36 is not None:
        lut = {"R": 0, "G": 1, "B": 2}
        cells = bytes(lut[c] for c in reversed(xtrans36))
        recs.append((0x131, cells))
    tbl += struct.pack(">I", len(recs))
    for tag, payload in recs:
        tbl += struct.pack(">HH", tag, len(payload)) + payload
    tbl_off = len(hdr)
    raw_off = tbl_off + len(tbl)
    struct.pack_into(">I", hdr, 92, tbl_off)
    struct.pack_into(">I", hdr, 100, raw_off)
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(tbl)
        f.write(sensor.astype("<u2").tobytes())


def test_raf_xtrans_roundtrip(tmp_path, rng):
    from siril_tpu.io.rawfile import is_raf, read_raf
    from siril_tpu.ops.xtrans import XTRANS_PATTERNS

    h, w = 12, 18
    sensor = rng.integers(0, 1 << 14, (h, w)).astype(np.uint16)
    sensor[0, 0] = (1 << 14) - 1           # pin the 14-bit range guess
    pat = XTRANS_PATTERNS[0]
    p = str(tmp_path / "shot.raf")
    write_raf(p, sensor, xtrans36=pat)
    assert is_raf(p)
    img = read_raf(p)
    assert img.height == h and img.width == w
    assert img.keywords.bayer_pattern == pat
    assert img.keywords.instrume == "FUJIFILM X-T5"
    np.testing.assert_allclose(
        img.host()[0], sensor.astype(np.float32) / ((1 << 14) - 1),
        atol=1e-6)


def test_raf_feeds_xtrans_demosaic(tmp_path):
    """An imported RAF must debayer through the X-Trans path: a flat
    gray scene (R=G=B) demosaics to a flat RGB image."""
    from siril_tpu.io.rawfile import read_raf
    from siril_tpu.ops.xtrans import XTRANS_PATTERNS, demosaic_xtrans_image

    h, w = 24, 30
    sensor = np.full((h, w), 8000, np.uint16)
    sensor[0, 0] = (1 << 14) - 1
    p = str(tmp_path / "flat.raf")
    write_raf(p, sensor, xtrans36=XTRANS_PATTERNS[1])
    img = read_raf(p)
    rgb = demosaic_xtrans_image(img)
    assert rgb.nchans == 3
    interior = rgb.host()[:, 4:-4, 4:-4]
    want = 8000.0 / ((1 << 14) - 1)
    np.testing.assert_allclose(interior, want, atol=2e-4)


def test_raf_truncated_raises(tmp_path, rng):
    from siril_tpu.io.rawfile import read_raf

    sensor = rng.integers(0, 1 << 14, (8, 10)).astype(np.uint16)
    p = str(tmp_path / "trunc.raf")
    write_raf(p, sensor)
    data = open(p, "rb").read()
    open(p, "wb").write(data[:-40])
    with pytest.raises(ValueError, match="truncated"):
        read_raf(p)


def test_raf_bayer_fallback(tmp_path, rng):
    """No 0x131 tag (Bayer-sensor Fuji bodies): RGGB default."""
    from siril_tpu.io.rawfile import read_raf

    sensor = rng.integers(0, 1 << 12, (8, 10)).astype(np.uint16)
    p = str(tmp_path / "bayer.raf")
    write_raf(p, sensor)
    img = read_raf(p)
    assert img.keywords.bayer_pattern == "RGGB"


# ---------------------------------------------------------------------------
# Panasonic RW2
# ---------------------------------------------------------------------------


def write_rw2(path, raw_bytes: bytes, h, w, bits=12, cfa=1,
              borders=None, blacks=None, byte_count=None,
              raw_format=None):
    """Minimal RW2 container: II\\x55\\x00 magic + PanasonicRaw IFD0."""
    entries = [
        _entry(0x0002, 3, [w]),            # sensor width
        _entry(0x0003, 3, [h]),            # sensor height
        _entry(0x0009, 3, [cfa]),          # CFA pattern id
        _entry(0x000A, 3, [bits]),
        _entry(0x0110, 2, ["DC-TEST"]),    # model
    ]
    if raw_format is not None:
        entries.append(_entry(0x002D, 3, [raw_format]))
    if borders is not None:
        top, left, bottom, right = borders
        entries += [_entry(0x0004, 3, [top]), _entry(0x0005, 3, [left]),
                    _entry(0x0006, 3, [bottom]),
                    _entry(0x0007, 3, [right])]
    if blacks is not None:
        entries += [_entry(0x001C, 3, [blacks[0]]),
                    _entry(0x001D, 3, [blacks[1]]),
                    _entry(0x001E, 3, [blacks[2]])]
    cnt = byte_count if byte_count is not None else len(raw_bytes)
    # two passes to resolve the heap/data offsets
    ifd0, _ = _build_ifd(entries + [_entry(0x0117, 4, [cnt]),
                                    _entry(0x0118, 4, [0])], 0)
    heap_off = 8 + len(ifd0)
    ifd0, heap = _build_ifd(entries + [_entry(0x0117, 4, [cnt]),
                                       _entry(0x0118, 4, [0])], heap_off)
    data_off = heap_off + len(heap)
    ifd0, heap = _build_ifd(entries + [_entry(0x0117, 4, [cnt]),
                                       _entry(0x0118, 4, [data_off])],
                            heap_off)
    with open(path, "wb") as f:
        f.write(b"II\x55\x00" + struct.pack("<I", 8))
        f.write(ifd0)
        f.write(heap)
        f.write(raw_bytes)


def test_rw2_uncompressed_roundtrip(tmp_path, rng):
    from siril_tpu.io.rawfile import is_rw2, read_rw2

    h, w = 10, 28
    sensor = rng.integers(140, 4096, (h, w)).astype(np.uint16)
    p = str(tmp_path / "t.rw2")
    write_rw2(p, sensor.astype("<u2").tobytes(), h, w, cfa=2,
              blacks=(128, 128, 128))
    assert is_rw2(p)
    img = read_rw2(p)
    assert img.keywords.bayer_pattern == "GRBG"
    black, white = 128 + 15, 4095
    exp = np.clip((sensor.astype(np.float32) - black) / (white - black),
                  0, 1)
    np.testing.assert_allclose(img.host()[0], exp, atol=1e-6)


def test_rw2_active_area_crop(tmp_path, rng):
    from siril_tpu.io.rawfile import read_rw2

    h, w = 12, 28
    sensor = rng.integers(0, 4096, (h, w)).astype(np.uint16)
    p = str(tmp_path / "t.rw2")
    write_rw2(p, sensor.astype("<u2").tobytes(), h, w,
              borders=(2, 4, 10, 24))
    img = read_rw2(p)
    assert img.host().shape == (1, 8, 20)
    np.testing.assert_allclose(
        img.host()[0], sensor[2:10, 4:24].astype(np.float32) / 4095.0,
        atol=1e-6)


def _encode_pana_v5(pixels: np.ndarray, bits: int) -> bytes:
    """Inverse of _pana_v5_decode: LSB-first packets of 16 bytes with
    10×12-bit / 9×14-bit pixels, then the 0x4000-block section swap."""
    ppp = 10 if bits == 12 else 9
    flat = pixels.reshape(-1).astype(np.uint64)
    npkt = -(-len(flat) // ppp)
    pad = np.zeros(npkt * ppp - len(flat), np.uint64)
    vals = np.concatenate([flat, pad]).reshape(npkt, ppp)
    out = np.zeros((npkt, 16), np.uint8)
    w0 = np.zeros(npkt, np.uint64)
    w1 = np.zeros(npkt, np.uint64)
    for p in range(ppp):
        lo = p * bits
        v = vals[:, p]
        if lo + bits <= 64:
            w0 |= v << np.uint64(lo)
        elif lo >= 64:
            w1 |= v << np.uint64(lo - 64)
        else:
            w0 |= (v << np.uint64(lo)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            w1 |= v >> np.uint64(64 - lo)
    for i in range(8):
        out[:, i] = (w0 >> np.uint64(8 * i)).astype(np.uint8)
        out[:, 8 + i] = (w1 >> np.uint64(8 * i)).astype(np.uint8)
    stream = out.reshape(-1)
    block, split = 0x4000, 0x1FF8
    nb = len(stream) // block
    chunks = []
    for b in range(nb):
        blk = stream[b * block:(b + 1) * block]
        # inverse of [split:]+[:split] reorder
        chunks.append(np.concatenate([blk[block - split:],
                                      blk[:block - split]]))
    tail = stream[nb * block:]
    if tail.size > split:
        chunks.append(np.concatenate([tail[tail.size - split:],
                                      tail[:tail.size - split]]))
    elif tail.size:
        chunks.append(tail)
    return np.concatenate(chunks).tobytes() if chunks else b""


def test_rw2_v5_roundtrip(tmp_path, rng):
    """RawFormat=5 container decodes the v5 packet bitstream (VERDICT
    r4 ask #6).  The encoder is the layout inverse; plausibility gating
    protects real files whose body-specific layout differs."""
    from siril_tpu.io.rawfile import read_rw2

    for bits in (12, 14):
        h, w = 64, 96
        sensor = _natural_sensor(rng, h, w, maxv=(1 << bits) - 1)
        p = str(tmp_path / f"v5_{bits}.rw2")
        write_rw2(p, _encode_pana_v5(sensor, bits), h, w, bits=bits,
                  raw_format=5)
        img = read_rw2(p)
        np.testing.assert_allclose(
            img.host()[0],
            sensor.astype(np.float32) / ((1 << bits) - 1), atol=1e-6)


def _encode_pana_v6(pixels: np.ndarray) -> bytes:
    """Inverse of _pana_v6_decode for base=0 groups: every page holds
    pix0/pix1 as full 14-bit values and three (base=0, 3×10-bit)
    groups; epixel values are chosen to invert the odd/even predictor
    chain (pmul=1, pixel_base=0x200)."""
    flat = pixels.reshape(-1).astype(np.int64) + 0xF     # undo the −0xF
    npg = -(-len(flat) // 11)
    flat = np.concatenate([flat, np.zeros(npg * 11 - len(flat),
                                          np.int64)]).reshape(npg, 11)
    pages = np.zeros((npg, 16), np.uint8)
    for g in range(npg):
        vals = flat[g]
        ent = []
        oddeven = [0, 0]
        nonzero = [0, 0]
        for pix in range(11):
            if pix % 3 == 2:
                ent.append(0)                  # base=0: pmul=1, pb=0x200
            v = int(vals[pix])
            p = pix & 1
            if oddeven[p]:
                adj = nonzero[p] - 0x200 if nonzero[p] > 0x200 else 0
                e = v - adj
                assert 0 <= e < 1024, "fixture value out of v5 range"
                nonzero[p] = v
            else:
                e = v
                oddeven[p] = e
                if e:
                    nonzero[p] = e
            ent.append(e)
        b = np.zeros(16, np.uint64)
        e = [np.uint64(x) for x in ent]
        b[15] = e[0] >> np.uint64(6)
        b[14] = ((e[0] & np.uint64(0x3F)) << np.uint64(2)) | \
            (e[1] >> np.uint64(12))
        b[13] = (e[1] >> np.uint64(4)) & np.uint64(0xFF)
        b[12] = ((e[1] & np.uint64(0xF)) << np.uint64(4)) | \
            (e[2] << np.uint64(2)) | (e[3] >> np.uint64(8))
        b[11] = e[3] & np.uint64(0xFF)
        b[10] = e[4] >> np.uint64(2)
        b[9] = ((e[4] & np.uint64(0x3)) << np.uint64(6)) | \
            (e[5] >> np.uint64(4))
        b[8] = ((e[5] & np.uint64(0xF)) << np.uint64(4)) | \
            (e[6] << np.uint64(2)) | (e[7] >> np.uint64(8))
        b[7] = e[7] & np.uint64(0xFF)
        b[6] = e[8] >> np.uint64(2)
        b[5] = ((e[8] & np.uint64(0x3)) << np.uint64(6)) | \
            (e[9] >> np.uint64(4))
        b[4] = ((e[9] & np.uint64(0xF)) << np.uint64(4)) | \
            (e[10] << np.uint64(2)) | (e[11] >> np.uint64(8))
        b[3] = e[11] & np.uint64(0xFF)
        b[2] = e[12] >> np.uint64(2)
        b[1] = ((e[12] & np.uint64(0x3)) << np.uint64(6)) | \
            (e[13] >> np.uint64(4))
        b[0] = (e[13] & np.uint64(0xF)) << np.uint64(4)
        pages[g] = b.astype(np.uint8)
    return pages.reshape(-1).tobytes()


def test_rw2_v6_roundtrip(tmp_path, rng):
    """RawFormat=6 (14-bit pana_cs6 pages) decode (VERDICT r4 ask #6)."""
    from siril_tpu.io.rawfile import read_rw2

    h, w = 64, 88                              # 88·64 = 512 pages of 11
    # keep values in the base=0 predictor range the encoder can invert
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sensor = np.clip(420 + 180 * np.sin(xx / w * 3.0) + 120 * (yy / h)
                     + rng.normal(0, 10.0, (h, w)), 96, 900
                     ).astype(np.uint16)
    p = str(tmp_path / "v6.rw2")
    write_rw2(p, _encode_pana_v6(sensor), h, w, bits=14, raw_format=6)
    img = read_rw2(p)
    np.testing.assert_allclose(img.host()[0],
                               sensor.astype(np.float32) / 16383.0,
                               atol=1e-6)


def test_rw2_v7_gated(tmp_path, rng):
    from siril_tpu.io.rawfile import read_rw2

    p = str(tmp_path / "v7.rw2")
    write_rw2(p, b"\x00" * 4096, 16, 16, bits=14, raw_format=7)
    with pytest.raises(ValueError, match="v7|convert"):
        read_rw2(p)


def test_pana_bits_native_matches_python(rng):
    """Differential test of the v4 bitstream decoder: arbitrary random
    bitstreams must decode identically in C++ and the scalar Python
    oracle (dcraw pana_bits semantics)."""
    from siril_tpu import native
    from siril_tpu.io.rawfile import _pana_bits_decode_py

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    h, w = 6, 42
    for trial in range(4):
        blob = rng.integers(0, 256, 0x4000).astype(np.uint8).tobytes()
        a = native.decode_panasonic(blob, w, h)
        b = _pana_bits_decode_py(blob, w, h)
        np.testing.assert_array_equal(a, b)


def test_rw2_compressed_container(tmp_path, rng):
    """A compressed RW2 (byte count < w·h·2) routes through the
    bitstream decoder; container output must equal the oracle decode of
    the same payload, black/white scaled."""
    from siril_tpu.io.rawfile import _pana_bits_decode_py, read_rw2

    h, w = 4, 28
    # payload SHORTER than w·h·2 so the reader routes to the bitstream
    # decoder (both decoders zero-pad the refill identically)
    blob = rng.integers(0, 256, 200).astype(np.uint8).tobytes()
    exp_raw = _pana_bits_decode_py(blob, w, h)
    p = str(tmp_path / "c.rw2")
    write_rw2(p, blob, h, w, byte_count=len(blob))
    img = read_rw2(p)
    exp = np.clip(exp_raw.astype(np.float32) / 4095.0, 0, 1)
    np.testing.assert_allclose(img.host()[0], exp, atol=1e-6)


def test_rw2_via_convert(tmp_path, rng):
    from siril_tpu.io.conversion import load_any

    h, w = 8, 28
    sensor = rng.integers(0, 4096, (h, w)).astype(np.uint16)
    p = str(tmp_path / "d.rw2")
    write_rw2(p, sensor.astype("<u2").tobytes(), h, w)
    img = load_any(p)
    assert img.host().shape == (1, h, w)


def test_cr3_gated_with_clear_error(tmp_path):
    from siril_tpu.io.conversion import load_any

    p = str(tmp_path / "x.cr3")
    with open(p, "wb") as f:
        f.write(b"\x00\x00\x00\x18ftypcrx " + b"\0" * 64)
    with pytest.raises(ValueError, match="CR3.*not supported|convert"):
        load_any(p)


# ---------------------------------------------------------------------------
# Pentax PEF / Olympus ORF (uncompressed)
# ---------------------------------------------------------------------------


def _write_tiff_cfa(path, sensor, magic, bits=12, comp=1, packed=False,
                    cfa_vals=(0, 1, 1, 2), raw_override=None):
    h, w = sensor.shape
    if raw_override is not None:
        raw = raw_override
    elif packed:
        b = sensor.astype(np.uint16).ravel()
        trip = np.empty((len(b) // 2, 3), np.uint8)
        v0, v1 = b[0::2], b[1::2]
        trip[:, 0] = v0 & 0xFF
        trip[:, 1] = ((v0 >> 8) & 0xF) | ((v1 & 0xF) << 4)
        trip[:, 2] = v1 >> 4
        raw = trip.tobytes()
    else:
        raw = sensor.astype("<u2").tobytes()
    entries = [
        _entry(256, 3, [w]), _entry(257, 3, [h]),
        _entry(258, 3, [bits]), _entry(259, 3, [comp]),
        _entry(262, 3, [32803]),
        _entry(33422, 1, list(cfa_vals)),
        _entry(279, 4, [len(raw)]),
    ]
    ifd0, _ = _build_ifd(entries + [_entry(273, 4, [0])], 0)
    heap_off = 8 + len(ifd0)
    ifd0, heap = _build_ifd(entries + [_entry(273, 4, [0])], heap_off)
    data_off = heap_off + len(heap)
    ifd0, heap = _build_ifd(entries + [_entry(273, 4, [data_off])],
                            heap_off)
    with open(path, "wb") as f:
        f.write(magic + struct.pack("<I", 8))
        f.write(ifd0)
        f.write(heap)
        f.write(raw)


def test_pef_uncompressed(tmp_path, rng):
    from siril_tpu.io.conversion import load_any

    h, w = 8, 24
    sensor = rng.integers(0, 4096, (h, w)).astype(np.uint16)
    p = str(tmp_path / "t.pef")
    _write_tiff_cfa(p, sensor, b"II*\x00")
    img = load_any(p)
    assert img.keywords.bayer_pattern == "RGGB"
    np.testing.assert_allclose(img.host()[0],
                               sensor.astype(np.float32) / 4095.0,
                               atol=1e-6)


def _natural_sensor(rng, h, w, maxv=4095):
    """CFA mosaic with natural statistics (smooth scene + per-channel
    offsets + mild noise) — the packed12 plausibility gate (ADVICE r4)
    rejects pure-random 'sensors', which no camera produces."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 1200 + 900 * np.sin(xx / w * 3.0) + 700 * (yy / h)
    chan = np.zeros((h, w), np.float32)
    chan[0::2, 1::2] += 300.0            # R offsets
    chan[1::2, 0::2] += 150.0            # B offsets
    img = base + chan + rng.normal(0, 25.0, (h, w))
    return np.clip(img, 0, maxv).astype(np.uint16)


def test_orf_packed12(tmp_path, rng):
    from siril_tpu.io.conversion import load_any

    h, w = 16, 24
    sensor = _natural_sensor(rng, h, w)
    p = str(tmp_path / "t.orf")
    _write_tiff_cfa(p, sensor, b"IIRO", packed=True,
                    cfa_vals=(1, 0, 2, 1))
    img = load_any(p)
    assert img.keywords.bayer_pattern == "GRBG"
    np.testing.assert_allclose(img.host()[0],
                               sensor.astype(np.float32) / 4095.0,
                               atol=1e-6)


def test_packed12_wrong_order_rejected(tmp_path, rng):
    """A 12-bit strip whose bytes only decode plausibly in the OTHER
    packing order must not be returned as garbage: either the decoder
    picks the plausible order, or it raises the convert-to-DNG gate
    (ADVICE r4 — real PEF/ORF packing order was never validated against
    a camera file, so wrong-order decodes must fail loudly)."""
    from siril_tpu.io.rawfile import (
        _cfa_roughness,
        _unpack12_le,
        _unpack12_msb,
    )

    # large enough that the scene gradient per pixel is gentle — the
    # roughness contrast between orders grows with resolution
    h, w = 64, 96
    sensor = _natural_sensor(rng, h, w)
    # pack MSB-first, then decode LE: result must score implausible
    vals = sensor.reshape(-1)
    b = np.zeros(len(vals) // 2 * 3, np.uint8)
    v0, v1 = vals[0::2].astype(np.uint16), vals[1::2].astype(np.uint16)
    b[0::3] = (v0 >> 4).astype(np.uint8)
    b[1::3] = (((v0 & 0xF) << 4) | (v1 >> 8)).astype(np.uint8)
    b[2::3] = (v1 & 0xFF).astype(np.uint8)
    raw = b.tobytes()
    good = _unpack12_msb(raw, h * w).reshape(h, w)
    np.testing.assert_array_equal(good, sensor)
    bad = _unpack12_le(raw, h * w).reshape(h, w)
    # the wrong order is clearly rougher, so the comparative picker in
    # _read_tiff_cfa_strips selects the right one even against the
    # container-implied preference
    assert _cfa_roughness(bad) > 2.0 * _cfa_roughness(good)

    # full-path proof: an "IIRO" (little-endian) container holding
    # MSB-packed strips still decodes to the sensor via the picker
    from siril_tpu.io.conversion import load_any

    p = str(tmp_path / "swapped.orf")
    _write_tiff_cfa(p, sensor, b"IIRO", cfa_vals=(1, 0, 2, 1),
                    raw_override=raw)
    img = load_any(p)
    np.testing.assert_allclose(img.host()[0],
                               sensor.astype(np.float32) / 4095.0,
                               atol=1e-6)


def test_pef_compressed_gated(tmp_path, rng):
    from siril_tpu.io.rawfile import read_pef

    h, w = 4, 8
    sensor = rng.integers(0, 4096, (h, w)).astype(np.uint16)
    p = str(tmp_path / "c.pef")
    _write_tiff_cfa(p, sensor, b"II*\x00", comp=65535)
    with pytest.raises(ValueError, match="not supported|convert"):
        read_pef(p)


def test_pana_bits_block_boundary(rng):
    """Multi-16KB-block stream: the bit reader's 16-bit fetch at byte
    0x3FFF touches the pad byte at every block boundary — C++ and the
    Python oracle must agree across ≥3 refills (regression: a 0x4000
    buffer crashed the oracle and silently corrupted native output)."""
    from siril_tpu import native
    from siril_tpu.io.rawfile import _pana_bits_decode_py

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    h, w = 288, 140                    # ~40k px -> >3 blocks consumed
    blob = rng.integers(0, 256, 3 * 0x4000).astype(np.uint8).tobytes()
    a = native.decode_panasonic(blob, w, h)
    b = _pana_bits_decode_py(blob, w, h)
    np.testing.assert_array_equal(a, b)
