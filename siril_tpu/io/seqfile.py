""".seq sidecar text format, v7-compatible.

Reference: ``src/io/seqfile.c`` (readseqfile:85, writeseqfile:720).  Cards:
  S 'name' beg number selnum fixed ref version [variable fz drizzle]
  TS / TA / TF            sequence type (SER / film / FITS-cube)
  L nb_layers
  I filenum incl [rx,ry]
  Rx fwhm wfwhm roundness quality bg nbstars H h00..h22
  Mx-y total ngoodpix mean median sigma avgdev mad sqrtbwmv loc scale min max norm bgnoise
  D/O/E cards (distortion / overlap stats / external ref) — parsed and
  preserved as opaque lines for round-trip compatibility.
"""

from __future__ import annotations

import os
import shlex
from typing import Optional

import numpy as np

from siril_tpu.core.sequence import (
    REG_COLS,
    SEQ_FITSEQ,
    SEQ_REGULAR,
    SEQ_SER,
    STAT_COLS,
    Sequence,
)

CURRENT_SEQFILE_VERSION = 7


def read_seqfile(path: str) -> Sequence:
    if not path.endswith(".seq"):
        path = path + ".seq"
    directory = os.path.dirname(os.path.abspath(path))
    seq: Optional[Sequence] = None
    img_i = 0
    opaque = []
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            c0 = line[0]
            if c0 == "S":
                toks = shlex.split(line[1:])
                name = toks[0]
                seq = Sequence(name, SEQ_REGULAR, directory)
                seq.beg = int(toks[1])
                seq.number = int(toks[2])
                # toks[3] = selnum (recomputed), toks[4] = fixed
                seq.fixed_len = int(toks[4])
                seq.reference_image = int(toks[5])
                if len(toks) > 7:
                    seq.is_variable = bool(int(toks[7]))
                if len(toks) > 8:
                    seq.fz = bool(int(toks[8]))
                seq.filenum = np.zeros(seq.number, dtype=np.int64)
                seq.incl = np.ones(seq.number, dtype=bool)
                seq.date_obs = [None] * seq.number
                seq.airmass = np.zeros(seq.number)
                if seq.is_variable:
                    seq.imgsize = np.zeros((seq.number, 2), dtype=np.int64)
            elif c0 == "T" and seq is not None:
                t = line[1] if len(line) > 1 else "F"
                if t == "S":
                    seq.seq_type = SEQ_SER
                elif t == "F":
                    seq.seq_type = SEQ_FITSEQ
                # 'A' (film) unsupported: keep REGULAR and hope for files
            elif c0 == "L" and seq is not None:
                seq.nb_layers = int(line[1:].split()[0])
            elif c0 == "I" and seq is not None:
                toks = line[1:].split()
                if img_i < seq.number:
                    seq.filenum[img_i] = int(toks[0])
                    seq.incl[img_i] = bool(int(toks[1]))
                    if len(toks) > 2 and "," in toks[2] and seq.imgsize is not None:
                        rx, ry = toks[2].split(",")
                        seq.imgsize[img_i] = (int(rx), int(ry))
                    img_i += 1
            elif c0 == "R" and seq is not None:
                layer_c = line[1]
                layer = 0 if layer_c == "*" else int(layer_c)
                toks = line[2:].split()
                reg = seq.reg(layer)
                i = int(getattr(reg, "_load_idx", 0))
                if i < seq.number:
                    reg.fwhm[i] = float(toks[0])
                    reg.weighted_fwhm[i] = float(toks[1])
                    reg.roundness[i] = float(toks[2])
                    reg.quality[i] = float(toks[3])
                    reg.background_lvl[i] = float(toks[4])
                    reg.number_of_stars[i] = int(float(toks[5]))
                    if len(toks) > 6 and toks[6] == "H":
                        reg.H[i] = np.array([float(t) for t in toks[7:16]]).reshape(3, 3)
                    reg.valid[i] = True
                    reg._load_idx = i + 1
            elif c0 == "M" and seq is not None:
                # Mx-y …
                head, rest = line[1:].split(None, 1)
                layer_c, idx_s = head.split("-")
                layer = 0 if layer_c == "*" else int(layer_c)
                idx = int(idx_s)
                vals = [float(t) for t in rest.split()]
                if idx < seq.number and len(vals) >= len(STAT_COLS):
                    seq.layer_stats(layer)[idx] = vals[: len(STAT_COLS)]
            elif c0 in ("D", "O", "E"):
                opaque.append(line)
    if seq is None:
        raise ValueError(f"{path}: no S card")
    seq._opaque_cards = opaque
    _attach_backing_store(seq)
    return seq


def _attach_backing_store(seq: Sequence) -> None:
    d = seq.directory
    if seq.seq_type == SEQ_SER:
        from siril_tpu.io.ser import SerFile

        p = os.path.join(d, seq.name + ".ser")
        seq._ser = SerFile(p)
        if seq.nb_layers < 0:
            seq.nb_layers = seq._ser.nchans
        seq.rx, seq.ry = seq._ser.width, seq._ser.height
    elif seq.seq_type == SEQ_FITSEQ:
        for ext in (".fit", ".fits", ".fts"):
            p = os.path.join(d, seq.name + ext)
            if os.path.exists(p):
                seq._fitseq_path = p
                break
    else:
        files = []
        name = seq.name
        for i in range(seq.number):
            num = seq.filenum[i]
            found = None
            for ext in ("fit", "fits", "fts"):
                p = os.path.join(d, f"{name}{num:0{seq.fixed_len}d}.{ext}")
                if os.path.exists(p):
                    found = p
                    break
            files.append(found)
        seq._file_list = files
        if (seq.nb_layers < 0 or seq.rx == 0) and any(f for f in files):
            seq._probe_geometry()


def write_seqfile(seq: Sequence, path: Optional[str] = None) -> None:
    p = path or seq.seqfile_path()
    lines = []
    lines.append("#Siril sequence file. Contains list of images, selection, "
                 "registration data and statistics")
    lines.append("#S 'sequence_name' start_index nb_images nb_selected "
                 "fixed_len reference_image version variable_size fz_flag drizzle")
    lines.append("S '%s' %d %d %d %d %d %d %d %d %d" % (
        seq.name, seq.beg, seq.number, seq.selnum, seq.fixed_len,
        seq.reference_image, CURRENT_SEQFILE_VERSION,
        int(seq.is_variable), int(seq.fz), 0))
    if seq.seq_type == SEQ_SER:
        lines.append("TS")
    elif seq.seq_type == SEQ_FITSEQ:
        lines.append("TF")
    if seq.nb_layers > 0:
        lines.append(f"L {seq.nb_layers}")
    for i in range(seq.number):
        if seq.is_variable and seq.imgsize is not None:
            lines.append("I %d %d %d,%d" % (seq.filenum[i], int(seq.incl[i]),
                                            seq.imgsize[i][0], seq.imgsize[i][1]))
        else:
            lines.append("I %d %d" % (seq.filenum[i], int(seq.incl[i])))
    for line in getattr(seq, "_opaque_cards", []):
        lines.append(line)
    for layer, reg in sorted(seq.regparam.items()):
        if not reg.valid.any():
            continue
        for i in range(seq.number):
            H = reg.H[i]
            lines.append(
                "R%d %g %g %g %g %g %d H %g %g %g %g %g %g %g %g %g" % (
                    layer, reg.fwhm[i], reg.weighted_fwhm[i], reg.roundness[i],
                    reg.quality[i], reg.background_lvl[i],
                    int(reg.number_of_stars[i]),
                    H[0, 0], H[0, 1], H[0, 2], H[1, 0], H[1, 1], H[1, 2],
                    H[2, 0], H[2, 1], H[2, 2]))
    for layer, st in sorted(seq.stats.items()):
        for i in range(seq.number):
            row = st[i]
            if np.isnan(row[2:]).all():
                continue
            lines.append(
                "M%d-%d %ld %ld %g %g %g %g %g %g %g %g %g %g %g %g" % (
                    layer, i, int(row[0]), int(row[1]), *row[2:]))
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
