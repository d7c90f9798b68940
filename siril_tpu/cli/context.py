"""CLI session state — the equivalent of Siril's ``com`` / ``gfit``
globals (core/siril.h cominfo) for the headless command surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.core.settings import Preferences


@dataclass
class Session:
    cwd: str = "."
    image: Optional[SirilImage] = None        # gfit
    image_name: str = ""
    seq: Optional[Sequence] = None
    prefs: Preferences = field(default_factory=Preferences)
    ext: str = ".fit"                          # setext
    force_16bit: bool = False                  # set16bits/set32bits
    wavelet_planes: Optional[list] = None      # wavelet ... wrecons state
    wavelet_img: Optional[SirilImage] = None
    pm_images: Dict[str, SirilImage] = field(default_factory=dict)

    def __post_init__(self):
        # register as the process-active prefs (com.pref equivalent) so
        # stages not handed a Session (debayer in conversion/calibration)
        # honor `set` values
        from siril_tpu.core.settings import set_active

        set_active(self.prefs)
    selection: Optional[tuple] = None          # boxselect
    magnitude_offset: float = 0.0              # setmag
    script_version_ok: bool = True
    stop_requested: bool = False
    undo_stack: Optional[object] = None
    undo_enabled: bool = True
    stars: list = field(default_factory=list)

    def require_image(self) -> SirilImage:
        if self.image is None:
            raise CommandError("no image loaded (use `load` first)")
        return self.image

    def require_seq(self) -> Sequence:
        if self.seq is None:
            raise CommandError("no sequence loaded")
        return self.seq

    def path(self, name: str) -> str:
        if os.path.isabs(name):
            return name
        return os.path.join(self.cwd, name)

    def set_image(self, img: SirilImage, name: str = "") -> None:
        # swap-file undo (undo.c model): the replaced image becomes the
        # undo point, except when simply loading a new file (name set)
        if self.image is not None and img is not self.image and not name \
                and self.undo_enabled:
            if self.undo_stack is None:
                from siril_tpu.core.undo import UndoStack

                self.undo_stack = UndoStack()
            self.undo_stack.save_state(self.image, "image operation")
        self.image = img
        if name:
            self.image_name = name

    def _find_film(self, base: str):
        """Resolve a film path from a basename OR an explicit filename
        ('capture' and 'capture.mp4' both work)."""
        from siril_tpu.io.films import FILM_EXTENSIONS, is_film

        if is_film(base) and os.path.exists(self.path(base)):
            return self.path(base)
        for e in FILM_EXTENSIONS:
            p = self.path(base + e)
            if os.path.exists(p):
                return p
        return None

    def load_sequence(self, name: str) -> Sequence:
        """Load a sequence by name: .seq sidecar, .ser file, or scan."""
        from siril_tpu.core.sequence import Sequence as Seq
        from siril_tpu.io.seqfile import read_seqfile

        base = name[:-4] if name.endswith(".seq") else name
        seqfile = self.path(base + ".seq")
        if not os.path.exists(seqfile) and \
                os.path.exists(self.path(base + "_.seq")):
            # converted sequences carry a trailing underscore
            # (conversion.c naming rule); accept the bare name too
            base = base + "_"
            seqfile = self.path(base + ".seq")
        if os.path.exists(seqfile):
            seq = read_seqfile(seqfile)
        elif os.path.exists(self.path(base + ".ser")) or name.endswith(".ser"):
            p = self.path(base + ".ser" if not name.endswith(".ser") else name)
            seq = Seq.from_ser(p)
        elif self._find_film(base) is not None:
            seq = Seq.from_film(self._find_film(base))
        else:
            try:
                seq = Seq.scan(base, self.cwd)
            except (ValueError, FileNotFoundError):
                if not base.endswith("_"):
                    seq = Seq.scan(base + "_", self.cwd)
                else:
                    raise
        self.seq = seq
        return seq


class CommandError(Exception):
    """Command-level error (reported, non-fatal in scripts unless fatal)."""
