"""Undo/redo — equivalent of ``src/core/undo.c`` (614 LoC): swap-file
based whole-image undo with a history ring (historic_struct, siril.h:800).
Images (incl. masks) are spilled to a temp swap dir as .npy."""

from __future__ import annotations

import os
import tempfile
import uuid
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from siril_tpu.core.image import SirilImage

MAX_HISTORY = 20


@dataclass
class _Entry:
    path: str
    mask_path: Optional[str]
    description: str


class UndoStack:
    def __init__(self, swap_dir: Optional[str] = None):
        self.swap_dir = swap_dir or os.path.join(tempfile.gettempdir(),
                                                 "siril_tpu_swap")
        os.makedirs(self.swap_dir, exist_ok=True)
        self._undo: List[_Entry] = []
        self._redo: List[_Entry] = []

    def _spill(self, img: SirilImage, desc: str) -> _Entry:
        p = os.path.join(self.swap_dir, f"{uuid.uuid4().hex}.npy")
        np.save(p, img.host())
        mp = None
        if img.mask is not None:
            mp = p + ".mask.npy"
            np.save(mp, img.mask)
        return _Entry(p, mp, desc)

    def _restore(self, e: _Entry, like: SirilImage) -> SirilImage:
        data = np.load(e.path)
        img = like.copy(data=data)
        if e.mask_path and os.path.exists(e.mask_path):
            img.mask = np.load(e.mask_path)
            img.mask_active = like.mask_active
        return img

    def save_state(self, img: SirilImage, description: str) -> None:
        """Call BEFORE a destructive operation (undo_save_state)."""
        self._undo.append(self._spill(img, description))
        while len(self._undo) > MAX_HISTORY:
            self._drop(self._undo.pop(0))
        for e in self._redo:
            self._drop(e)
        self._redo.clear()

    def undo(self, current: SirilImage) -> Optional[SirilImage]:
        if not self._undo:
            return None
        self._redo.append(self._spill(current, "redo point"))
        e = self._undo.pop()
        img = self._restore(e, current)
        self._drop(e)
        return img

    def redo(self, current: SirilImage) -> Optional[SirilImage]:
        if not self._redo:
            return None
        self._undo.append(self._spill(current, "undo point"))
        e = self._redo.pop()
        img = self._restore(e, current)
        self._drop(e)
        return img

    @property
    def can_undo(self) -> bool:
        return bool(self._undo)

    @property
    def can_redo(self) -> bool:
        return bool(self._redo)

    def history(self) -> List[str]:
        return [e.description for e in self._undo]

    def _drop(self, e: _Entry) -> None:
        for p in (e.path, e.mask_path):
            if p and os.path.exists(p):
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def clear(self) -> None:
        for e in self._undo + self._redo:
            self._drop(e)
        self._undo.clear()
        self._redo.clear()
