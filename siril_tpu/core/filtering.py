"""Sequence frame filtering — equivalent of ``src/core/sequence_filtering.c``
(613 LoC): predicate combinators selecting frames by regdata quality
criteria (stacking.h:36-45): fwhm, weighted fwhm, roundness, quality,
background, star count — each as an absolute threshold or a "best X%"
(or "best k" count) criterion.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from siril_tpu.core.sequence import Sequence

# criteria: (attribute, better_is_lower)
_CRITERIA = {
    "fwhm": ("fwhm", True),
    "wfwhm": ("weighted_fwhm", True),
    "round": ("roundness", False),
    "roundness": ("roundness", False),
    "quality": ("quality", False),
    "bkg": ("background_lvl", True),
    "background": ("background_lvl", True),
    "nbstars": ("number_of_stars", False),
}


@dataclass
class FilterSpec:
    criterion: str               # key in _CRITERIA, or "incl"
    value: float = 0.0
    is_percent: bool = False     # value is "keep best value%"
    is_count: bool = False       # value is "keep best k frames"


def parse_filter_flag(key: str, value) -> Optional[FilterSpec]:
    """Parse Siril's -filter-fwhm=3k / -filter-round=90% / -filter-incl
    flag forms (command.c parsing convention: '%' = best percent,
    'k' suffix = count... value alone = absolute threshold)."""
    key = key.replace("filter-", "")
    if key == "incl" or key == "included":
        return FilterSpec("incl")
    if key not in _CRITERIA:
        return None
    s = str(value)
    if s.endswith("%"):
        return FilterSpec(key, float(s[:-1]), is_percent=True)
    if s.endswith("k"):
        return FilterSpec(key, float(s[:-1]), is_count=True)
    return FilterSpec(key, float(s))


def apply_filters(seq: Sequence, specs: List[FilterSpec],
                  layer: int = 0) -> np.ndarray:
    """Returns the filtered absolute frame indices (intersection of all
    criteria, starting from the included set)."""
    mask = seq.incl.copy()
    reg = seq.reg(layer) if layer in seq.regparam else None
    for spec in specs:
        if spec.criterion == "incl":
            continue
        if reg is None:
            continue
        attr, lower_better = _CRITERIA[spec.criterion]
        vals = np.asarray(getattr(reg, attr), float)
        valid = reg.valid & mask
        if spec.is_percent or spec.is_count:
            n_valid = int(valid.sum())
            k = int(round(n_valid * spec.value / 100.0)) if spec.is_percent \
                else int(spec.value)
            k = max(min(k, n_valid), 1)
            order = vals.copy()
            if not lower_better:
                order = -order
            order[~valid] = np.inf
            keep_idx = np.argsort(order, kind="stable")[:k]
            newmask = np.zeros_like(mask)
            newmask[keep_idx] = True
            mask &= newmask
        else:
            if lower_better:
                mask &= valid & (vals <= spec.value)
            else:
                mask &= valid & (vals >= spec.value)
    return np.nonzero(mask)[0]
