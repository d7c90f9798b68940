"""Header-substitution path parsing — equivalent of ``src/io/path_parse.c``
(677 LoC): ``$KEY:fmt$`` tokens in save/load paths are replaced by header
keyword values, e.g. ``result_$LIVETIME:%d$s`` →  ``result_3600s``
(scripts/OSC_Preprocessing.ssf:69 usage).
"""

from __future__ import annotations

import re
from typing import Optional

_TOKEN = re.compile(r"\$([A-Za-z0-9_-]+)(?::([^$]+))?\$")

# keyword name → Keywords attribute (subset of the FITS keyword map)
_ATTRS = {
    "LIVETIME": "livetime", "STACKCNT": "stackcnt", "EXPTIME": "exposure",
    "OBJECT": "object", "FILTER": "filter", "INSTRUME": "instrume",
    "TELESCOP": "telescop", "OBSERVER": "observer", "DATE-OBS": "date_obs",
    "DATEOBS": "date_obs", "GAIN": "gain", "OFFSET": "offset",
    "ISOSPEED": "iso_speed", "FOCALLEN": "focal_length",
    "XBINNING": "binning_x", "YBINNING": "binning_y",
    "CCD-TEMP": "ccd_temp",
}


def parse_path(template: str, img) -> str:
    """Expand $KEY:fmt$ tokens from an image's keywords."""

    def repl(m):
        key = m.group(1).upper()
        fmt = m.group(2) or "%s"
        kw = img.keywords
        val = None
        attr = _ATTRS.get(key)
        if attr is not None:
            val = getattr(kw, attr, None)
        if val is None:
            val = kw.extra.get(key)
        if val is None:
            return "unknown"
        try:
            if "d" in fmt:
                s = fmt % int(round(float(val)))
            elif any(c in fmt for c in "feg"):
                s = fmt % float(val)
            else:
                s = fmt % val
        except (TypeError, ValueError):
            s = str(val)
        # sanitize substituted values for filenames (dates have colons)
        return re.sub(r"[:\s/\\]+", "_", s)

    return _TOKEN.sub(repl, template)
