"""Core image container — the TPU-native equivalent of Siril's ``struct ffit``.

Reference: ``src/core/siril.h:618-691`` (struct ffit) and ``siril.h:566-616``
(fkeywords).  Differences by design (TPU-first, not a port):

- Pixel data is a single planar ``float32`` array of shape ``(C, H, W)`` in
  the [0, 1] Siril float convention (``siril.h:88-97``: USHRT_MAX scaling).
  The reference's u16/f32 duality (``data``/``fdata``) collapses to float32
  compute with explicit u16-range round-trip rules on save; ``orig_bitdepth``
  remembers the source encoding so ``save`` can reproduce it.
- Data may live on host (numpy) or device (jax.Array) transparently; compute
  paths call :meth:`device` and I/O paths :meth:`host`.
- No embedded rwlock: concurrency is managed by the engine (one pipeline job
  at a time, same policy as the reference processing thread,
  ``core/processing_thread.h:1-27``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

USHRT_MAX_SINGLE = 65535.0
INV_USHRT_MAX_SINGLE = 1.0 / 65535.0
UCHAR_MAX_SINGLE = 255.0

# Siril bitpix naming (cfitsio values) kept for .seq / FITS compat
BYTE_IMG = 8
SHORT_IMG = 16
USHORT_IMG = 20
LONG_IMG = 32
FLOAT_IMG = -32
DOUBLE_IMG = -64


@dataclass
class Keywords:
    """FITS keyword metadata — mirrors ``fkeywords`` (``siril.h:566-616``).

    Unknown/unmapped header cards are preserved verbatim in ``extra``
    (reference behavior: ``io/fits_keywords.c`` unknown-key preservation).
    """

    bscale: float = 1.0
    bzero: float = 0.0
    lo: int = 0
    hi: int = 0
    program: str = ""
    filename: str = ""
    data_max: float = 0.0
    data_min: float = 0.0
    pixel_size_x: float = 0.0
    pixel_size_y: float = 0.0
    binning_x: int = 1
    binning_y: int = 1
    row_order: str = ""
    date: Optional[str] = None          # ISO 8601 UTC (DATE)
    date_obs: Optional[str] = None      # ISO 8601 UTC (DATE-OBS)
    filter: str = ""
    image_type: str = ""
    object: str = ""
    instrume: str = ""
    telescop: str = ""
    observer: str = ""
    centalt: float = 0.0
    centaz: float = 0.0
    sitelat: float = 0.0
    sitelong: float = 0.0
    siteelev: float = 0.0
    bayer_pattern: str = ""
    bayer_xoffset: int = 0
    bayer_yoffset: int = 0
    airmass: float = 0.0
    focal_length: float = 0.0
    iso_speed: float = 0.0
    exposure: float = 0.0
    aperture: float = 0.0
    ccd_temp: float = -999.0
    set_temp: float = -999.0
    livetime: float = 0.0
    stackcnt: int = 0
    cvf: float = 0.0
    gain: int = 0
    offset: int = 0
    focname: str = ""
    focuspos: int = 0
    focussz: int = 0
    foctemp: float = -999.0
    # Plate-solving keywords (CRPIX/CRVAL/CD..., handled by wcs module) go
    # through `extra` + the image's `wcs` attribute.
    extra: dict = field(default_factory=dict)

    def copy(self) -> "Keywords":
        k = dataclasses.replace(self)
        k.extra = dict(self.extra)
        return k


@dataclass
class SirilImage:
    """Planar float32 image + metadata.  Equivalent of ``struct ffit``.

    ``data`` is (C, H, W) float32; C is 1 (mono) or 3 (RGB).  Values follow
    Siril's float convention: nominally in [0, 1], where 1.0 maps to u16
    65535 on save.  ``data`` may be a numpy array (host) or a jax.Array
    (device).
    """

    data: Any
    keywords: Keywords = field(default_factory=Keywords)
    orig_bitdepth: int = FLOAT_IMG      # bitpix of the source file
    header_text: Optional[str] = None   # verbatim source header, if FITS
    history: list = field(default_factory=list)
    mask: Optional[Any] = None          # (H, W) float32 in [0,1], or None
    mask_active: bool = False
    wcs: Optional[Any] = None           # siril_tpu.ops.wcs.WCS or None
    top_down: bool = False
    stats: Optional[list] = None        # cached per-layer ImStats
    icc_profile: Optional[bytes] = None  # raw embedded .icc bytes (ffit.icc_profile)

    # ---- shape accessors (reference: ffit.rx/ry/naxes) ----
    @property
    def nchans(self) -> int:
        return int(self.data.shape[0])

    @property
    def height(self) -> int:
        return int(self.data.shape[1])

    @property
    def width(self) -> int:
        return int(self.data.shape[2])

    @property
    def rx(self) -> int:  # Siril naming: rx = width
        return self.width

    @property
    def ry(self) -> int:
        return self.height

    @property
    def shape(self):
        return tuple(self.data.shape)

    def is_color(self) -> bool:
        return self.nchans == 3

    def is_cfa(self) -> bool:
        return self.nchans == 1 and bool(self.keywords.bayer_pattern)

    # ---- host/device movement ----
    def host(self) -> np.ndarray:
        """Return pixel data as a numpy float32 array (device→host if needed)."""
        return np.asarray(self.data, dtype=np.float32)

    def device(self):
        """Return pixel data as a jax.Array on the default device."""
        import jax.numpy as jnp

        if isinstance(self.data, np.ndarray):
            return jnp.asarray(self.data, dtype=jnp.float32)
        return self.data

    # ---- conversions ----
    def to_u16(self) -> np.ndarray:
        """(C,H,W) uint16 following Siril's float→ushort rule (roundf)."""
        a = np.clip(self.host(), 0.0, 1.0)
        return np.rint(a * USHRT_MAX_SINGLE).astype(np.uint16)

    def to_u8(self) -> np.ndarray:
        a = np.clip(self.host(), 0.0, 1.0)
        return np.rint(a * UCHAR_MAX_SINGLE).astype(np.uint8)

    @staticmethod
    def from_u16(arr: np.ndarray, **kw) -> "SirilImage":
        a = arr.astype(np.float32) * np.float32(INV_USHRT_MAX_SINGLE)
        if a.ndim == 2:
            a = a[None]
        return SirilImage(data=a, orig_bitdepth=USHORT_IMG, **kw)

    def copy(self, data: Any = None) -> "SirilImage":
        """Deep-ish copy (data copied; keywords/history copied; wcs shared)."""
        d = data if data is not None else (
            self.data.copy() if isinstance(self.data, np.ndarray) else self.data
        )
        return SirilImage(
            data=d,
            keywords=self.keywords.copy(),
            orig_bitdepth=self.orig_bitdepth,
            header_text=self.header_text,
            history=list(self.history),
            mask=None if self.mask is None else np.array(self.mask),
            mask_active=self.mask_active,
            wcs=self.wcs,
            top_down=self.top_down,
            icc_profile=self.icc_profile,
        )

    def log_history(self, msg: str) -> None:
        self.history.append(msg)

    # ---- mask blending (reference: src/core/masks.c blend rule) ----
    def apply_mask_blend(self, new_data):
        """result = mask*new + (1-mask)*old, if a mask is active."""
        if not self.mask_active or self.mask is None:
            return new_data
        import jax.numpy as jnp

        xp = jnp if not isinstance(new_data, np.ndarray) else np
        m = xp.asarray(self.mask, dtype=xp.float32)[None]
        old = self.data if not isinstance(new_data, np.ndarray) else self.host()
        return m * new_data + (1.0 - m) * old


def ensure_chw(arr: np.ndarray) -> np.ndarray:
    """Normalize an array to planar (C, H, W) float32."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 2:
        return a[None]
    if a.ndim == 3:
        if a.shape[0] in (1, 3):
            return a
        if a.shape[2] in (1, 3):  # interleaved → planar
            return np.ascontiguousarray(np.moveaxis(a, 2, 0))
    raise ValueError(f"unsupported image shape {a.shape}")
