"""siril_tpu — TPU-native astronomical image processing framework.

A from-scratch re-design of the capabilities of Siril (lock042/siril,
reference v1.5.0-dev) on JAX/XLA/Pallas.  The compute path is expressed as
pure functions jitted for TPU; sequences stream from FITS/SER decode into
HBM-resident tiles; rejection stacking, calibration, demosaicing and
registration run as fused device kernels; multi-chip scaling is expressed
with jax.sharding meshes (pixels sharded, frames streamed).

This is NOT a port: see SURVEY.md for the layer map of the reference and
ARCHITECTURE.md for how each reference component maps to a TPU-native
equivalent.
"""

__version__ = "0.1.0"

from siril_tpu.core.image import SirilImage  # noqa: F401
from siril_tpu.core.sequence import Sequence  # noqa: F401
