"""Pallas TPU kernels (Mosaic-compiled hot ops).

`pallas_tpu_available()` is the shared runtime gate: kernels here run on
a TPU backend, under the forced TPU interpreter (CPU parity tests), or
during chipless AOT lowering against a TPU topology
(ADVISE_FLASH_TARGET_TPU=1, scripts/aot_mvitl.py) — everywhere else the
callers fall back to their XLA lowering.
"""

from advise_tpu.ops.flash_attention import (  # noqa: F401
    flash_available as pallas_tpu_available,
)
