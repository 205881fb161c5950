"""Global dtype / padding policy.

TPU numerics policy: all device math is float32 (MXU-friendly; f64 is
emulated and slow on TPU).  The reference leans on float64 + jitter
escalation for Cholesky robustness (HEBO/hebo/models/gp/gp.py:103-126);
we instead standardize inputs/outputs aggressively and keep a jitter
ladder *inside* the jitted program (see hebo_tpu.ops.chol) so no retrace
ever happens on a numerical failure.
"""

from __future__ import annotations

import numpy as np

DEVICE_DTYPE = np.float32

# Padding buckets for the training-set size N: jitted GP programs compile
# once per bucket, so N growing by 1 each BO iteration does not recompile.
_BUCKETS = (8, 16, 32, 64, 128, 256, 384, 512, 768, 1024, 1536, 2048)


def pad_bucket(n: int) -> int:
    """Smallest bucket >= n (multiples of 8 → sublane-aligned for f32)."""
    for b in _BUCKETS:
        if n <= b:
            return b
    # beyond table: round up to multiple of 256
    return int(np.ceil(n / 256) * 256)
