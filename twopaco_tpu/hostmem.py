"""Large host-buffer allocation tuned for this VM's demand faulting.

First touch of numpy's default (private anonymous) mmap pages costs
~12-25 s/GB on the Firecracker VM this framework targets, while SHARED
anonymous mappings fault at ~0.9 s/GB (measured; the hypervisor tracks
private pages individually). glibc heap retention (mallopt in
twopaco_tpu/__init__) shields repeated same-size allocations, but every
fresh multi-hundred-MB array — merge key buffers, emit scratch —
still paid the private-anon tax once per run.

big_empty() returns an uninitialized numpy array backed by a shared
anonymous mmap for sizes where the tax matters, np.empty otherwise.
"""

from __future__ import annotations

import mmap

import numpy as np

# below this, glibc heap reuse (see __init__) makes np.empty fine
_MMAP_MIN_BYTES = 64 << 20


def big_empty(shape, dtype) -> np.ndarray:
    """Uninitialized array; shared-anon-mmap-backed when large. The
    mapping lives exactly as long as the array (kept via .base)."""
    if isinstance(shape, (int, np.integer)):
        shape = (int(shape),)
    n = 1
    for s in shape:
        n *= int(s)
    dtype = np.dtype(dtype)
    n_bytes = n * dtype.itemsize
    if n_bytes < _MMAP_MIN_BYTES:
        return np.empty(shape, dtype)
    buf = mmap.mmap(-1, max(n_bytes, 1))
    return np.frombuffer(buf, dtype=dtype, count=n).reshape(shape)
