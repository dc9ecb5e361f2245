"""twopaco_tpu — TPU-native compacted de Bruijn graph constructor.

A brand-new JAX/XLA/Pallas framework with the capabilities of
medvedevgroup/TwoPaCo (reference: /root/reference): streamed multi-FASTA
input, two-pass junction detection via a multi-hash Bloom filter over
(k+1)-mer edges with exact sorted verification of candidates, multi-round
operation to bound filter memory, the 12-byte binary junction-position
output format, and a graphdump converter (seq/group/dot/gfa1/gfa2/fasta).

Architecture (TPU-first, not a port):
  - host io layer parses FASTA to 2-bit codes and batches fixed-size
    windows with k+1-char halos (reference: vertexenumerator.h:1108-1226);
  - all per-position work (k-mer packing, canonical reverse complement,
    hashing, Bloom probes) is vectorized JAX integer math over
    (batch, positions) arrays — no rolling scan, every position computed
    independently so XLA can tile onto the VPU;
  - the Bloom filter lives in HBM as a flat array; fill is a scatter,
    probe is a gather (reference: concurrentbitvector.h);
  - exact candidate verification replaces the reference's 1024 mutexed
    hash tables (vertexenumerator.h:63-90) with a device sort + segmented
    reduction;
  - junction ids are ranks in the sorted canonical k-mer dictionary,
    making runs bit-deterministic (the reference is seeded from
    /dev/urandom and is not; see SURVEY.md §5).
"""

import os as _os


def _retain_heap() -> None:
    """Keep freed large allocations in the process heap.

    glibc serves >128KB allocations via mmap and returns them to the OS
    on free; on VMs whose memory is demand-faulted from the hypervisor
    (first touch of a new page measured at ~70-100us here), that makes
    every large numpy temporary re-fault its pages — array passes ran
    30-50x slower than warm-memory reruns. Raising the mmap/trim
    thresholds makes the heap retain and reuse warmed pages; RSS stays
    high, which is the intended trade. TWOPACO_RETAIN_HEAP=0 disables.
    """
    if _os.environ.get("TWOPACO_RETAIN_HEAP", "1") == "0":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        # INT_MAX: even ~1-2 GB occurrence-stream temporaries (62-strain
        # pangenomes hit 40%+ junction-occurrence density) must come
        # from the retained heap, not fresh cold-faulted mmaps
        libc.mallopt(M_MMAP_THRESHOLD, 0x7FFFFFFF)
        libc.mallopt(M_TRIM_THRESHOLD, 0x7FFFFFFF)
    except Exception:
        pass  # non-glibc platforms: default allocator behavior


_retain_heap()

import jax as _jax

# All k-mer/hash math is explicit fixed-width integer arithmetic; several
# paths (filter indices beyond 2^32, the int64 junction id format) need
# 64-bit types, so x64 must be on before any tracing happens.
_jax.config.update("jax_enable_x64", True)

# TWOPACO_PLATFORM=cpu|tpu|axon overrides the backend (the image's
# sitecustomize pins 'axon' in a way plain JAX_PLATFORMS can't undo).
_plat = _os.environ.get("TWOPACO_PLATFORM")
if _plat:
    _jax.config.update("jax_platforms", _plat)

# Persistent compile cache: CLI processes are short-lived; without this
# every invocation pays the full XLA compile (~20-40s on TPU).
_cache = _os.environ.get(
    "TWOPACO_COMPILE_CACHE", _os.path.expanduser("~/.cache/twopaco_tpu_xla")
)
if _cache and _cache != "0":
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    # 0.5s covers the big TPU programs without churning tiny entries; the
    # test suite sets this to 0 (with its own dir) because its wall time is
    # thousands of small op-by-op CPU compiles (tests/conftest.py).
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(_os.environ.get("TWOPACO_CACHE_MIN_COMPILE_S", 0.5)),
    )

__version__ = "0.1.0"

INVALID_VERTEX = (1 << 63) - 1  # reference: common.cpp:5 (INT64_MAX)
