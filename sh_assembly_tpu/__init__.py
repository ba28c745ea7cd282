"""TPU-native de novo genome assembly engine.

A ground-up JAX/XLA/Pallas redesign of the SH-assembly pipeline
(CQF-deNoise k-mer counting -> Contiger unitig graph -> Minia-style graph
simplification), built for TPU hardware: batched array programs instead of
pointer-chasing, sorted-spectrum counting instead of lock-sharded quotient
filters, pointer-jumping contraction instead of per-thread walks, and
jax.sharding meshes instead of pthread spin locks.

Behavioral reference: Christina-hshi/SH-assembly (see SURVEY.md).
"""

import os as _os_early

import jax

# The whole engine operates on 64-bit ntHash values; enable x64 before any
# other jax use (TPU emulates 64-bit integer ops with 32-bit pairs).
jax.config.update("jax_enable_x64", True)

# Honor platform selection even when a sitecustomize (e.g. the axon TPU
# plugin bootstrap) imported jax before this process's env was applied:
# env vars are snapshotted at jax import, so re-apply them to the live
# config.  SH_ASSEMBLY_PLATFORM wins over JAX_PLATFORMS.
_plat = _os_early.environ.get(
    "SH_ASSEMBLY_PLATFORM", _os_early.environ.get("JAX_PLATFORMS", "")
)
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# Persistent compilation cache: the CLIs are short-lived processes and the
# counting/contiger programs are large; caching removes ~minutes of XLA
# compile time from every run after the first.
import os as _os

_cache = _os.environ.get(
    "SH_ASSEMBLY_JAX_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "sh_assembly_tpu_jax"),
)
try:
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never a requirement
    pass

__version__ = "0.1.0"
