"""TPU-native de novo genome assembly engine.

A ground-up JAX/XLA/Pallas redesign of the SH-assembly pipeline
(CQF-deNoise k-mer counting -> Contiger unitig graph -> Minia-style graph
simplification), built for TPU hardware: batched array programs instead of
pointer-chasing, sorted-spectrum counting instead of lock-sharded quotient
filters, pointer-jumping contraction instead of per-thread walks, and
jax.sharding meshes instead of pthread spin locks.

Behavioral reference: Christina-hshi/SH-assembly (see SURVEY.md).
"""

import jax

# The whole engine operates on 64-bit ntHash values; enable x64 before any
# other jax use (TPU emulates 64-bit integer ops with 32-bit pairs).
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
