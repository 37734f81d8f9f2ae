"""libcml_tpu — a TPU-native monocular SLAM framework (MOD-SLAM capabilities).

Brand-new JAX/XLA/Pallas design with the capability surface of libCML / MOD SLAM
(see SURVEY.md): a mixed direct (DSO-style photometric) + indirect (ORB feature)
SLAM. State lives in fixed-capacity struct-of-arrays pytrees; hot loops are
batched XLA/Pallas kernels; scaling comes from sharding points/residuals over a
`jax.sharding.Mesh` with psum-reduced camera systems.

Subpackages:
  core      — Lie groups (SO3/SE3), camera/distortion models, geometry
  ops       — image kernels: pyramids, gradients, interpolation, reductions
  models    — the SLAM pipelines: direct (DSO), indirect (ORB), hybrid (MOD)
  parallel  — mesh construction, sharded bundle adjustment
  data      — dataset loaders (KITTI, TUM, ...) + synthetic scene generator
  eval      — trajectory alignment, ATE/RPE, TUM/KITTI export
  runtime   — frame loop, configuration system, statistics
  utils     — logging, timers
"""

import jax as _jax

# SLAM numerics (pose composition, Hessian assembly, Schur solves) need true
# f32 matmuls; the default bf16-ish matmul precision silently corrupts small
# 3x3/6x6 products. Hot kernels opt into lower precision explicitly.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
