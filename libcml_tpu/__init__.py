"""libcml_tpu — a TPU-native monocular SLAM framework (MOD-SLAM capabilities).

Brand-new JAX/XLA design with the capability surface of libCML / MOD SLAM
(see SURVEY.md): a mixed direct (DSO-style photometric) + indirect (ORB feature)
SLAM. State lives in fixed-capacity struct-of-arrays pytrees; hot loops are
batched XLA programs fused per frame (the gather-bound linearize sweep is
XLA's to schedule — see BASELINE.md roofline), with one hand-written Pallas
kernel where fusion beyond XLA's reach pays: the dense masked-Hamming match
resolution (ops/pallas_match.py — xor+popcount+top2+mutual in a single VMEM
sweep, no materialized distance matrix). Scaling comes from sharding
points/residuals over a `jax.sharding.Mesh` with psum-reduced camera systems.

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

import os as _os

import jax as _jax

# SLAM numerics (pose composition, Hessian assembly, Schur solves) need true
# f32 matmuls; the default bf16-ish matmul precision silently corrupts small
# 3x3/6x6 products. Hot kernels opt into lower precision explicitly.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the windowed-BA program at production scale
# takes minutes to compile through the TPU tunnel; caching makes every
# process after the first start instantly. Opt out with
# LIBCML_TPU_NO_COMPILE_CACHE=1. CPU-only runs skip it: XLA:CPU AOT entries
# bake in machine features and reloading them can SIGILL on a different
# (or differently-detected) host.
if not _os.environ.get("LIBCML_TPU_NO_COMPILE_CACHE") and \
        not _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "libcml_tpu_xla"),
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"
