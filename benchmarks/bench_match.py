"""Microbenchmark: fused Pallas match resolution vs the XLA formulation.

Production shapes: match_projection queries the 4096-slot map arena against
a 512-corner frame with a pair mask each frame. Prints one JSON dict with
both timings and the speedup so the honest number lives in the repo
(BASELINE.md cites this).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def timeit(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libcml_tpu.models.indirect.matching import _resolve
    from libcml_tpu.models.indirect.orb import hamming_matrix
    from libcml_tpu.ops.pallas_match import hamming_resolve_pallas

    results = {}
    rng = np.random.default_rng(0)
    for (N, M) in [(4096, 512), (512, 512), (512, 4096)]:
        dq = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
        dt = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
        mq = jnp.asarray(rng.random(N) > 0.2)
        mt = jnp.asarray(rng.random(M) > 0.2)
        pair = jnp.asarray(rng.random((N, M)) > 0.3)

        @jax.jit
        def xla_path(dq, dt, mq, mt, pair):
            D = hamming_matrix(dq, dt)
            return _resolve(D, mq, mt, pair, 100, 0.9)

        t_xla = timeit(xla_path, dq, dt, mq, mt, pair)
        t_pl = timeit(hamming_resolve_pallas, dq, mq, dt, mt, pair)
        results[f"{N}x{M}"] = {
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pl * 1e6, 1),
            "speedup": round(t_xla / t_pl, 2),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
