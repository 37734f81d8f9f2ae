import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp

# the TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force CPU here
jax.config.update("jax_platforms", "cpu")

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.runtime import odometry as od

CFG = DirectConfig(num_levels=3, max_points=512, points_per_kf=192,
                   init_points=256, max_frames=5, tracker_iters=8,
                   init_iters=12, ba_iters=4)

cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
sc = SyntheticScene.default(cam, seed=3)
poses = forward_trajectory(30, step=0.08, yaw_rate=0.003)

def nan_report(tree, name):
    bad = []
    for p, x in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            if bool(jnp.any(~jnp.isfinite(x))):
                bad.append(jax.tree_util.keystr(p))
    if bad:
        print(f"  !! NaN in {name}: {bad[:8]}")
    return bool(bad)

odo = od.DirectOdometry(cam, CFG)
for i, (R, t) in enumerate(poses):
    img, _ = sc.render(R, t)
    out = odo.process(img, float(i))
    line = f"frame {i:02d} {out}"
    if odo._window is not None:
        ba = odo._window.ba
        npts = int(jnp.sum(ba.point_valid))
        nfr = int(jnp.sum(ba.frame_valid))
        line += f" | win frames={nfr} pts={npts}"
        if nan_report(ba, f"window@{i}"):
            print(line); break
    if odo.state == "TRACKING":
        line += f" | Tcurr t={np.asarray(odo._T_curr.t).round(3)}"
        if not np.all(np.isfinite(np.asarray(odo._T_curr.t))):
            print(line); print("  !! NaN in tracked pose"); break
    print(line, flush=True)
