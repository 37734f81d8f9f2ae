"""Static configuration for the direct (DSO-style) pipeline.

Static shapes are the TPU contract: point/frame budgets are capacities baked
into compiled programs; validity masks do the dynamic work (SURVEY.md §7
"dynamic sparsity under static shapes"). Defaults mirror the reference presets
(evaluation/dso2000.yaml:7-10 point budgets; DSOBundleAdjustment.h:239,271
window<=6 keyframes + 4 LM iterations; DSOTracker.cpp:23 per-level iterations).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DirectConfig:
    # pyramid
    num_levels: int = 4

    # point budgets (static capacities)
    max_points: int = 2048        # active points in the BA window
    max_immature: int = 2048      # immature (tracing) points per keyframe
    points_per_kf: int = 512      # new immature points created per keyframe

    # window
    max_frames: int = 8           # keyframe slots (reference: 6 active + slack)
    target_frames: int = 7        # marginalize down to this when exceeded

    # tracker
    tracker_iters: int = 12       # GN/LM iterations per pyramid level
    huber_intensity: float = 9.0  # Huber threshold on intensity residual
    outlier_energy: float = 12.0 * 12.0  # per-pattern outlier threshold
    gradient_weight_c2: float = 50.0 * 50.0  # gradient-dependent weighting

    # bundle adjustment
    ba_iters: int = 6             # LM iterations (reference uses 4)
    ba_lambda_init: float = 1e-5
    idepth_min: float = 1e-4
    idepth_max: float = 50.0
    ba_prior_a: float = 10.0      # per-frame affine-a anchor weight
    ba_prior_b: float = 0.1       # per-frame affine-b anchor weight

    # initializer
    init_iters: int = 24
    init_points: int = 1024
    init_reg_weight: float = 0.8
    init_coupling: float = 1.0
    init_alpha_w: float = 0.4        # gauge anchor weight while not snapped
    init_min_translation: float = 0.02  # parallax (|t| * mean rho) to snap
    init_snapped_age: int = 3        # consecutive snapped frames to succeed
    init_smooth_blend: float = 0.0  # per-iteration idepth smoothing blend

    # tracer (epipolar search)
    trace_steps: int = 24         # discretized epipolar samples
    trace_gn_iters: int = 3
    trace_min_quality: float = 1.5  # best/second-best SSD ratio

    # state scaling (conditioning of the 8-dof frame state, DSO-style)
    scale_trans: float = 1.0
    scale_rot: float = 1.0
    scale_a: float = 10.0
    scale_b: float = 1000.0

    # keyframe decision (direct/Tracking.cpp:4 flow+brightness criterion)
    kf_flow_weight: float = 1.0
    kf_flow_threshold: float = 1.0
    kf_brightness_weight: float = 0.5

    # priors (gauge fixing)
    pose_prior_first: float = 1e10
    ab_prior: float = 1e4
