"""Time the jitted train step at configurable batch shapes.

Measures the full optimizer step (FK, render, losses, optax updates) on the
current backend — the flagship grouped-batch shapes from RESULTS.md:

  python tools/bench_train_step.py --n_rand 3072 --groups 64          # fused
  python tools/bench_train_step.py --n_rand 3072 --groups 64 --xla    # autodiff
  python tools/bench_train_step.py --n_rand 3072 --groups 256 --opt_pose

Run on a quiet host: never concurrently with pytest or another chip job.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_rand", type=int, default=3072)
    p.add_argument("--groups", type=int, default=64)
    p.add_argument("--n_frames", type=int, default=64)
    p.add_argument("--opt_pose", action="store_true")
    p.add_argument("--use_background", action="store_true")
    p.add_argument("--loss_fn", default="MSE")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--xla", action="store_true", help="force the XLA autodiff path")
    p.add_argument("--tile", type=int, default=0, help="override TRAIN tile choice")
    p.add_argument("--no_stash", action="store_true",
                   help="A/B: disable the stashed-encode backward (STASH_BWD)")
    args = p.parse_args()

    import jax
    import numpy as np

    import posegen_tpu.kernels.field_grad as fg

    if args.no_stash:
        fg.STASH_BWD = False

    if args.tile:
        # pin the adaptive tile chooser for sweeps
        real_pick = fg.pick_train_tile

        def pinned(rpi, s, g):
            import math

            t = args.tile
            step = t // math.gcd(s, t)
            return t, -(-rpi // step) * step

        fg.pick_train_tile = pinned
        # fused_run_net imports the symbol by name from the module at call time
        import posegen_tpu.kernels.field as field_mod  # noqa: F401

    import jax.numpy as jnp

    from posegen_tpu.pose.opt import PoseOptConfig, init_pose_params
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE
    from posegen_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from posegen_tpu.utils.fixtures import make_train_batch

    cfg = RaycastConfig()
    tcfg = TrainConfig(
        loss_fn=args.loss_fn,
        use_background=args.use_background,
        opt_pose=args.opt_pose,
        opt_pose_step=1,
        fused_train=False if args.xla else None,
    )
    pcfg = PoseOptConfig(use_rot6d=True) if args.opt_pose else None

    batch = make_train_batch(
        cfg, n_rays=args.n_rand, opt_pose=args.opt_pose,
        n_frames=args.n_frames, n_groups=args.groups, seed=0,
    )
    if args.use_background:
        batch["bgs"] = jnp.zeros((args.n_rand, 3), jnp.float32)

    variables = init_raycaster(jax.random.PRNGKey(0), cfg)
    pose_params = anchors = None
    if args.opt_pose:
        rng = np.random.default_rng(0)
        bones0 = (rng.standard_normal((args.n_frames, 24, 3)) * 0.1).astype(np.float32)
        kp0 = np.tile(np.asarray(SMPL_REST_POSE)[None], (args.n_frames, 1, 1))
        pose_params, anchors = init_pose_params(pcfg, bones0, kp0)
    state = create_train_state(variables, tcfg, pose_params, anchors)

    # make_train_step returns the UNJITTED step (the CLI jits it) — calling
    # it raw runs op-by-op eager, ~100x slower; always measure the jitted step
    step = jax.jit(make_train_step(
        cfg, tcfg, pcfg, rest_pose=jnp.asarray(SMPL_REST_POSE),
        n_frames=args.n_frames,
    ))
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, stats = step(state, batch, key)
    jax.block_until_ready(stats)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, stats = step(state, batch, key)
    jax.block_until_ready(stats)
    dt = (time.perf_counter() - t0) / args.iters

    print(
        f"backend={jax.default_backend()} n_rand={args.n_rand} "
        f"groups={args.groups} opt_pose={args.opt_pose} xla={args.xla} "
        f"tile={args.tile or 'auto'} stash={fg.STASH_BWD}"
    )
    print(
        f"step: {dt * 1e3:.1f} ms  ({args.n_rand / dt / 1e3:.1f}k rays/s)  "
        f"[first {args.warmup} incl. compile: {compile_s:.1f} s]  "
        f"loss={float(stats['total_loss']):.4f}"
    )


if __name__ == "__main__":
    main()
