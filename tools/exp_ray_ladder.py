"""A/B the per-ray view ladder on the fine eval pass (bench.py workload).

Times fused_run_net at the fine-pass shape (8192 rays x 80 samples) with
ray_ladder False vs True, chained inside one jit (see profile_render.py
for why naive dispatch loops mis-measure on the tunneled axon platform),
and numeric-checks the two against each other.

Usage: python tools/exp_ray_ladder.py [--n_rays 8192] [--chain 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    from posegen_tpu.kernels.field import fused_run_net
    from posegen_tpu.render.raycast import RaycastConfig
    from posegen_tpu.utils.fixtures import make_problem

    n, k = args.n_rays, args.chain
    cfg, params, ctx, rays_o, rays_d = make_problem(RaycastConfig(), n_rays=n)
    S = cfg.N_samples + cfg.N_importance
    z = jnp.linspace(0.1, 4.0, S)[None]
    pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
    net = params.get("fine", params["coarse"])

    def run(ladder):
        def f(p, d, c):
            def body(i, s):
                raw = fused_run_net(
                    cfg, net, p["embed_kp"], pts + s, d, c,
                    ray_ladder=ladder,
                )
                return s + 1e-20 * jnp.sum(raw)

            return jax.lax.fori_loop(0, k, body, 0.0)

        jf = jax.jit(f)
        v = jf(params, rays_d, ctx)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(params, rays_d, ctx))
        return (time.perf_counter() - t0) / k * 1e3

    raw_pp = fused_run_net(cfg, net, params["embed_kp"], pts, rays_d, ctx,
                           ray_ladder=False)
    raw_rl = fused_run_net(cfg, net, params["embed_kp"], pts, rays_d, ctx,
                           ray_ladder=True)
    err = float(jnp.abs(raw_rl - raw_pp).max())
    scale = max(float(jnp.abs(raw_pp).max()), 1.0)
    print(f"numeric check: max abs err {err:.3e} (scale {scale:.2f})")
    assert err < 0.05 * scale, "ray-ladder output diverged"

    t_pp = run(False)
    t_rl = run(True)
    print(f"n_rays={n}  S={S}  chain={k}  backend={jax.default_backend()}")
    print(f"per-point ladder : {t_pp:7.3f} ms  ({n / t_pp:,.0f} rays/s/ms-scale)")
    print(f"per-ray ladder   : {t_rl:7.3f} ms  ({(t_pp / t_rl - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
