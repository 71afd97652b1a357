"""On-chip breakdown of the eval render path (bench.py workload).

Times the full render_rays against its two fused-kernel passes, each as a
data-dependent chain inside ONE jit (lax.fori_loop with a scalar carry
feeding the next iteration's inputs) so executions serialize on-device.
Naive dispatch loops mis-measure badly on the tunneled axon platform:
block_until_ready on an intermediate can return before queued work drains,
reporting dispatch cost (~0.06 ms) instead of kernel cost (~7 ms).

Usage: python tools/profile_render.py [--n_rays 8192] [--chain 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chained(f, k):
    """Run f k times with a scalar data dependence between iterations."""

    def run(carry):
        def body(i, c):
            return c + 1e-20 * f(c)

        return jax.lax.fori_loop(0, k, body, carry)

    return run


def time_chain(jf, k, *args) -> float:
    v = jf(*args)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    v = jf(*args)
    jax.block_until_ready(v)
    return (time.perf_counter() - t0) / k * 1e3  # ms per call


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    from posegen_tpu.render.raycast import RaycastConfig, _run_net, render_rays
    from posegen_tpu.utils.fixtures import make_problem

    n, k = args.n_rays, args.chain
    cfg, params, ctx, rays_o, rays_d = make_problem(RaycastConfig(), n_rays=n)
    S, I = cfg.N_samples, cfg.N_importance

    z_c = jnp.linspace(0.1, 4.0, S)[None]
    pts_c = rays_o[:, None] + rays_d[:, None] * z_c[..., None]
    z_f = jnp.linspace(0.1, 4.0, S + I)[None]
    pts_f = rays_o[:, None] + rays_d[:, None] * z_f[..., None]

    jf_c = jax.jit(
        lambda p, d, c: chained(
            lambda s: jnp.sum(
                _run_net(cfg, p["coarse"], p, pts_c + s, d, c, True, True,
                         density_only=True)
            ),
            k,
        )(0.0)
    )
    jf_f = jax.jit(
        lambda p, d, c: chained(
            lambda s: jnp.sum(
                _run_net(cfg, p.get("fine", p["coarse"]), p, pts_f + s, d, c,
                         True, True)
            ),
            k,
        )(0.0)
    )
    jf_full = jax.jit(
        lambda p, o, d, c: chained(
            lambda s: jnp.sum(
                render_rays(cfg, p, o + s, d, c, perturb=0.0,
                            raw_noise_std=0.0, coarse_rgb=False)["rgb_map"]
            ),
            k,
        )(0.0)
    )

    t_c = time_chain(jf_c, k, params, rays_d, ctx)
    t_f = time_chain(jf_f, k, params, rays_d, ctx)
    t_full = time_chain(jf_full, k, params, rays_o, rays_d, ctx)

    rps = n / (t_full / 1e3)
    print(f"n_rays={n}  chain={k}  backend={jax.default_backend()}")
    print(f"coarse kernel    : {t_c:7.3f} ms  [density-only, {S} samples]")
    print(f"fine kernel      : {t_f:7.3f} ms  [{S + I} samples, full]")
    print(f"full render_rays : {t_full:7.3f} ms  ({rps / 1e3:.1f}k rays/s)")
    print(f"glue (full-c-f)  : {t_full - t_c - t_f:7.3f} ms  "
          "[sampling, pdf, z-merge, composite; negative = overlap]")


if __name__ == "__main__":
    main()
