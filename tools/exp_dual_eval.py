"""On-chip A/B of the dual-net coarse pass (bench.py workload).

Times, each chained inside one jit (see profile_render.py for why):
  dual  full  : render_rays with the dual-net coarse pass (shipped default)
  2pass full  : render_rays with POSEGEN_NO_DUAL_EVAL (round-2 two-pass path)
  dual kernel : the combined coarse-density + fine-raw kernel alone
  fresh-16    : the fine kernel on only the N_importance fresh samples

The env toggle is read at TRACE time inside render_rays, so flipping it
between building the two jitted closures yields two distinct executables.

Usage: python tools/exp_dual_eval.py [--n_rays 8192] [--chain 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_render import chained, time_chain  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    from posegen_tpu.kernels import field as F
    from posegen_tpu.render.raycast import RaycastConfig, _run_net, render_rays
    from posegen_tpu.utils.fixtures import make_problem

    n, k = args.n_rays, args.chain
    cfg, params, ctx, rays_o, rays_d = make_problem(RaycastConfig(), n_rays=n)
    S, I = cfg.N_samples, cfg.N_importance
    assert F.supports_dual_eval(cfg, ctx, params["coarse"])

    def full(p, o, d, c):
        return chained(
            lambda s: jnp.sum(
                render_rays(cfg, p, o + s, d, c, perturb=0.0,
                            raw_noise_std=0.0, coarse_rgb=False)["rgb_map"]
            ),
            k,
        )(0.0)

    os.environ.pop("POSEGEN_NO_DUAL_EVAL", None)
    jf_dual = jax.jit(full)
    t_dual = time_chain(jf_dual, k, params, rays_o, rays_d, ctx)

    os.environ["POSEGEN_NO_DUAL_EVAL"] = "1"
    jf_2p = jax.jit(lambda p, o, d, c: full(p, o, d, c))
    t_2p = time_chain(jf_2p, k, params, rays_o, rays_d, ctx)
    del os.environ["POSEGEN_NO_DUAL_EVAL"]

    z_c = jnp.linspace(0.1, 4.0, S)[None]
    pts_c = rays_o[:, None] + rays_d[:, None] * z_c[..., None]
    z_i = jnp.linspace(0.1, 4.0, I)[None]
    pts_i = rays_o[:, None] + rays_d[:, None] * z_i[..., None]

    jf_dk = jax.jit(
        lambda p, d, c: chained(
            lambda s: jnp.sum(
                F.fused_run_net(
                    cfg, p["coarse"], p["embed_kp"], pts_c + s, d, c,
                    density_only=True, view_embed_state=p.get("embed_view"),
                    dual_params=p.get("fine", p["coarse"]),
                    interpret=jax.default_backend() == "cpu",
                )[1]
            ),
            k,
        )(0.0)
    )
    jf_i = jax.jit(
        lambda p, d, c: chained(
            lambda s: jnp.sum(
                _run_net(cfg, p.get("fine", p["coarse"]), p, pts_i + s, d, c,
                         True, True)
            ),
            k,
        )(0.0)
    )
    t_dk = time_chain(jf_dk, k, params, rays_d, ctx)
    t_i = time_chain(jf_i, k, params, rays_d, ctx)

    print(f"n_rays={n}  chain={k}  backend={jax.default_backend()}")
    print(f"dual  full  : {t_dual:7.3f} ms  ({n / t_dual:.0f}k rays/s)")
    print(f"2pass full  : {t_2p:7.3f} ms  ({n / t_2p:.0f}k rays/s)")
    print(f"dual kernel : {t_dk:7.3f} ms  [{S} samples, both nets]")
    print(f"fresh-{I:<2d}    : {t_i:7.3f} ms  [fine net only]")
    print(f"delta       : {t_2p - t_dual:+7.3f} ms "
          f"({(t_2p / t_dual - 1) * 100:+.1f}% throughput)")


if __name__ == "__main__":
    main()
