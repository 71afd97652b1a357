"""On-chip breakdown of the stash-eval fine pass (bench.py workload).

Times, each as a chained fori_loop inside one jit (see profile_render.py):
  stash coarse : density pass WITH encode-stash writes
  plain coarse : density pass without
  from-stash   : fine net streaming the stashed encodings (64 samples)
  fresh-16     : normal fine kernel on the N_importance samples only
  co-sort      : the 5-operand raw-by-z merge
  fine-80      : the normal re-encode fine kernel (what stash-eval replaces)

Usage: python tools/exp_stash_eval.py [--n_rays 8192] [--chain 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, jf, k, *args):
    v = jf(*args)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    jax.block_until_ready(jf(*args))
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:12s}: {dt:7.3f} ms")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    from posegen_tpu.kernels import field as F
    from posegen_tpu.render.raycast import RaycastConfig
    from posegen_tpu.utils.fixtures import make_problem

    n, k = args.n_rays, args.chain
    cfg, params, ctx, rays_o, rays_d = make_problem(RaycastConfig(), n_rays=n)
    S, I = cfg.N_samples, cfg.N_importance
    z_c = jnp.linspace(0.1, 4.0, S)[None]
    pts_c = rays_o[:, None] + rays_d[:, None] * z_c[..., None]
    z_i = jnp.linspace(0.1, 4.0, I)[None]
    pts_i = rays_o[:, None] + rays_d[:, None] * z_i[..., None]
    z_f = jnp.linspace(0.1, 4.0, S + I)[None]
    pts_f = rays_o[:, None] + rays_d[:, None] * z_f[..., None]
    fine = params.get("fine", params["coarse"])

    def chain(f):
        def run(*a):
            def body(i, c):
                return c + 1e-20 * jnp.sum(f(c, *a))

            return jax.lax.fori_loop(0, k, body, 0.0)

        return jax.jit(run)

    t_pc = timed("plain coarse", chain(
        lambda s, p, d, c: F.fused_run_net(
            cfg, p["coarse"], p["embed_kp"], pts_c + s, d, c,
            density_only=True)
    ), k, params, rays_d, ctx)

    def stash_coarse(s, p, d, c):
        raw, st = F.fused_run_net(
            cfg, p["coarse"], p["embed_kp"], pts_c + s, d, c,
            density_only=True, stash_encode=True)
        return jnp.sum(raw) + jnp.sum(st.e_pts[0].astype(jnp.float32))

    t_sc = timed("stash coarse", chain(
        lambda s, p, d, c: stash_coarse(s, p, d, c)
    ), k, params, rays_d, ctx)

    def from_stash(s, p, d, c):
        _, st = F.fused_run_net(
            cfg, p["coarse"], p["embed_kp"], pts_c + s * 0.0, d, c,
            density_only=True, stash_encode=True)
        st = st._replace(e_pts=st.e_pts + s.astype(st.e_pts.dtype) * 0)
        return F.fused_run_net_from_stash(
            cfg, fine, p["embed_kp"], st, d, c)

    # from-stash chained INCLUDING its stash producer (data dependence);
    # subtract stash-coarse to get the from-stash kernel alone
    t_fs = timed("stash+fromst", chain(from_stash), k, params, rays_d, ctx)

    t_i = timed("fresh-16", chain(
        lambda s, p, d, c: F.fused_run_net(
            cfg, fine, p["embed_kp"], pts_i + s, d, c)
    ), k, params, rays_d, ctx)

    t_f80 = timed("fine-80", chain(
        lambda s, p, d, c: F.fused_run_net(
            cfg, fine, p["embed_kp"], pts_f + s, d, c)
    ), k, params, rays_d, ctx)

    zc = jnp.broadcast_to(z_c, (n, S))
    zi = jnp.broadcast_to(z_i, (n, I))
    rc = jax.random.normal(jax.random.PRNGKey(0), (n, S + I, 4))

    def cosort(s, zc_, zi_, rc_):
        z_cat = jnp.concatenate([zc_ + s, zi_], axis=-1)
        srt = jax.lax.sort(
            (z_cat,) + tuple(rc_[..., i] for i in range(4)),
            dimension=-1, num_keys=1,
        )
        return jnp.stack(srt[1:], axis=-1) + srt[0][..., None]

    t_cs = timed("co-sort", chain(cosort), k, zc, zi, rc)

    t_vs = timed("value-sort", chain(
        lambda s, zc_, zi_, rc_: jnp.sort(
            jnp.concatenate([zc_ + s, zi_], axis=-1), axis=-1)
    ), k, zc, zi, rc)

    print(f"\nfrom-stash alone ~= {t_fs - t_sc:.3f} ms (chain incl. producer"
          " minus stash coarse)")
    print(f"stash-eval fine total ~= {(t_fs - t_sc) + t_i + (t_cs - t_vs):.3f}"
          f" ms vs re-encode fine {t_f80:.3f} ms")
    print(f"stash write overhead in coarse: {t_sc - t_pc:.3f} ms")


if __name__ == "__main__":
    main()
