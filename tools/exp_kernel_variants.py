"""A/B experiments on the fused eval field kernel (bench.py workload).

Variants (each timed as a chained fori_loop inside one jit, see
tools/profile_render.py for why):
  base        : the shipped _field_kernel as-is
  skipsplit   : skip layer consumes x0 and h via two matmuls (no concat)
  bf16act     : biases+relu applied in bf16 (activations stay bf16)
  both        : skipsplit + bf16act

Also sweeps the point tile. Usage:
  python tools/exp_kernel_variants.py [--n_rays 8192] [--tiles 512,1024,2048]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posegen_tpu.kernels import field as F


def make_variant_kernel(depth, skips, nf_kp, nf_view, skipsplit, bf16act,
                        density_only):
    pc = F.pts_ch(nf_kp)

    def kernel(pts_ref, dirs_ref, rot_ref, trn_ref, cut_ref, tau_ref,
               sched_ref, code_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        e_pts, e_view = F.encode_channels(
            pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref, tau_ref,
            with_view=not density_only, nf_kp=nf_kp, nf_view=nf_view,
            sched_ref=None,
        )
        P = e_pts.shape[1]
        act_dt = jnp.bfloat16 if bf16act else jnp.float32

        def relu(acc, b):
            if bf16act:
                return jnp.maximum(acc + b, 0.0).astype(jnp.bfloat16)
            return jnp.maximum(acc + b, 0.0)

        x0 = e_pts.astype(act_dt) if bf16act else e_pts
        h = x0
        h_split = None  # (x0, h) when the concat is deferred
        for i in range(depth):
            w, b = wrefs[2 * i][:, :], wrefs[2 * i + 1][:, :]
            if h_split is not None:
                acc = F.mm_t(w[:, :pc], h_split[0]) + F.mm_t(w[:, pc:], h_split[1])
                h_split = None
            else:
                acc = F.mm_t(w, h)
            h = relu(acc, b)
            if i in skips:
                if skipsplit:
                    h_split = (x0, h)
                else:
                    h = jnp.concatenate([x0, h], axis=0)
        k = 2 * depth
        assert h_split is None, "skip at final layer unsupported in variant"
        alpha = F.mm_t(wrefs[k][:, :], h) + wrefs[k + 1][:, :]
        if density_only:
            out_ref[:, :] = jnp.concatenate(
                [jnp.zeros((3, P), jnp.float32), alpha], axis=0
            )
            return
        feat = F.mm_t(wrefs[k + 2][:, :], h) + wrefs[k + 3][:, :]
        if bf16act:
            feat = feat.astype(jnp.bfloat16)
            e_view = e_view.astype(jnp.bfloat16)
        hv = jnp.concatenate([feat, e_view], axis=0)
        hv = relu(F.mm_t(wrefs[k + 4][:, :], hv), wrefs[k + 5][:, :])
        rgb = F.mm_t(wrefs[k + 6][:, :], hv) + wrefs[k + 7][:, :]
        out_ref[:, :] = jnp.concatenate([rgb, alpha], axis=0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skips", "tile", "density_only",
                     "nf_kp", "nf_view", "skipsplit", "bf16act", "interpret"),
)
def variant_field(pts_t, dirs_t, rot, trn, cut, tau, codes, params,
                  depth=8, skips=(4,), tile=1024, density_only=False,
                  nf_kp=F.NF_KP, nf_view=F.NF_VIEW,
                  skipsplit=False, bf16act=False, interpret=False):
    ns = pts_t.shape[1]
    sched = jnp.ones((1, max(nf_kp + nf_view, 1)), jnp.float32)
    weights = F.flatten_weights(params, depth)
    kernel = make_variant_kernel(
        depth, skips, nf_kp, nf_view, skipsplit, bf16act, density_only
    )
    grid, in_specs, out_spec, _ = F.grouped_specs(
        ns, rot.shape[0], tile, rot, trn, cut, sched, codes, weights
    )
    pc, vc = F.pts_ch(nf_kp), F.view_ch(nf_view)
    flops_per_pt = 2 * (
        pc * 256 + 6 * 256 * 256 + (pc + 256) * 256 + 256 * 256 + 256
        + (256 + vc) * 128 + 3 * 128
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, ns), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * ns,
            bytes_accessed=(3 + 3 + 4) * 4 * ns + 2_000_000,
            transcendentals=(24 * 3 + 72 * 2) * ns,
        ),
        interpret=interpret,
    )(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, *weights)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--tiles", type=str, default="512,768,1024,1536,2048")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode numeric check only (no timing)")
    args = ap.parse_args()
    if args.interpret:
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", "cpu")

    from posegen_tpu.render.raycast import RaycastConfig
    from posegen_tpu.utils.fixtures import make_problem

    n, k = args.n_rays, args.chain
    cfg, params, ctx, rays_o, rays_d = make_problem(RaycastConfig(), n_rays=n)
    S = cfg.N_samples + cfg.N_importance  # fine-pass shape (the hot one)

    z = jnp.linspace(0.1, 4.0, S)[None]
    pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
    ns = n * S
    pts_t = pts.reshape(ns, 3).T
    dirs_t = jnp.broadcast_to(rays_d[:, None], (n, S, 3)).reshape(ns, 3).T
    rot = ctx.skts[:1, :, :3, :3].reshape(1, 24, 9)
    trn = ctx.skts[:1, :, :3, 3].reshape(1, 24, 3)

    # embed state lives in params pytree (see raycast init): cutoff + tau
    cut = params["embed_kp"]["cutoff_dist"][:, None]
    tau = params["embed_kp"]["tau"].reshape(1, 1)
    codes = jnp.zeros((1, 1), jnp.float32)
    prepared = F.prepare_params(params["coarse"], skips=(4,))

    ref = None
    tiles = [int(t) for t in args.tiles.split(",")]
    print(f"fine-pass shape: {n} rays x {S} samples = {ns} pts;"
          f" chain={k}  backend={jax.default_backend()}")
    for name, sk, bf in [("base", False, False), ("skipsplit", True, False),
                         ("bf16act", False, True), ("both", True, True)]:
        for tile in tiles:
            if ns % tile:
                continue
            if args.interpret:
                out = variant_field(
                    pts_t, dirs_t, rot, trn, cut, tau, codes, prepared,
                    tile=tile, skipsplit=sk, bf16act=bf, interpret=True)
                out = np.asarray(out)
                if ref is None:
                    ref = out
                err = float(np.max(np.abs(out - ref)))
                print(f"{name:9s} tile={tile:5d}: interpret max|d|={err:.2e}")
                continue
            f = lambda s: jnp.sum(variant_field(
                pts_t + s, dirs_t, rot, trn, cut, tau, codes, prepared,
                tile=tile, skipsplit=sk, bf16act=bf))
            jf = jax.jit(lambda: jax.lax.fori_loop(
                0, k, lambda i, c: c + 1e-20 * f(c), 0.0))
            try:
                v = jf()
                jax.block_until_ready(v)
            except Exception as e:
                print(f"{name:9s} tile={tile:5d}: FAILED {type(e).__name__}: {e}")
                continue
            t0 = time.perf_counter()
            v = jf()
            jax.block_until_ready(v)
            dt = (time.perf_counter() - t0) / k * 1e3
            # numeric check vs base @ first tile
            out = variant_field(pts_t, dirs_t, rot, trn, cut, tau, codes,
                                prepared, tile=tile, skipsplit=sk, bf16act=bf)
            out = np.asarray(out)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            print(f"{name:9s} tile={tile:5d}: {dt:7.3f} ms  "
                  f"({ns / dt * 1e3 / 1e9:.2f} Gpts/s)  max|d|={err:.2e}")


if __name__ == "__main__":
    main()
