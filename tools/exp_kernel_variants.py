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


def encode_bf16(pts_ref, dirs_ref, rot, trn, cut_ref, tau_ref,
                with_view=True, nf_kp=F.NF_KP, nf_view=F.NF_VIEW, half=None):
    """encode_channels clone: gates/transforms in f32, PE ladders + concat
    in bf16 (the MXU casts to bf16 anyway). half=(lo, size) slices the
    point tile for the two-half pipelining variant."""
    sl = (slice(None), slice(None)) if half is None else (
        slice(None), pl.ds(half[0], half[1]))
    x = pts_ref[0:1, sl[1]]
    y = pts_ref[1:2, sl[1]]
    z = pts_ref[2:3, sl[1]]
    R = rot[:, :]
    t = trn[:, :]
    XT = R[:, 0][:, None] * x + R[:, 1][:, None] * y + R[:, 2][:, None] * z + t[:, 0][:, None]
    YT = R[:, 3][:, None] * x + R[:, 4][:, None] * y + R[:, 5][:, None] * z + t[:, 1][:, None]
    ZT = R[:, 6][:, None] * x + R[:, 7][:, None] * y + R[:, 8][:, None] * z + t[:, 2][:, None]
    v = jnp.sqrt(XT * XT + YT * YT + ZT * ZT)
    w32 = 1.0 - jax.nn.sigmoid(tau_ref[0, 0] * (v - cut_ref[:, :]))
    inv_v = 1.0 / jnp.maximum(v, 1e-12)
    bf = jnp.bfloat16
    w = w32.astype(bf)
    rows = [(v * w32).astype(bf)]
    sv32, cv32 = jnp.sin(v), jnp.cos(v)
    sv, cv = sv32.astype(bf), cv32.astype(bf)
    for f_idx in range(nf_kp):
        rows.append(sv * w)
        rows.append(cv * w)
        if f_idx + 1 < nf_kp:
            # recurrence stays f32 to avoid error growth across octaves
            sv32, cv32 = 2.0 * sv32 * cv32, 1.0 - 2.0 * sv32 * sv32
            sv, cv = sv32.astype(bf), cv32.astype(bf)
    rows.append((XT * inv_v).astype(bf))
    rows.append((YT * inv_v).astype(bf))
    rows.append((ZT * inv_v).astype(bf))
    e_pts = jnp.concatenate(rows, axis=0)
    if not with_view:
        return e_pts, None
    dx = dirs_ref[0:1, sl[1]]
    dy = dirs_ref[1:2, sl[1]]
    dz = dirs_ref[2:3, sl[1]]
    DX = R[:, 0][:, None] * dx + R[:, 1][:, None] * dy + R[:, 2][:, None] * dz
    DY = R[:, 3][:, None] * dx + R[:, 4][:, None] * dy + R[:, 5][:, None] * dz
    DZ = R[:, 6][:, None] * dx + R[:, 7][:, None] * dy + R[:, 8][:, None] * dz
    dn_inv = jax.lax.rsqrt(jnp.maximum(DX * DX + DY * DY + DZ * DZ, 1e-24))
    dnx, dny, dnz = DX * dn_inv, DY * dn_inv, DZ * dn_inv
    vrows = [(dnx * w32).astype(bf), (dny * w32).astype(bf),
             (dnz * w32).astype(bf)]
    sc32 = [(jnp.sin(q), jnp.cos(q)) for q in (dnx, dny, dnz)]
    sc = [(s.astype(bf), c.astype(bf)) for s, c in sc32]
    for f_idx in range(nf_view):
        for sq, _ in sc:
            vrows.append(sq * w)
        for _, cq in sc:
            vrows.append(cq * w)
        if f_idx + 1 < nf_view:
            sc32 = [(2.0 * s * c, 1.0 - 2.0 * s * s) for s, c in sc32]
            sc = [(s.astype(bf), c.astype(bf)) for s, c in sc32]
    e_view = jnp.concatenate(vrows, axis=0)
    return e_pts, e_view


def encode_mx(pts_ref, dirs_ref, rot, trn, cut_ref, tau_ref,
              with_view=True, nf_kp=F.NF_KP, nf_view=F.NF_VIEW):
    """encode_channels clone with the 24-joint transforms on the MXU:
    one f32 (72, 4) @ (4, P) dot for points, (72, 3) @ (3, P) for dirs."""
    P = pts_ref.shape[1]
    R = rot[:, :]  # (24, 9)
    t = trn[:, :]  # (24, 3)
    # (72, 4): rows [Rj0 Rj1 Rj2 tj_c] grouped X(24) Y(24) Z(24)
    RT = jnp.concatenate(
        [
            jnp.concatenate([R[:, 0:3], t[:, 0:1]], axis=1),
            jnp.concatenate([R[:, 3:6], t[:, 1:2]], axis=1),
            jnp.concatenate([R[:, 6:9], t[:, 2:3]], axis=1),
        ],
        axis=0,
    )
    ptsw = jnp.concatenate(
        [pts_ref[:, :], jnp.ones((1, P), jnp.float32)], axis=0
    )
    XYZ = jax.lax.dot_general(
        RT, ptsw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # f32 in, f32 out
    XT, YT, ZT = XYZ[0:24], XYZ[24:48], XYZ[48:72]
    v = jnp.sqrt(XT * XT + YT * YT + ZT * ZT)
    w = 1.0 - jax.nn.sigmoid(tau_ref[0, 0] * (v - cut_ref[:, :]))
    inv_v = 1.0 / jnp.maximum(v, 1e-12)
    rows = [v * w]
    sv, cv = jnp.sin(v), jnp.cos(v)
    for f_idx in range(nf_kp):
        rows.append(sv * w)
        rows.append(cv * w)
        if f_idx + 1 < nf_kp:
            sv, cv = 2.0 * sv * cv, 1.0 - 2.0 * sv * sv
    rows.extend([XT * inv_v, YT * inv_v, ZT * inv_v])
    e_pts = jnp.concatenate(rows, axis=0)
    if not with_view:
        return e_pts, None
    DXYZ = jax.lax.dot_general(
        RT[:, :3], dirs_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    DX, DY, DZ = DXYZ[0:24], DXYZ[24:48], DXYZ[48:72]
    dn_inv = jax.lax.rsqrt(jnp.maximum(DX * DX + DY * DY + DZ * DZ, 1e-24))
    dnx, dny, dnz = DX * dn_inv, DY * dn_inv, DZ * dn_inv
    vrows = [dnx * w, dny * w, dnz * w]
    sc = [(jnp.sin(q), jnp.cos(q)) for q in (dnx, dny, dnz)]
    for f_idx in range(nf_view):
        for sq, _ in sc:
            vrows.append(sq * w)
        for _, cq in sc:
            vrows.append(cq * w)
        if f_idx + 1 < nf_view:
            sc = [(2.0 * sq * cq, 1.0 - 2.0 * sq * sq) for sq, cq in sc]
    e_view = jnp.concatenate(vrows, axis=0)
    return e_pts, e_view


def make_variant_kernel(depth, skips, nf_kp, nf_view, skipsplit, bf16act,
                        density_only, viewsplit=False, encode_only=False,
                        bf16enc=False, halves=1, mxenc=False):
    pc = F.pts_ch(nf_kp)

    def kernel(pts_ref, dirs_ref, rot_ref, trn_ref, cut_ref, tau_ref,
               sched_ref, code_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        if encode_only == "gates":
            # transforms + cutoff gates only (no PE ladders)
            x, y, z = pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :]
            R, t = rot_ref[0][:, :], trn_ref[0][:, :]
            XT = R[:, 0][:, None] * x + R[:, 1][:, None] * y + R[:, 2][:, None] * z + t[:, 0][:, None]
            YT = R[:, 3][:, None] * x + R[:, 4][:, None] * y + R[:, 5][:, None] * z + t[:, 1][:, None]
            ZT = R[:, 6][:, None] * x + R[:, 7][:, None] * y + R[:, 8][:, None] * z + t[:, 2][:, None]
            v = jnp.sqrt(XT * XT + YT * YT + ZT * ZT)
            w = 1.0 - jax.nn.sigmoid(tau_ref[0, 0] * (v - cut_ref[:, :]))
            s = jnp.sum(v * w, axis=0, keepdims=True)
            out_ref[:, :] = jnp.broadcast_to(s, (4, pts_ref.shape[1]))
            return
        def enc(half):
            if mxenc:
                return encode_mx(
                    pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref,
                    tau_ref, with_view=not density_only, nf_kp=nf_kp,
                    nf_view=nf_view,
                )
            if bf16enc:
                return encode_bf16(
                    pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref,
                    tau_ref, with_view=not density_only, nf_kp=nf_kp,
                    nf_view=nf_view, half=half,
                )
            assert half is None, "halves>1 requires bf16enc"
            return F.encode_channels(
                pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref, tau_ref,
                with_view=not density_only, nf_kp=nf_kp, nf_view=nf_view,
                sched_ref=None,
            )

        act_dt = jnp.bfloat16 if bf16act else jnp.float32

        def relu(acc, b):
            if bf16act:
                return jnp.maximum(acc + b, 0.0).astype(jnp.bfloat16)
            return jnp.maximum(acc + b, 0.0)

        def mlp(e_pts, e_view):
            P = e_pts.shape[1]
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
                return jnp.concatenate(
                    [jnp.zeros((3, P), jnp.float32), alpha], axis=0
                )
            feat = F.mm_t(wrefs[k + 2][:, :], h) + wrefs[k + 3][:, :]
            ev = e_view
            if bf16act or bf16enc:
                feat = feat.astype(jnp.bfloat16)
                ev = ev.astype(jnp.bfloat16)
            wv = wrefs[k + 4][:, :]
            if viewsplit:
                acc = F.mm_t(wv[:, :256], feat) + F.mm_t(wv[:, 256:], ev)
                hv = relu(acc, wrefs[k + 5][:, :])
            else:
                hv = jnp.concatenate([feat, ev], axis=0)
                hv = relu(F.mm_t(wv, hv), wrefs[k + 5][:, :])
            rgb = F.mm_t(wrefs[k + 6][:, :], hv) + wrefs[k + 7][:, :]
            return jnp.concatenate([rgb, alpha], axis=0)

        P_full = pts_ref.shape[1]
        if encode_only:
            e_pts, e_view = enc(None)
            s = jnp.sum(e_pts.astype(jnp.float32), axis=0, keepdims=True)
            if e_view is not None:
                s = s + jnp.sum(e_view.astype(jnp.float32), axis=0, keepdims=True)
            out_ref[:, :] = jnp.broadcast_to(s, (4, P_full))
            return
        if halves == 1:
            e_pts, e_view = enc(None)
            out_ref[:, :] = mlp(e_pts, e_view)
            return
        # software pipelining probe: encode all halves up-front (program
        # order puts half i+1's VPU encode before half i's MXU layers have
        # retired — gives the scheduler room to overlap)
        hp = P_full // halves
        encs = [enc((i * hp, hp)) for i in range(halves)]
        for i, (e_pts, e_view) in enumerate(encs):
            out_ref[:, i * hp:(i + 1) * hp] = mlp(e_pts, e_view)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skips", "tile", "density_only",
                     "nf_kp", "nf_view", "skipsplit", "bf16act", "interpret",
                     "viewsplit", "encode_only", "bf16enc", "halves",
                     "mxenc"),
)
def variant_field(pts_t, dirs_t, rot, trn, cut, tau, codes, params,
                  depth=8, skips=(4,), tile=1024, density_only=False,
                  nf_kp=F.NF_KP, nf_view=F.NF_VIEW,
                  skipsplit=False, bf16act=False, interpret=False,
                  viewsplit=False, encode_only=False, bf16enc=False,
                  halves=1, mxenc=False):
    ns = pts_t.shape[1]
    sched = jnp.ones((1, max(nf_kp + nf_view, 1)), jnp.float32)
    weights = F.flatten_weights(params, depth)
    kernel = make_variant_kernel(
        depth, skips, nf_kp, nf_view, skipsplit, bf16act, density_only,
        viewsplit=viewsplit, encode_only=encode_only, bf16enc=bf16enc,
        halves=halves, mxenc=mxenc,
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
    cases = [
        ("base", dict()),
        ("skipsplit", dict(skipsplit=True)),
        ("bf16act", dict(bf16act=True)),
        ("both", dict(skipsplit=True, bf16act=True)),
        ("viewsplit", dict(skipsplit=True, viewsplit=True)),
        ("bf16enc", dict(skipsplit=True, viewsplit=True, bf16enc=True)),
        ("pipe2", dict(skipsplit=True, viewsplit=True, bf16enc=True,
                       halves=2)),
        ("pipe4", dict(skipsplit=True, viewsplit=True, bf16enc=True,
                       halves=4)),
        ("mxenc", dict(skipsplit=True, viewsplit=True, mxenc=True)),
        ("dens_mxenc", dict(density_only=True, skipsplit=True, mxenc=True)),
        ("dens_base", dict(density_only=True, skipsplit=True)),
    ]
    for name, kw in cases:
        for tile in tiles:
            if ns % tile:
                continue
            if args.interpret:
                out = variant_field(
                    pts_t, dirs_t, rot, trn, cut, tau, codes, prepared,
                    tile=tile, interpret=True, **kw)
                out = np.asarray(out)
                if ref is None:
                    ref = out
                err = float(np.max(np.abs(out - ref)))
                print(f"{name:10s} tile={tile:5d}: interpret max|d|={err:.2e}")
                continue
            f = lambda s: jnp.sum(variant_field(
                pts_t + s, dirs_t, rot, trn, cut, tau, codes, prepared,
                tile=tile, **kw))
            jf = jax.jit(lambda: jax.lax.fori_loop(
                0, k, lambda i, c: c + 1e-20 * f(c), 0.0))
            try:
                v = jf()
                jax.block_until_ready(v)
            except Exception as e:
                print(f"{name:10s} tile={tile:5d}: FAILED {type(e).__name__}: {e}")
                continue
            t0 = time.perf_counter()
            v = jf()
            jax.block_until_ready(v)
            dt = (time.perf_counter() - t0) / k * 1e3
            if name.startswith("enc") or name.startswith("dens"):
                print(f"{name:10s} tile={tile:5d}: {dt:7.3f} ms  (probe)")
                continue
            # numeric check vs base @ first tile
            out = variant_field(pts_t, dirs_t, rot, trn, cut, tau, codes,
                                prepared, tile=tile, **kw)
            out = np.asarray(out)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            print(f"{name:10s} tile={tile:5d}: {dt:7.3f} ms  "
                  f"({ns / dt / 1e3:.1f} Mpts/s)  max|d|={err:.2e}")


if __name__ == "__main__":
    main()
