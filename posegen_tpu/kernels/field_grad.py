"""Trainable fused field: custom-VJP Pallas forward + backward kernels.

Training (without pose refinement) needs gradients ONLY for the MLP
weights: rays/points are data, the cutoff table and tau are scheduled
buffers. That makes the backward pass a pure dense-layer backprop whose
activations can be RECOMPUTED in VMEM — so the backward kernel, like the
forward one, touches HBM only for the (3, P) inputs, the (4, P) output
cotangent and the weight tensors. Weight gradients accumulate across the
sequential grid in revisited output blocks (init at step 0, += after);
Mosaic keeps those constant-index blocks VMEM-resident, so the += is not
HBM traffic (verified by a neutral VMEM-scratch A/B — see pick_train_tile).

The XLA autodiff path moves ~3x the forward's ~53 GB per batch; this pair
keeps the whole train-step field evaluation compute-bound.

Usage: `make_trainable_field(depth, skips)` -> f(pts_t, dirs_t, rot, trn,
cut, tau, params) with params a FusedFieldParams of FLOAT32 tensors
(prepare_params(..., dtype=float32)); cotangents come back as the same
pytree in f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jax.experimental.pallas import tpu as pltpu

from posegen_tpu.kernels.field import (
    N_JOINTS,
    NF_KP,
    NF_VIEW,
    FusedFieldParams,
    encode_intermediates,
    fused_field,
    grouped_specs,
    kp_ch,
    mm_t,
    view_ch,
)

TRAIN_TILE = 256  # minimum training tile
MAX_TRAIN_TILE = 1024

# Stash the bf16 encodings (e_pts/e_view) in the forward kernel and STREAM
# them back in the backward kernel instead of recomputing the encode there
# (~2 KB/pt of pipelined HBM traffic replaces the backward's VPU encode).
# Measured on-chip: ~2% faster on the grouped flagship step (19.6 vs
# 20.0 ms at N_rand 3072 / 64 groups), neutral single-group — the encode
# recompute largely hides behind the backward's matmuls, so the win is
# modest; kept because gradients are bit-identical (every consumer of
# e_pts/e_view is a matmul that casts to bf16 anyway) and the stash also
# removes all transcendentals from the backward. Only the weights-only
# path (input_grads=False) qualifies — the pose-opt backward needs the
# full encode intermediates for its input cotangents.
STASH_BWD = True


def pick_train_tile(rpi: int, s: int, g: int):
    """-> (tile, padded rays-per-group) for the trainable kernels.

    The backward kernel's cost has a strong per-grid-step term: measured
    60.2 -> 15.3 ms/step going tile 256 -> 1024 at N_rand 2048. An A/B
    with VMEM-scratch gradient accumulation (spilling to HBM once, at the
    last grid step) measured NEUTRAL at every tile (31.0 vs 31.5 ms at
    tile 256) — so the term is NOT weight-gradient HBM read-modify-write
    (Mosaic already holds the constant-index output blocks VMEM-resident);
    it is the skinnier per-step matmuls plus fixed grid-step overhead.
    Either way the fitted cost model below matches the sweep. Grouped
    batches must keep each tile inside one pose group, so rays are padded
    per group to make the per-group point count tile-divisible; choose the
    candidate minimizing modeled cost =
    padded_points * (1 + K * 256 / tile)."""
    import math

    if g == 1:
        return MAX_TRAIN_TILE, rpi  # flat padding handles divisibility
    best = None
    K = 3.0  # fitted from the measured 256-vs-1024 sweep
    # every multiple of 128 is lane-aligned; non-power-of-two tiles often
    # divide s * rpi exactly (e.g. 768 = 48 rays x 16 at the flagship
    # s = 80 shape -> zero ray padding; 640 = 8 rays x 80 exactly)
    for t in range(MAX_TRAIN_TILE, TRAIN_TILE - 1, -128):
        step = t // math.gcd(s, t)
        rpi_p = -(-rpi // step) * step
        cost = rpi_p * (1.0 + K * 256.0 / t)
        if best is None or cost < best[0]:
            best = (cost, t, rpi_p)
    return best[1], best[2]


def _flatten_params(params: FusedFieldParams, depth: int):
    ws = []
    for i in range(depth):
        ws.extend([params.w_pts[i], params.b_pts[i]])
    ws.extend([
        params.w_alpha, params.b_alpha, params.w_feat, params.b_feat,
        params.w_view, params.b_view, params.w_rgb, params.b_rgb,
    ])
    return ws


def _unflatten_params(ws, depth: int) -> FusedFieldParams:
    return FusedFieldParams(
        w_pts=tuple(ws[2 * i] for i in range(depth)),
        b_pts=tuple(ws[2 * i + 1] for i in range(depth)),
        w_alpha=ws[2 * depth], b_alpha=ws[2 * depth + 1],
        w_feat=ws[2 * depth + 2], b_feat=ws[2 * depth + 3],
        w_view=ws[2 * depth + 4], b_view=ws[2 * depth + 5],
        w_rgb=ws[2 * depth + 6], b_rgb=ws[2 * depth + 7],
    )


def _mm_nt(a, b):
    """(C_out, P) @ (C_in, P)^T -> (C_out, C_in), bf16 MXU, f32 accum."""
    import posegen_tpu.kernels.field as _field

    return jax.lax.dot_general(
        a.astype(_field.MM_DTYPE),
        b.astype(_field.MM_DTYPE),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_tn(w, g):
    """(C_out, C_in)^T @ (C_out, P) -> (C_in, P)."""
    import posegen_tpu.kernels.field as _field

    return jax.lax.dot_general(
        w.astype(_field.MM_DTYPE),
        g.astype(_field.MM_DTYPE),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _encode_backward(it, rot, tau, g_e_pts, g_e_view,
                     nf_kp: int = NF_KP, nf_view: int = NF_VIEW):
    """Cotangents of the fused encoding back to its inputs.

    it: encode_intermediates dict (kernel channel order). rot: (24, 9).
    g_e_pts (pts_ch, P) / g_e_view (view_ch, P): encoding cotangents.
    BARF octave weights (it['sw_kp'/'sw_view']) scale the octave cotangents
    exactly as they scaled the forward rows.
    Returns (g_pts (3,P), g_dirs (3,P), g_rot (24,9), g_trn (24,3)) — the
    input gradients that let pose-opt training (reference core/pose_opt.py:
    372-445: loss -> compositor -> encodings -> skts -> FK -> pose params)
    run fused.
    """
    NJ = N_JOINTS
    KC = kp_ch(nf_kp)
    v, w, sig, inv_v = it["v"], it["w"], it["sig"], it["inv_v"]
    XT, YT, ZT = it["XT"], it["YT"], it["ZT"]
    DX, DY, DZ = it["DX"], it["DY"], it["DZ"]
    dn_inv = it["dn_inv"]
    dn = (it["dnx"], it["dny"], it["dnz"])
    sw_kp, sw_view = it["sw_kp"], it["sw_view"]

    # ---- kp PE block: rows [v*w | sin(v f)*w*sw, cos(v f)*w*sw per octave] --
    G0 = g_e_pts[0:NJ]
    g_v = G0 * w
    g_w = G0 * v
    s_, c_ = jnp.sin(v), jnp.cos(v)  # double-angle ladder (see field.py)
    for f_idx in range(nf_kp):
        f = 2.0**f_idx
        Gs = g_e_pts[NJ * (1 + 2 * f_idx) : NJ * (2 + 2 * f_idx)] * sw_kp[f_idx]
        Gc = g_e_pts[NJ * (2 + 2 * f_idx) : NJ * (3 + 2 * f_idx)] * sw_kp[f_idx]
        g_v += (Gs * c_ - Gc * s_) * (f * w)
        g_w += Gs * s_ + Gc * c_
        if f_idx + 1 < nf_kp:
            s_, c_ = 2.0 * s_ * c_, 1.0 - 2.0 * s_ * s_

    # ---- reldir rows: XT*inv_v | YT*inv_v | ZT*inv_v ------------------------
    Gdx = g_e_pts[KC : KC + NJ]
    Gdy = g_e_pts[KC + NJ : KC + 2 * NJ]
    Gdz = g_e_pts[KC + 2 * NJ : KC + 3 * NJ]
    g_XT = Gdx * inv_v
    g_YT = Gdy * inv_v
    g_ZT = Gdz * inv_v
    g_inv = Gdx * XT + Gdy * YT + Gdz * ZT
    # inv_v = 1/max(v, eps): zero slope in the clamp region
    g_v += -(g_inv * inv_v * inv_v) * (v > 1e-12)

    # ---- view rows: [dn*w | per f: sin(dn f)*w x3, cos(dn f)*w x3] ----------
    g_dn = []
    for c in range(3):
        H0 = g_e_view[c * NJ : (c + 1) * NJ]
        g_dn.append(H0 * w)
        g_w += H0 * dn[c]
    scv = [(jnp.sin(dn[c]), jnp.cos(dn[c])) for c in range(3)]
    for f_idx in range(nf_view):
        f = 2.0**f_idx
        base = 3 * NJ + f_idx * 6 * NJ
        for c in range(3):
            Hs = g_e_view[base + c * NJ : base + (c + 1) * NJ] * sw_view[f_idx]
            Hc = g_e_view[base + (3 + c) * NJ : base + (4 + c) * NJ] * sw_view[f_idx]
            sq, cq = scv[c]
            g_dn[c] += (Hs * cq - Hc * sq) * (f * w)
            g_w += Hs * sq + Hc * cq
        if f_idx + 1 < nf_view:
            scv = [(2.0 * sq * cq, 1.0 - 2.0 * sq * sq) for sq, cq in scv]

    # ---- gate: w = 1 - sigmoid(tau (v - cut)) -------------------------------
    g_v += g_w * (-tau * sig * (1.0 - sig))
    # ---- v = |(XT, YT, ZT)| --------------------------------------------------
    g_XT += g_v * XT * inv_v
    g_YT += g_v * YT * inv_v
    g_ZT += g_v * ZT * inv_v
    # ---- dn = D * rsqrt(|D|^2) ------------------------------------------------
    dot = g_dn[0] * DX + g_dn[1] * DY + g_dn[2] * DZ
    k3 = dn_inv * dn_inv * dn_inv
    g_DX = g_dn[0] * dn_inv - DX * k3 * dot
    g_DY = g_dn[1] * dn_inv - DY * k3 * dot
    g_DZ = g_dn[2] * dn_inv - DZ * k3 * dot

    # ---- local frames: XT_j = R_j[0:3]·p + t_j0 etc. --------------------------
    R = rot
    gcol = lambda c0, c1, c2: jnp.sum(
        R[:, c0][:, None] * g_XT + R[:, c1][:, None] * g_YT + R[:, c2][:, None] * g_ZT,
        axis=0, keepdims=True,
    )
    gcol_d = lambda c0, c1, c2: jnp.sum(
        R[:, c0][:, None] * g_DX + R[:, c1][:, None] * g_DY + R[:, c2][:, None] * g_DZ,
        axis=0, keepdims=True,
    )
    g_pts = jnp.concatenate([gcol(0, 3, 6), gcol(1, 4, 7), gcol(2, 5, 8)], axis=0)
    g_dirs = jnp.concatenate([gcol_d(0, 3, 6), gcol_d(1, 4, 7), gcol_d(2, 5, 8)], axis=0)

    x, y, z = it["x"], it["y"], it["z"]
    dx, dy, dz = it["dx"], it["dy"], it["dz"]
    col = lambda gq, c: jnp.sum(gq * c, axis=1)[:, None]  # (24, 1)
    g_rot = jnp.concatenate(
        [
            col(g_XT, x) + col(g_DX, dx), col(g_XT, y) + col(g_DX, dy), col(g_XT, z) + col(g_DX, dz),
            col(g_YT, x) + col(g_DY, dx), col(g_YT, y) + col(g_DY, dy), col(g_YT, z) + col(g_DY, dz),
            col(g_ZT, x) + col(g_DZ, dx), col(g_ZT, y) + col(g_DZ, dy), col(g_ZT, z) + col(g_DZ, dz),
        ],
        axis=1,
    )  # (24, 9)
    g_trn = jnp.concatenate(
        [jnp.sum(g_XT, 1)[:, None], jnp.sum(g_YT, 1)[:, None], jnp.sum(g_ZT, 1)[:, None]],
        axis=1,
    )  # (24, 3)
    return g_pts, g_dirs, g_rot, g_trn


def _field_fwd_stash_kernel(
    depth: int,
    skips: Tuple[int, ...],
    code_ch: int,
    nf_kp: int,
    nf_view: int,
    freq_sched: bool,
    pts_ref, dirs_ref, rot_ref, trn_ref, cut_ref, tau_ref, sched_ref,
    code_ref,
    *refs,
):
    """Trainable forward that ALSO writes the bf16 encodings to HBM.

    Trunk math IS field._mlp_heads — the single in-kernel MLP
    implementation — so the primal output matches fused_field exactly by
    construction; the extra (pc, P) / (vc, P) bf16 output tiles feed the
    stashed backward."""
    from posegen_tpu.kernels.field import _mlp_heads, encode_channels

    n_w = 2 * depth + 8
    wrefs = refs[:n_w]
    out_ref, ep_ref, ev_ref = refs[n_w:]

    e_pts, e_view = encode_channels(
        pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref, tau_ref,
        with_view=True, nf_kp=nf_kp, nf_view=nf_view,
        sched_ref=sched_ref if freq_sched else None,
    )
    # stash dtype = the MXU operand dtype (bf16; f32 in tests' exactness
    # mode) — every later consumer casts to it anyway
    ep_ref[:, :] = e_pts.astype(ep_ref.dtype)
    ev_ref[:, :] = e_view.astype(ev_ref.dtype)

    out_ref[:, :] = _mlp_heads(
        wrefs, e_pts, e_view, code_ref, depth, skips, code_ch,
        density_only=False,
    )


def fused_field_stash(
    pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params,
    depth: int, skips: Tuple[int, ...], tile: int, code_ch: int,
    nf_kp: int, nf_view: int, freq_sched: bool, interpret: bool = False,
):
    """-> (raw (4, NS) f32, e_pts (pc, NS), e_view (vc, NS)) with the
    stashes in the MXU operand dtype (field.MM_DTYPE)."""
    import posegen_tpu.kernels.field as _field
    from posegen_tpu.kernels.field import pts_ch

    sdtype = _field.MM_DTYPE
    ns = pts_t.shape[1]
    n_groups = rot.shape[0]
    weights = _flatten_params(params, depth)
    kernel = functools.partial(
        _field_fwd_stash_kernel, depth, skips, code_ch,
        nf_kp, nf_view, freq_sched,
    )
    grid, in_specs, out_spec, _ = grouped_specs(
        ns, n_groups, tile, rot, trn, cut, sched, codes, weights
    )
    pc, vc = pts_ch(nf_kp), view_ch(nf_view)
    tpg = ns // n_groups // tile
    ch_spec = lambda c: pl.BlockSpec(
        (c, tile), lambda g_, j: (0, g_ * tpg + j), memory_space=pltpu.VMEM
    )
    flops_per_pt = 2 * (
        pc * 256 + 6 * 256 * 256 + (pc + 256) * 256 + 256 * 256 + 256
        + (256 + vc + code_ch) * 128 + 3 * 128
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((4, ns), jnp.float32),
            jax.ShapeDtypeStruct((pc, ns), sdtype),
            jax.ShapeDtypeStruct((vc, ns), sdtype),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, ch_spec(pc), ch_spec(vc)],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * ns,
            bytes_accessed=(3 + 3 + 4) * 4 * ns + (pc + vc) * 2 * ns + 2_000_000,
            transcendentals=(24 * 3 + 72 * 2) * ns,
        ),
        interpret=interpret,
    )(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, *weights)


def _field_bwd_kernel(
    depth: int,
    skips: Tuple[int, ...],
    code_ch: int,
    input_grads: bool,
    nf_kp: int,
    nf_view: int,
    freq_sched: bool,
    stash: bool,
    pts_ref, dirs_ref, rot_ref, trn_ref, cut_ref, tau_ref, sched_ref,
    code_ref,
    *refs,
):
    n_w = 2 * depth + 8
    wrefs = refs[:n_w]
    g_ref = refs[n_w]  # (4, P) output cotangent
    if stash:
        # stashed bf16 encodings streamed from HBM (overlapped with the MXU
        # by the Pallas pipeline) — no VPU encode recompute. Consumers are
        # all matmuls that cast to bf16, so gradients are bit-identical to
        # the recompute path.
        e_pts = refs[n_w + 1][:, :]
        e_view = refs[n_w + 2][:, :]
        outs = refs[n_w + 3:]
    else:
        outs = refs[n_w + 1:]
    # gradient refs: weights..., then [d_codes], then [d_pts, d_dirs, d_rot, d_trn]

    if not stash:
        it = encode_intermediates(
            pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref, tau_ref,
            nf_kp=nf_kp, nf_view=nf_view,
            sched_ref=sched_ref if freq_sched else None,
        )
        e_pts, e_view = it["e_pts"], it["e_view"]

    # ---- forward recompute, keeping activations -----------------------------
    # Skip-concat is deferred exactly as in the eval kernel (field.py
    # _field_kernel): the consumer layer runs two matmuls on [:, :pc] /
    # [:, pc:] weight-column slices instead of materializing the
    # (pc + 256, P) concat; the backward then splits weight grads and
    # cotangents along the same columns. Only the (rare) skip-at-last-layer
    # shape keeps the concat (use_split False), since the heads would
    # otherwise consume a split pair.
    pc = e_pts.shape[0]
    use_split = all(s < depth - 1 for s in skips)
    pre = []  # pre-ReLU activations of trunk layers
    inputs = []  # input to each trunk layer; ("split", h_part) after a skip
    h = e_pts
    split_next = False
    for i in range(depth):
        w, b = wrefs[2 * i], wrefs[2 * i + 1]
        if split_next:
            inputs.append(("split", h))
            z = mm_t(w[:, :pc], e_pts) + mm_t(w[:, pc:], h) + b[:, :]
            split_next = False
        else:
            inputs.append(h)
            z = mm_t(w[:, :], h) + b[:, :]
        pre.append(z)
        h = jnp.maximum(z, 0.0)
        if i in skips:
            if use_split:
                split_next = True
            else:
                h = jnp.concatenate([e_pts, h], axis=0)
    k = 2 * depth
    feat = mm_t(wrefs[k + 2][:, :], h) + wrefs[k + 3][:, :]
    # view head: [feat | e_view | code] never materialized (field.py)
    wv = wrefs[k + 4]
    vc = e_view.shape[0]
    zv = mm_t(wv[:, :256], feat) + mm_t(wv[:, 256:256 + vc], e_view)
    if code_ch > 0:
        row = code_ref[pl.program_id(0)]
        zv = zv + mm_t(wv[:, 256 + vc:], row[:, None])
    zv = zv + wrefs[k + 5][:, :]
    hv = jnp.maximum(zv, 0.0)  # (128, P)

    # ---- backward ------------------------------------------------------------
    first = (pl.program_id(0) + pl.program_id(1)) == 0

    def acc(ref, val, cols=None):
        sl = slice(None) if cols is None else cols

        @pl.when(first)
        def _():
            ref[:, sl] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:, sl] = ref[:, sl] + val

    g_rgb = g_ref[0:3, :]
    g_alpha = g_ref[3:4, :]

    # rgb head
    acc(outs[k + 6], _mm_nt(g_rgb, hv))
    acc(outs[k + 7], jnp.sum(g_rgb, axis=1, keepdims=True))
    g_hv = _mm_tn(wrefs[k + 6][:, :], g_rgb)  # (128, P)
    g_zv = jnp.where(zv > 0.0, g_hv, 0.0)
    # view layer: weight grads per segment, matching the split forward
    acc(outs[k + 4], _mm_nt(g_zv, feat), cols=slice(0, 256))
    acc(outs[k + 4], _mm_nt(g_zv, e_view), cols=slice(256, 256 + vc))
    g_zv_sum = jnp.sum(g_zv, axis=1, keepdims=True)  # (128, 1)
    if code_ch > 0:
        # code-column weight grad: the code input is constant across the
        # tile, so g_zv @ code_col^T collapses to an outer product
        acc(outs[k + 4], g_zv_sum * jnp.reshape(row, (1, code_ch)),
            cols=slice(256 + vc, 256 + vc + code_ch))
    acc(outs[k + 5], g_zv_sum)
    g_feat = _mm_tn(wv[:, :256], g_zv)  # (256, P)
    if code_ch > 0:
        # code gradients: full (G, C) output block; zero once at the global
        # first grid step (TPU grids iterate sequentially), then every step
        # adds its tile's contribution to its group's row. The d_codes ref
        # sits right after the weight-grad refs — NOT at outs[-1], which is
        # d_trn when input_grads is on (latent until the pose-opt +
        # framecode + grouped combination started running fused).
        d_code_ref = outs[n_w]
        # dL/d(code_c) = sum_o wv[o, cb+c] * sum_p g_zv[o, p]
        g_code = _mm_tn(wv[:, 256 + vc:], g_zv_sum).T  # (1, code_ch)
        gid = pl.program_id(0)
        global_first = (pl.program_id(0) + pl.program_id(1)) == 0

        @pl.when(global_first)
        def _():
            d_code_ref[:, :] = jnp.zeros_like(d_code_ref)

        d_code_ref[pl.ds(gid, 1), :] = d_code_ref[pl.ds(gid, 1), :] + g_code
    # feature + alpha heads (both consume the trunk output h)
    acc(outs[k + 2], _mm_nt(g_feat, h))
    acc(outs[k + 3], jnp.sum(g_feat, axis=1, keepdims=True))
    acc(outs[k], _mm_nt(g_alpha, h))
    acc(outs[k + 1], jnp.sum(g_alpha, axis=1, keepdims=True))
    g_h = _mm_tn(wrefs[k + 2][:, :], g_feat) + _mm_tn(wrefs[k][:, :], g_alpha)

    # trunk, reversed (skip layers split their cotangent)
    g_e_pts = None
    for i in reversed(range(depth)):
        if (i in skips) and not use_split:
            # legacy concat shape: forward did h = concat(e_pts, relu(z));
            # the e_pts part feeds the input cotangent, the relu part
            # continues down the trunk
            if input_grads:
                part = g_h[:pc, :]
                g_e_pts = part if g_e_pts is None else g_e_pts + part
            g_h = g_h[pc:, :]
        g_z = jnp.where(pre[i] > 0.0, g_h, 0.0)
        inp = inputs[i]
        if isinstance(inp, tuple):  # split skip-consumer: input [e_pts | h]
            acc(outs[2 * i], _mm_nt(g_z, e_pts), cols=slice(0, pc))
            acc(outs[2 * i], _mm_nt(g_z, inp[1]), cols=slice(pc, None))
            acc(outs[2 * i + 1], jnp.sum(g_z, axis=1, keepdims=True))
            if input_grads:
                part = _mm_tn(wrefs[2 * i][:, :pc], g_z)
                g_e_pts = part if g_e_pts is None else g_e_pts + part
            g_h = _mm_tn(wrefs[2 * i][:, pc:], g_z)
        else:
            acc(outs[2 * i], _mm_nt(g_z, inp))
            acc(outs[2 * i + 1], jnp.sum(g_z, axis=1, keepdims=True))
            if i > 0:
                g_h = _mm_tn(wrefs[2 * i][:, :], g_z)
            elif input_grads:
                part = _mm_tn(wrefs[0][:, :], g_z)
                g_e_pts = part if g_e_pts is None else g_e_pts + part

    if input_grads:
        g_e_view = _mm_tn(wv[:, 256:256 + vc], g_zv)
        g_pts, g_dirs, g_rot, g_trn = _encode_backward(
            it, rot_ref[0], tau_ref[0, 0], g_e_pts, g_e_view,
            nf_kp=nf_kp, nf_view=nf_view,
        )
        d_pts_ref, d_dirs_ref, d_rot_ref, d_trn_ref = outs[-4:]
        d_pts_ref[:, :] = g_pts
        d_dirs_ref[:, :] = g_dirs
        # per-group accumulators: init on the group's first tile
        first_in_group = pl.program_id(1) == 0

        @pl.when(first_in_group)
        def _():
            d_rot_ref[0, :, :] = g_rot
            d_trn_ref[0, :, :] = g_trn

        @pl.when(jnp.logical_not(first_in_group))
        def _():
            d_rot_ref[0, :, :] = d_rot_ref[0, :, :] + g_rot
            d_trn_ref[0, :, :] = d_trn_ref[0, :, :] + g_trn


def make_trainable_field(
    depth: int = 8,
    skips: Tuple[int, ...] = (4,),
    tile: int = TRAIN_TILE,
    interpret: bool = False,
    code_ch: int = 0,
    input_grads: bool = False,
    nf_kp: int = NF_KP,
    nf_view: int = NF_VIEW,
    freq_sched: bool = False,
    stash: bool = False,
):
    """-> f(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params) with
    custom VJP.

    params: FusedFieldParams of f32 tensors. Weights AND per-group
    framecodes always get real gradients (the framecode table outside
    differentiates through the gather). With input_grads=True the backward
    kernel additionally emits d_pts_t/d_dirs_t/d_rot/d_trn so pose-opt
    training (gradients into skts -> FK -> pose params, reference
    core/pose_opt.py:372-445) runs fused; otherwise those come back zero
    (rays are data, skts fixed).

    stash=True (weights-only path): the forward writes the bf16 encodings
    to HBM and the backward streams them back instead of recomputing the
    in-kernel encode (see STASH_BWD)."""
    if stash and input_grads:
        raise ValueError("stash requires the weights-only backward "
                         "(input_grads=False): the pose-opt input "
                         "cotangents need the full encode intermediates")

    def fwd_only(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params):
        return fused_field(
            pts_t, dirs_t, rot, trn, cut, tau, codes, params,
            depth=depth, skips=skips, interpret=interpret, tile=tile,
            code_ch=code_ch, nf_kp=nf_kp, nf_view=nf_view,
            freq_sched=freq_sched, sched=sched,
        )

    @jax.custom_vjp
    def f(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params):
        return fwd_only(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params)

    def f_fwd(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params):
        if stash:
            out, e_p, e_v = fused_field_stash(
                pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params,
                depth=depth, skips=skips, tile=tile, code_ch=code_ch,
                nf_kp=nf_kp, nf_view=nf_view, freq_sched=freq_sched,
                interpret=interpret,
            )
            return out, (pts_t, dirs_t, rot, trn, cut, tau, sched, codes,
                         params, e_p, e_v)
        out = fwd_only(pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params)
        return out, (pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params)

    def f_bwd(res, g):
        if stash:
            (pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params,
             e_p, e_v) = res
        else:
            pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params = res
            e_p = e_v = None
        d_params, d_codes, d_pts, d_dirs, d_rot, d_trn = field_backward(
            pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params, g,
            depth=depth, skips=skips, tile=tile, code_ch=code_ch,
            input_grads=input_grads, nf_kp=nf_kp, nf_view=nf_view,
            freq_sched=freq_sched, stash=stash, e_p=e_p, e_v=e_v,
            interpret=interpret,
        )
        zeros = lambda a: jnp.zeros_like(a)
        if not input_grads:
            d_pts, d_dirs = zeros(pts_t), zeros(dirs_t)
            d_rot, d_trn = zeros(rot), zeros(trn)
        if d_codes is None:
            d_codes = jnp.zeros_like(codes)
        return (
            d_pts, d_dirs, d_rot, d_trn,
            zeros(cut), zeros(tau), zeros(sched), d_codes, d_params,
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def field_backward(
    pts_t, dirs_t, rot, trn, cut, tau, sched, codes, params, g,
    *, depth: int, skips: Tuple[int, ...], tile: int, code_ch: int,
    input_grads: bool, nf_kp: int, nf_view: int, freq_sched: bool,
    stash: bool, e_p=None, e_v=None, interpret: bool = False,
):
    """One backward-kernel invocation for one net.

    g is the (4, NS) output cotangent. Returns (d_params, d_codes,
    d_pts, d_dirs, d_rot, d_trn); d_codes is None when code_ch == 0 and
    the input gradients are None when input_grads is False. Shared by the
    single-net VJP (make_trainable_field) and the dual-net train VJP
    (make_trainable_dual_field), which runs it once per net over the same
    point set."""
    ns = pts_t.shape[1]
    n_groups = rot.shape[0]
    weights = _flatten_params(params, depth)

    kernel = functools.partial(
        _field_bwd_kernel, depth, skips, code_ch, input_grads,
        nf_kp, nf_view, freq_sched, stash,
    )
    grid, in_specs, g_spec, full = grouped_specs(
        ns, n_groups, tile, rot, trn, cut, sched, codes, weights
    )
    in_specs = in_specs + [g_spec]  # output cotangent tiles like points
    if stash:
        tpg_s = ns // n_groups // tile
        ch_spec = lambda c: pl.BlockSpec(
            (c, tile), lambda g_, j: (0, g_ * tpg_s + j),
            memory_space=pltpu.VMEM,
        )
        in_specs = in_specs + [ch_spec(e_p.shape[0]), ch_spec(e_v.shape[0])]
    out_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    out_specs = [full(w) for w in weights]
    if code_ch > 0:
        out_shapes.append(jax.ShapeDtypeStruct(codes.shape, jnp.float32))
        out_specs.append(full(codes))
    if input_grads:
        tpg = ns // n_groups // tile
        pt_spec = lambda: pl.BlockSpec(
            (3, tile), lambda g_, j: (0, g_ * tpg + j), memory_space=pltpu.VMEM
        )
        out_shapes += [
            jax.ShapeDtypeStruct(pts_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(dirs_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(rot.shape, jnp.float32),
            jax.ShapeDtypeStruct(trn.shape, jnp.float32),
        ]
        out_specs += [
            pt_spec(),
            pt_spec(),
            pl.BlockSpec((1, 24, 9), lambda g_, j: (g_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, 3), lambda g_, j: (g_, 0, 0), memory_space=pltpu.VMEM),
        ]

    from posegen_tpu.kernels.field import pts_ch

    pc, vc = pts_ch(nf_kp), view_ch(nf_view)
    flops_per_pt = 3 * 2 * (
        pc * 256 + 6 * 256 * 256 + (pc + 256) * 256 + 256 * 256
        + (256 + vc + code_ch) * 128
    )
    operands = [pts_t, dirs_t, rot, trn, cut, tau, sched, codes,
                *weights, g]
    if stash:
        operands += [e_p, e_v]
    grads = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * ns,
            bytes_accessed=(3 + 3 + 4) * 4 * ns + 8_000_000
            + ((pc + vc) * 2 * ns if stash else 0),
            # stash streams the encodings instead of recomputing them
            transcendentals=0 if stash else (24 * 3 + 72 * 2) * ns,
        ),
        # input_grads adds per-point cotangent buffers: the backward
        # kernel's stack is ~22 MB at tile 768, over mosaic's 16 MB
        # default scoped-vmem limit (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)

    grads = list(grads)
    d_pts = d_dirs = d_rot = d_trn = None
    if input_grads:
        d_trn = grads.pop()
        d_rot = grads.pop()
        d_dirs = grads.pop()
        d_pts = grads.pop()
    d_codes = grads.pop() if code_ch > 0 else None
    d_params = _unflatten_params(grads, depth)
    return d_params, d_codes, d_pts, d_dirs, d_rot, d_trn
