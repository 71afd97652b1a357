"""Trainable fused field: custom-VJP Pallas forward + backward kernels.

Training (without pose refinement) needs gradients ONLY for the MLP
weights: rays/points are data, the cutoff table and tau are scheduled
buffers. That makes the backward pass a pure dense-layer backprop whose
activations can be RECOMPUTED in VMEM — so the backward kernel, like the
forward one, touches HBM only for the (3, P) inputs, the (4, P) output
cotangent and the weight tensors. Weight gradients accumulate across the
sequential grid in revisited output blocks (init at step 0, += after).

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

from posegen_tpu.kernels.field import (
    FusedFieldParams,
    encode_channels,
    fused_field,
    grouped_specs,
    mm_t,
)

TRAIN_TILE = 256


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


def _field_bwd_kernel(
    depth: int,
    skips: Tuple[int, ...],
    code_ch: int,
    pts_ref, dirs_ref, rot_ref, trn_ref, cut_ref, tau_ref, code_ref,
    *refs,
):
    n_w = 2 * depth + 8
    wrefs = refs[:n_w]
    g_ref = refs[n_w]  # (4, P) output cotangent
    outs = refs[n_w + 1:]  # gradient refs: weights..., then d_codes

    e_pts, e_view = encode_channels(
        pts_ref, dirs_ref, rot_ref[0], trn_ref[0], cut_ref, tau_ref
    )

    # ---- forward recompute, keeping activations -----------------------------
    pre = []  # pre-ReLU activations of trunk layers
    inputs = []  # input to each trunk layer
    h = e_pts
    for i in range(depth):
        inputs.append(h)
        z = mm_t(wrefs[2 * i][:, :], h) + wrefs[2 * i + 1][:, :]
        pre.append(z)
        h = jnp.maximum(z, 0.0)
        if i in skips:
            h = jnp.concatenate([e_pts, h], axis=0)
    k = 2 * depth
    feat = mm_t(wrefs[k + 2][:, :], h) + wrefs[k + 3][:, :]
    parts = [feat, e_view]
    if code_ch > 0:
        row = code_ref[pl.program_id(0)]
        parts.append(
            jnp.broadcast_to(row[:, None], (code_ch, e_pts.shape[1]))
        )
    hv_in = jnp.concatenate(parts, axis=0)  # (904 + code_ch, P)
    zv = mm_t(wrefs[k + 4][:, :], hv_in) + wrefs[k + 5][:, :]
    hv = jnp.maximum(zv, 0.0)  # (128, P)

    # ---- backward ------------------------------------------------------------
    first = (pl.program_id(0) + pl.program_id(1)) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:, :] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:, :] = ref[:, :] + val

    g_rgb = g_ref[0:3, :]
    g_alpha = g_ref[3:4, :]

    # rgb head
    acc(outs[k + 6], _mm_nt(g_rgb, hv))
    acc(outs[k + 7], jnp.sum(g_rgb, axis=1, keepdims=True))
    g_hv = _mm_tn(wrefs[k + 6][:, :], g_rgb)  # (128, P)
    g_zv = jnp.where(zv > 0.0, g_hv, 0.0)
    # view layer
    acc(outs[k + 4], _mm_nt(g_zv, hv_in))
    acc(outs[k + 5], jnp.sum(g_zv, axis=1, keepdims=True))
    g_hv_in = _mm_tn(wrefs[k + 4][:, :], g_zv)  # (904 + code_ch, P)
    g_feat = g_hv_in[0:256, :]
    if code_ch > 0:
        # code gradients: full (G, C) output block; zero once at the global
        # first grid step (TPU grids iterate sequentially), then every step
        # adds its tile's contribution to its group's row
        g_code = jnp.sum(g_hv_in[904 : 904 + code_ch, :], axis=1)[None, :]
        gid = pl.program_id(0)
        global_first = (pl.program_id(0) + pl.program_id(1)) == 0

        @pl.when(global_first)
        def _():
            outs[-1][:, :] = jnp.zeros_like(outs[-1])

        outs[-1][pl.ds(gid, 1), :] = outs[-1][pl.ds(gid, 1), :] + g_code
    # feature + alpha heads (both consume the trunk output h)
    acc(outs[k + 2], _mm_nt(g_feat, h))
    acc(outs[k + 3], jnp.sum(g_feat, axis=1, keepdims=True))
    acc(outs[k], _mm_nt(g_alpha, h))
    acc(outs[k + 1], jnp.sum(g_alpha, axis=1, keepdims=True))
    g_h = _mm_tn(wrefs[k + 2][:, :], g_feat) + _mm_tn(wrefs[k][:, :], g_alpha)

    # trunk, reversed (skip layers split their cotangent)
    for i in reversed(range(depth)):
        if i in skips:
            # forward did h = concat(e_pts, relu(z)); only the relu part
            # carries gradient back through this layer
            g_h = g_h[e_pts.shape[0]:, :]
        g_z = jnp.where(pre[i] > 0.0, g_h, 0.0)
        acc(outs[2 * i], _mm_nt(g_z, inputs[i]))
        acc(outs[2 * i + 1], jnp.sum(g_z, axis=1, keepdims=True))
        if i > 0:
            g_h = _mm_tn(wrefs[2 * i][:, :], g_z)


def make_trainable_field(
    depth: int = 8,
    skips: Tuple[int, ...] = (4,),
    tile: int = TRAIN_TILE,
    interpret: bool = False,
    code_ch: int = 0,
):
    """-> f(pts_t, dirs_t, rot, trn, cut, tau, codes, params) with custom VJP.

    params: FusedFieldParams of f32 tensors. Rays/skts/buffers get zero
    cotangents; weights AND per-group framecodes get real gradients (the
    framecode table outside differentiates through the gather).
    """

    def fwd_only(pts_t, dirs_t, rot, trn, cut, tau, codes, params):
        return fused_field(
            pts_t, dirs_t, rot, trn, cut, tau, codes, params,
            depth=depth, skips=skips, interpret=interpret, tile=tile,
            code_ch=code_ch,
        )

    @jax.custom_vjp
    def f(pts_t, dirs_t, rot, trn, cut, tau, codes, params):
        return fwd_only(pts_t, dirs_t, rot, trn, cut, tau, codes, params)

    def f_fwd(pts_t, dirs_t, rot, trn, cut, tau, codes, params):
        out = fwd_only(pts_t, dirs_t, rot, trn, cut, tau, codes, params)
        return out, (pts_t, dirs_t, rot, trn, cut, tau, codes, params)

    def f_bwd(res, g):
        pts_t, dirs_t, rot, trn, cut, tau, codes, params = res
        ns = pts_t.shape[1]
        weights = _flatten_params(params, depth)

        kernel = functools.partial(_field_bwd_kernel, depth, skips, code_ch)
        grid, in_specs, g_spec, full = grouped_specs(
            ns, rot.shape[0], tile, rot, trn, cut, codes, weights
        )
        in_specs = in_specs + [g_spec]  # output cotangent tiles like points
        out_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        out_specs = [full(w) for w in weights]
        if code_ch > 0:
            out_shapes.append(jax.ShapeDtypeStruct(codes.shape, jnp.float32))
            out_specs.append(full(codes))

        flops_per_pt = 3 * 2 * (
            432 * 256 + 6 * 256 * 256 + 688 * 256 + 256 * 256 + 904 * 128
        )
        grads = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            cost_estimate=pl.CostEstimate(
                flops=flops_per_pt * ns,
                bytes_accessed=(3 + 3 + 4) * 4 * ns + 8_000_000,
                transcendentals=(24 * 15 + 72 * 8) * ns,
            ),
            interpret=interpret,
        )(pts_t, dirs_t, rot, trn, cut, tau, codes, *weights, g)

        grads = list(grads)
        d_codes = grads.pop() if code_ch > 0 else jnp.zeros_like(codes)
        d_params = _unflatten_params(grads, depth)
        zeros = lambda a: jnp.zeros_like(a)
        return (
            zeros(pts_t), zeros(dirs_t), zeros(rot), zeros(trn),
            zeros(cut), zeros(tau), d_codes, d_params,
        )

    f.defvjp(f_fwd, f_bwd)
    return f
