"""On-chip bf16-vs-f32 quality delta (VERDICT r3 next-round item 4).

Renders ONE frame of a trained model three ways and reports pairwise PSNR:

  * fused  — the shipped Pallas kernel (bf16 MXU matmuls, f32 accumulation
             and compositing) on the chip;
  * xla32  — the f32 XLA pipeline on the same chip;
  * cpu32  — the f32 XLA pipeline on CPU (run separately with --cpu; the
             chip run then loads its saved frame for the cross-platform
             numbers).

SURVEY §7 flags f32 compositing as load-bearing for PSNR parity (reference
core/networks/nerf.py:150-205); this bounds what the bf16 MXU path costs on
a real frame.

Usage (chip):
  python tools/exp_bf16_delta.py --nerf_args logs/x/args.txt \
      --ckptpath logs/x/00001500.ckpt.npz --hw 512 --out /tmp/bf16ab
CPU anchor (before or after):
  JAX_PLATFORMS=cpu python tools/exp_bf16_delta.py ... --cpu --out /tmp/bf16ab
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def np_psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else -10.0 * np.log10(mse)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nerf_args", required=True)
    p.add_argument("--ckptpath", required=True)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--image_idx", type=int, default=0)
    p.add_argument("--out", default="/tmp/bf16ab")
    p.add_argument("--cpu", action="store_true",
                   help="render only the f32 CPU anchor frame")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import h5py
    import jax.numpy as jnp

    from posegen_tpu.cli.run_render import load_trained
    from posegen_tpu.data.catalog import DataConfig, resolve_h5_path
    from posegen_tpu.render.image import KEEP_MAPS, render_image
    from posegen_tpu.render.raycast import PoseCtx, render_rays

    targs, cfg, variables = load_trained(args.nerf_args, args.ckptpath)
    one = lambda v: v[0] if isinstance(v, (list, tuple)) else v
    h5path = resolve_h5_path(
        DataConfig(dataset=one(targs.dataset_type), subject=one(targs.subject),
                   data_root=one(targs.data_root))
    )
    with h5py.File(h5path, "r") as f:
        i = args.image_idx
        ki = int(f["kp_idxs"][i])
        ctx = PoseCtx(
            kps=jnp.asarray(f["kp3d"][ki : ki + 1]),
            skts=jnp.asarray(f["skts"][ki : ki + 1]),
            bones=jnp.asarray(f["bones"][ki : ki + 1]),
            cyls=jnp.asarray(f["cyls"][ki : ki + 1]),
        )
        c2w = np.asarray(f["c2ws"][i], np.float32)
        focal = float(f["focals"][i])
        src_h = f["imgs"].shape[1]

    H = W = args.hw
    focal = focal * H / src_h  # scale intrinsics with the render resolution

    def mk(fused):
        def fn(p, o, d, c):
            out = render_rays(
                cfg, p, o, d, c, perturb=0.0, raw_noise_std=0.0,
                eval_mean_code=c.cam_idxs is None, coarse_rgb=False,
                use_fused=fused,
            )
            return {k: out[k] for k in KEEP_MAPS}

        j = jax.jit(fn)
        return j

    os.makedirs(args.out, exist_ok=True)

    def run(tag, fused, chunk):
        fn = mk(fused)
        t0 = time.time()
        out = render_image(
            cfg, variables, H, W, focal, c2w, ctx, chunk=chunk,
            white_bkgd=True, render_fn=fn,
        )
        dt = time.time() - t0
        np.save(os.path.join(args.out, f"{tag}.npy"), out["rgb"])
        print(f"{tag}: rendered {H}x{W} in {dt:.2f} s "
              f"(backend={jax.default_backend()})")
        return out["rgb"]

    frames = {}
    if args.cpu:
        frames["cpu32"] = run("cpu32", fused=False, chunk=8192)
    else:
        frames["fused"] = run("fused", fused=True, chunk=32768)
        frames["xla32"] = run("xla32", fused=False, chunk=8192)

    # load any frames a previous invocation (other backend) saved
    for tag in ("fused", "xla32", "cpu32"):
        path = os.path.join(args.out, f"{tag}.npy")
        if tag not in frames and os.path.exists(path):
            frames[tag] = np.load(path)

    tags = sorted(frames)
    for a in range(len(tags)):
        for b in range(a + 1, len(tags)):
            print(
                f"PSNR({tags[a]}, {tags[b]}) = "
                f"{np_psnr(frames[tags[a]], frames[tags[b]]):.2f} dB"
            )


if __name__ == "__main__":
    main()
