"""Headline benchmark: volume-rendering throughput (rays/sec) on one chip.

Workload = the SURREAL training architecture (BASELINE.md: 64 coarse + 16
fine samples, coarse+fine 8x256 MLPs, reldist/relray/reldir conditioning,
cutoff embedder) evaluating eval-mode ray batches, i.e. the hot path of both
training and 512x512 rendering.

Baseline: the PyTorch reference publishes no numbers (BASELINE.md). We use
25k rays/s as the assumed A100 reference throughput for this exact workload
(per-chunk python loops + DataParallel scatter put A-NeRF-style renderers in
the 10-40k rays/s range); the driver target is >=10x. vs_baseline is
measured_rays_per_sec / 25_000.

Anchor (measured, tools/bench_reference_cpu.py): the ACTUAL reference
RayCaster.render_rays runs at 183.3 rays/s on this host's single CPU core
(torch CPU via the shims, identical flagship workload); our jax-CPU render
measures 216.3 rays/s on the same core — CPU-to-CPU the two pipelines are
comparable, so the headline speedup is the TPU mapping, not a weak
baseline. Scaling one CPU core by the ~100-200x an A100 delivers on this
bandwidth-bound workload brackets 18k-37k rays/s, consistent with the 25k
assumption.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_RAYS_PER_SEC = 25_000.0


def main() -> None:
    from posegen_tpu.render.raycast import RaycastConfig, render_rays
    from posegen_tpu.utils.fixtures import make_problem

    n_rays = 8192
    cfg, params, ctx, rays_o, rays_d = make_problem(RaycastConfig(), n_rays=n_rays)

    fn = jax.jit(
        lambda p, o, d, c: render_rays(
            cfg, p, o, d, c, perturb=0.0, raw_noise_std=0.0, coarse_rgb=False
        )["rgb_map"]
    )
    # warmup / compile
    jax.block_until_ready(fn(params, rays_o, rays_d, ctx))

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, rays_o, rays_d, ctx)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
