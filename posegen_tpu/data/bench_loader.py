"""Input-pipeline throughput at workload scale.

Measures RayBatchLoader batches/s at the flagship training shape
(512x512 images, N_rand 3072 over 64 sample images — reference
configs/h36m/h36m_prot2.txt:35-41) with and without the native C++
sampler, so loader-boundness can be compared against the train step rate.

CLI: python -m posegen_tpu.data.bench_loader [--h 512] [--n_images 64] ...
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Optional


def bench_loader(
    h5_path: str,
    n_rand: int = 3072,
    n_sample_images: int = 64,
    n_batches: int = 30,
    use_native: bool = True,
    prefetch: int = 4,
    num_workers: int = 0,
) -> dict:
    from posegen_tpu.data import native
    from posegen_tpu.data.h5dataset import H5RayDataset, RayBatchLoader

    if not use_native:
        native._lib = None
        native._load_attempted = True
    else:
        native._lib = None
        native._load_attempted = False

    ds = H5RayDataset(
        h5_path, n_rays_per_image=max(n_rand // n_sample_images, 1), seed=0
    )
    loader = RayBatchLoader(
        ds, n_images_per_batch=n_sample_images, prefetch=prefetch, seed=0,
        num_workers=num_workers,
    )
    it = iter(loader)
    # warmup (thread start + first fills)
    for _ in range(3):
        next(it)
    t0 = time.perf_counter()
    n_rays = 0
    for _ in range(n_batches):
        b = next(it)
        n_rays += b["rays_o"].shape[0]
    dt = time.perf_counter() - t0
    loader.close()
    ds.close()
    return {
        "variant": "native" if (use_native and native.get_lib()) else "numpy",
        "num_workers": num_workers,
        "batches_per_s": n_batches / dt,
        "rays_per_s": n_rays / dt,
        "n_rand": n_rand,
        "n_sample_images": n_sample_images,
    }


def main(argv: Optional[list] = None) -> None:
    import argparse

    p = argparse.ArgumentParser("posegen_tpu.data.bench_loader")
    p.add_argument("--h5", type=str, default=None, help="existing H5 (else synthetic)")
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--n_images", type=int, default=64)
    p.add_argument("--N_rand", type=int, default=3072)
    p.add_argument("--N_sample_images", type=int, default=64)
    p.add_argument("--n_batches", type=int, default=30)
    p.add_argument("--num_workers", type=int, default=0)
    args = p.parse_args(argv)

    path = args.h5
    tmp = None
    if path is None:
        from posegen_tpu.data.synthetic import make_synthetic_h5

        tmp = tempfile.mkdtemp()
        path = os.path.join(tmp, f"bench_{args.res}.h5")
        print(f"generating synthetic {args.res}x{args.res} H5 ({args.n_images} images)...")
        make_synthetic_h5(
            path, n_images=args.n_images, H=args.res, W=args.res,
            focal=args.res * 1.2,
        )

    for use_native in (True, False):
        r = bench_loader(
            path, n_rand=args.N_rand, n_sample_images=args.N_sample_images,
            n_batches=args.n_batches, use_native=use_native,
            num_workers=args.num_workers,
        )
        print(json.dumps(r))


if __name__ == "__main__":
    main()
