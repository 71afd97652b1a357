"""Native C++ host sampler: build, correctness vs numpy, integration."""

import numpy as np
import pytest

from posegen_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib(auto_build=True)
    if lib is None:
        pytest.skip("g++ build of libposegen_host.so failed")
    return lib


def test_sample_and_gather_correctness(lib, rng):
    H = W = 32
    smask = np.zeros((H * W,), np.uint8)
    valid = rng.choice(H * W, 200, replace=False)
    smask[valid] = 1
    img = rng.integers(0, 255, (H * W, 3), dtype=np.uint8)
    mask = (rng.uniform(size=H * W) > 0.5).astype(np.uint8)
    pix_dirs = rng.standard_normal((H * W, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1.0, 2.0, 3.0]

    out = native.sample_and_gather(
        smask, img, mask, pix_dirs, c2w, 50.0, 50.0, n_rays=64, seed=7
    )
    assert out is not None
    idx = out["idx"]
    # all sampled pixels come from the valid set, no duplicates (64 < 200)
    assert np.isin(idx, valid).all()
    assert len(np.unique(idx)) == 64
    # gathers match numpy
    np.testing.assert_allclose(
        out["target_s"], img[idx].astype(np.float32) / 255.0, atol=1e-6
    )
    np.testing.assert_allclose(out["fgs"][:, 0], (mask[idx] > 0).astype(np.float32))
    np.testing.assert_allclose(out["rays_o"], np.tile(c2w[:3, 3], (64, 1)), atol=1e-6)
    expect_d = pix_dirs[idx] / np.array([50.0, 50.0, 1.0])  # identity rotation
    np.testing.assert_allclose(out["rays_d"], expect_d, atol=1e-5)


def test_sample_with_replacement_when_few_valid(lib, rng):
    smask = np.zeros((64,), np.uint8)
    smask[[3, 10]] = 1
    img = np.zeros((64, 3), np.uint8)
    mask = smask.copy()
    out = native.sample_and_gather(
        smask, img, mask, np.zeros((64, 3), np.float32), np.eye(4, dtype=np.float32),
        1.0, 1.0, n_rays=16, seed=1,
    )
    assert np.isin(out["idx"], [3, 10]).all()


def test_dataset_uses_native_path(lib, tmp_path, rng):
    from posegen_tpu.data.h5dataset import H5RayDataset
    from posegen_tpu.data.synthetic import make_synthetic_h5

    path = make_synthetic_h5(str(tmp_path / "d.h5"), n_images=4, H=40, W=40)
    ds = H5RayDataset(path, n_rays_per_image=32)
    assert ds._sample_image_native(0) is not None, "native path not taken"
    s = ds.sample_image(1)
    assert s["rays_o"].shape == (32, 3)
    assert s["fgs"].mean() > 0.3  # sampling mask respected
    # rays still aim at the subject (same geometry check as the numpy path)
    cyl = s["cyls"][0]
    center = np.array([cyl[0], 0.0, cyl[1]])
    o, d = s["rays_o"], s["rays_d"]
    oc = (center - o)[:, [0, 2]]
    dd = d[:, [0, 2]]
    t = np.sum(oc * dd, -1) / np.maximum(np.sum(dd * dd, -1), 1e-9)
    closest = o[:, [0, 2]] + dd * t[:, None] - center[[0, 2]]
    assert np.quantile(np.linalg.norm(closest, axis=-1), 0.8) < cyl[2] * 1.5
    ds.close()


def test_native_vs_numpy_throughput(lib, tmp_path, rng):
    """Native path should not be slower than the numpy fallback."""
    import time

    from posegen_tpu.data.h5dataset import H5RayDataset
    from posegen_tpu.data.synthetic import make_synthetic_h5

    path = make_synthetic_h5(str(tmp_path / "p.h5"), n_images=4, H=128, W=128)
    ds = H5RayDataset(path, n_rays_per_image=64)

    t0 = time.perf_counter()
    for i in range(40):
        ds._sample_image_native(i % 4)
    t_native = time.perf_counter() - t0

    native_fn = ds._sample_image_native
    ds._sample_image_native = lambda i: None  # force numpy path
    t0 = time.perf_counter()
    for i in range(40):
        ds.sample_image(i % 4)
    t_numpy = time.perf_counter() - t0
    ds._sample_image_native = native_fn
    ds.close()
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
