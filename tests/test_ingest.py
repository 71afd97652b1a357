"""Raw-archive ingestion CLIs on synthesized raw-layout fixtures.

Each test builds a miniature dataset download in the REAL directory/file
schema (SURREAL seq dirs + metadata.pkl + segm.mat; H36M SPIN/mask h5 +
backgrounds; ZJU CoreView annots.npy + EasyMocap params), runs the ingest
CLI, and loads the produced H5 through the training dataset.
"""

import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from posegen_tpu.data.h5dataset import H5RayDataset  # noqa: E402
from posegen_tpu.data.ingest import main as ingest_main  # noqa: E402


def _check_h5(path, n_imgs, n_kps, H, W):
    ds = H5RayDataset(path, n_rays_per_image=8)
    assert ds.n_images == n_imgs
    assert ds.H == H and ds.W == W
    assert ds.kp3d.shape == (n_kps, 24, 3)
    assert ds.skts.shape == (n_kps, 24, 4, 4)
    assert ds.cyls.shape == (n_kps, 5)
    assert np.isfinite(ds.kp3d).all() and np.isfinite(ds.skts).all()
    out = ds.sample_image(0)
    assert out["rays_o"].shape == (8, 3) and np.isfinite(out["rays_o"]).all()
    # skts are actual inverses of finite rigid transforms
    l2w = np.linalg.inv(ds.skts[0])
    np.testing.assert_allclose(
        l2w[..., 3, :], np.tile([0, 0, 0, 1.0], (l2w.shape[0], 1)), atol=1e-5
    )
    return ds


def _look_at(eye, center=np.zeros(3)):
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def _make_surreal_raw(root, rng, H=32, W=32, n_kp=3, n_cams=2):
    """Synthesize a raw SURREAL-style render dump in the REAL layout
    (seq dirs + metadata.pkl + *segm.mat + imageSequences pngs)."""
    from scipy.io import savemat

    for si, seq in enumerate(["run_01", "walk_02"]):
        d = root / seq
        sub = d / "0-1"
        (sub / "imageSequences").mkdir(parents=True)
        cams = np.stack([
            _look_at(np.array([3.0, 0.5, 0.0])),
            _look_at(np.array([0.0, 0.5, 3.0])),
        ])
        meta = {
            "focal": 600.0,
            "int_scale": 1.0,
            "render_type": "static" if si == 0 else "moving",
            "cams": cams,
            "N_kp": n_kp,
            "N_cams": n_cams,
            "N_cam_per_subdir": n_cams,
            "joints3D": rng.standard_normal((n_kp, 24, 3)).astype(np.float32) * 0.2,
            "poses": (rng.standard_normal((n_kp, 72)) * 0.2).astype(np.float32),
        }
        with open(d / "metadata.pkl", "wb") as f:
            pickle.dump(meta, f)
        segm = rng.integers(0, 3, (n_cams * n_kp, H, W)).astype(np.uint8)
        savemat(sub / "001_segm.mat", {"data": segm})
        for i in range(n_cams * n_kp):
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(str(sub / "imageSequences" / f"{i:04d}.png"), img)
    return n_kp, n_cams


def test_ingest_surreal(tmp_path):
    rng = np.random.default_rng(0)
    H = W = 32
    (tmp_path / "raw").mkdir()
    n_kp, n_cams = _make_surreal_raw(tmp_path / "raw", rng, H, W)

    out = str(tmp_path / "surreal.h5")
    ingest_main(["surreal", str(tmp_path / "raw"), out])
    n_kps = 2 * n_kp  # 2 seqs
    ds = _check_h5(out, n_imgs=n_cams * n_kps, n_kps=n_kps, H=H, W=W)
    # SurrealDataset index arithmetic: idx = cam * N_kps + kp
    assert int(ds.kp_idxs[1]) == 1 and int(ds.kp_idxs[n_kps]) == 0


def test_ingest_h36m(tmp_path):
    import h5py

    rng = np.random.default_rng(1)
    H = W = 40
    N = 4
    d = tmp_path / "h36m"
    (d / "images").mkdir(parents=True)

    img_paths = []
    for i in range(N):
        cam = ["54138969", "55011271"][i % 2]
        p = f"images/Walking-{cam}_{i:05d}.jpg"
        cv2.imwrite(str(d / p), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        img_paths.append(p.encode())

    # SPIN estimate h5 (array layout readable by h5py; reference deepdish
    # dumps store arrays the same way)
    aa = rng.standard_normal((N, 24, 3)) * 0.2
    import jax.numpy as jnp
    from posegen_tpu.skeleton.rotations import axisang_to_rot

    rot_mats = np.asarray(axisang_to_rot(jnp.asarray(aa))).astype(np.float32)
    joints = rng.standard_normal((N, 49, 3)).astype(np.float32) * 0.3
    with h5py.File(d / "S9_SPIN_rect_output-maxmin.h5", "w") as f:
        f["pred_betas"] = rng.standard_normal((N, 10)).astype(np.float32) * 0.3
        f["pred_rot_mat"] = rot_mats
        f["bbox_params"] = np.stack(
            [np.full(N, W / 2), np.full(N, H / 2), np.full(N, H * 0.8)], -1
        ).astype(np.float32)
        f["pred_camera"] = np.stack(
            [np.full(N, 0.9), np.zeros(N), np.full(N, 0.1)], -1
        ).astype(np.float32)
        f["joints"] = joints
        f["img_path"] = img_paths
    with h5py.File(d / "S9_mask_deeplab_crop.h5", "w") as f:
        f["masks"] = rng.integers(0, 4, (N, H, W), dtype=np.uint8)
    np.save(d / "S9_clean_bkgds.npy",
            rng.integers(0, 255, (4, H, W, 3), dtype=np.uint8))

    out = str(tmp_path / "h36m.h5")
    ingest_main(["h36m", str(d), out, "--subject", "S9"])
    _check_h5(out, n_imgs=N, n_kps=N, H=H, W=W)


def test_ingest_h36m_missing_joints_is_loud(tmp_path):
    import h5py

    d = tmp_path / "h36m"
    d.mkdir()
    with h5py.File(d / "S9_SPIN_rect_output-maxmin.h5", "w") as f:
        f["pred_betas"] = np.zeros((2, 10), np.float32)
    from posegen_tpu.data.ingest import read_spin_h5

    with pytest.raises(KeyError, match="joints"):
        read_spin_h5(str(d / "S9_SPIN_rect_output-maxmin.h5"))


def test_ingest_zju(tmp_path):
    from posegen_tpu.body.smpl import make_random_model

    rng = np.random.default_rng(2)
    H = W = 36
    n_frames, views = 2, (0, 1)
    sp = tmp_path / "zju" / "CoreView_377"
    (sp / "params").mkdir(parents=True)

    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
    cams = {
        "K": [K, K],
        "D": [np.zeros((5, 1)), np.zeros((5, 1))],
        "R": [np.eye(3), cv2.Rodrigues(np.array([0, np.pi / 4, 0]))[0]],
        "T": [np.array([[0.0], [0.0], [2500.0]]), np.array([[0.0], [0.0], [2500.0]])],
    }
    ims = []
    for fi in range(n_frames):
        frame_ims = []
        for v in range(2):
            p = f"images/Camera_B{v + 1}/{fi:06d}.jpg"
            (sp / os.path.dirname(p)).mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(sp / p), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            mp = p.replace("images", "mask").replace(".jpg", ".png")
            (sp / os.path.dirname(mp)).mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(sp / mp), rng.integers(0, 2, (H, W), dtype=np.uint8) * 255)
            frame_ims.append(p)
        ims.append({"ims": frame_ims})
        np.save(sp / "params" / f"{fi}.npy", {
            "poses": (rng.standard_normal((1, 72)) * 0.2).astype(np.float32),
            "shapes": (rng.standard_normal((1, 10)) * 0.2).astype(np.float32),
            "Rh": (rng.standard_normal((1, 3)) * 0.2).astype(np.float32),
            "Th": rng.standard_normal((1, 3)).astype(np.float32),
        })
    np.save(sp / "annots.npy", {"cams": cams, "ims": ims})

    # a structurally-valid random SMPL stand-in with the real joint count
    model = make_random_model(n_vertices=100, n_joints=24, n_betas=10, seed=3)

    from posegen_tpu.data.ingest import ingest_zju

    out = ingest_zju(
        str(tmp_path / "zju"), str(tmp_path / "zju.h5"), subject="377",
        smpl_model=model, training_views=views,
    )
    _check_h5(out, n_imgs=n_frames * 2, n_kps=n_frames, H=H, W=W)


@pytest.mark.slow
def test_ingest_surreal_matches_reference(tmp_path):
    """Golden cross-validation: our SURREAL archive walker produces the SAME
    H5 contents as the actual reference processor (core/load_surreal.py
    process_surreal_data, run on torch CPU via the import shims) on one
    synthesized raw tree."""
    import sys

    import h5py

    sys.path.insert(0, os.path.dirname(__file__))
    import reference_shims

    reference_shims.install()
    sys.path.insert(0, "/root/reference")
    from core.load_surreal import process_surreal_data

    rng = np.random.default_rng(7)
    H = W = 64  # the reference writer's image chunking needs H*W >= 64^2
    raw = tmp_path / "raw"
    raw.mkdir()
    _make_surreal_raw(raw, rng, H, W)

    ref_h5 = str(tmp_path / "ref.h5")
    process_surreal_data(ref_h5, str(raw), extend_iter=2, ext_scale=0.001)

    from posegen_tpu.data.ingest import ingest_surreal

    ours_h5 = str(tmp_path / "ours.h5")
    ingest_surreal(str(raw), ours_h5, ext_scale=0.001, extend_iter=2)

    with h5py.File(ref_h5, "r") as fr, h5py.File(ours_h5, "r") as fo:
        for key, atol in (
            ("kp3d", 1e-4), ("bones", 1e-5), ("skts", 2e-3), ("cyls", 1e-3),
            ("c2ws", 1e-5), ("focals", 1e-4), ("rest_pose", 1e-6),
            ("bkgd_idxs", 0),
        ):
            a, b = np.asarray(fr[key]), np.asarray(fo[key])
            assert a.shape == b.shape, (key, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=atol, err_msg=key)
        # image-like keys: reference flattens to (N, H*W, C)
        for key in ("imgs", "masks", "sampling_masks"):
            a = np.asarray(fr[key]).reshape(-1, H, W, np.asarray(fr[key]).shape[-1])
            b = np.asarray(fo[key])
            assert a.shape == b.shape, key
            mismatch = float((a != b).mean())
            assert mismatch == 0.0, f"{key}: {mismatch:.4%} pixels differ"


@pytest.mark.slow
def test_zju_get_smpls_matches_reference(tmp_path):
    """Golden cross-validation: our EasyMocap->NeRF conversion matches the
    reference get_smpls (core/load_zju.py:70-177, torch CPU via shims) on
    the same params + the same random-weights real-topology SMPL pkl."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import reference_shims

    reference_shims.install()

    rng = np.random.default_rng(13)
    V, J = 6890, 24
    parents = np.zeros(J, np.int64)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)
    kintree = np.stack([parents.astype(np.uint32), np.arange(J, dtype=np.uint32)])
    kintree[0, 0] = np.uint32(4294967295)
    J_reg = rng.random((J, V))
    J_reg /= J_reg.sum(1, keepdims=True)
    w = np.exp(rng.standard_normal((V, J)) * 2)
    data = {
        "v_template": rng.standard_normal((V, 3)) * 0.1,
        "shapedirs": rng.standard_normal((V, 3, 10)) * 0.01,
        "posedirs": rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        "J_regressor": J_reg,
        "kintree_table": kintree,
        "weights": w / w.sum(1, keepdims=True),
        "f": rng.integers(0, V, (100, 3)).astype(np.int64),
    }
    smpl_pkl = tmp_path / "SMPL_NEUTRAL.pkl"
    with open(smpl_pkl, "wb") as f:
        pickle.dump(data, f)

    # EasyMocap param files (+ provided vertices, read by the reference)
    sp = tmp_path / "subject"
    (sp / "params").mkdir(parents=True)
    (sp / "vertices").mkdir(parents=True)
    n_frames = 3
    for i in range(n_frames):
        np.save(sp / "params" / f"{i}.npy", {
            "poses": (rng.standard_normal((1, 72)) * 0.25).astype(np.float32),
            "shapes": (rng.standard_normal((1, 10)) * 0.25).astype(np.float32),
            "Rh": (rng.standard_normal((1, 3)) * 0.3).astype(np.float32),
            "Th": rng.standard_normal((1, 3)).astype(np.float32),
        })
        np.save(sp / "vertices" / f"{i}.npy",
                rng.standard_normal((V, 3)).astype(np.float32))

    from core.load_zju import get_smpls as ref_get_smpls

    r_betas, r_kp3d, r_bones, r_skts, r_rest, r_verts, r_scale = ref_get_smpls(
        str(sp), list(range(n_frames)), ext_scale=0.001, scale_to_ref=True,
        model_path=str(smpl_pkl),
    )

    from posegen_tpu.body.smpl import load_smpl_model
    from posegen_tpu.data.ingest import zju_get_smpls

    model = load_smpl_model(str(smpl_pkl))
    o_betas, o_kp3d, o_bones, o_skts, o_rest, o_verts, o_scale = zju_get_smpls(
        str(sp), list(range(n_frames)), model, ext_scale=0.001, scale_to_ref=True,
    )

    np.testing.assert_allclose(o_scale, r_scale, rtol=1e-5)
    for name, a, b, atol in (
        ("rest_pose", r_rest, o_rest, 1e-5),
        ("kp3d", r_kp3d, np.asarray(o_kp3d), 1e-4),
        ("bones", r_bones, o_bones, 1e-4),
        ("skts", r_skts, np.asarray(o_skts), 5e-3),
        ("vertices", r_verts.numpy() if hasattr(r_verts, "numpy") else r_verts,
         np.asarray(o_verts), 1e-4),
    ):
        a = np.asarray(a)
        assert a.shape == np.asarray(b).shape, (name, a.shape, np.shape(b))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=atol, err_msg=name)


def _spin_h5(path, rng, N, img_paths, H, W):
    import h5py

    import jax.numpy as jnp
    from posegen_tpu.skeleton.rotations import axisang_to_rot

    aa = rng.standard_normal((N, 24, 3)) * 0.2
    with h5py.File(path, "w") as f:
        f["pred_betas"] = rng.standard_normal((N, 10)).astype(np.float32) * 0.3
        f["pred_rot_mat"] = np.asarray(axisang_to_rot(jnp.asarray(aa))).astype(np.float32)
        f["bbox_params"] = np.stack(
            [np.full(N, W / 2), np.full(N, H / 2), np.full(N, H * 0.8)], -1
        ).astype(np.float32)
        f["pred_camera"] = np.stack(
            [np.full(N, 0.9), np.zeros(N), np.full(N, 0.1)], -1
        ).astype(np.float32)
        f["joints"] = rng.standard_normal((N, 49, 3)).astype(np.float32) * 0.3
        f["img_path"] = [p.encode() for p in img_paths]


def test_ingest_perfcap(tmp_path):
    """MonoPerfCap raw layout: SPIN h5 + images/ + masks/ + bkgd.png
    (reference process_perfcap_data, load_perfcap.py:12-52)."""
    rng = np.random.default_rng(21)
    H = W = 36
    N = 3
    d = tmp_path / "pc"
    subj = "Weipeng_outdoor"
    (d / "MonoPerfCap" / subj / "images").mkdir(parents=True)
    (d / "MonoPerfCap" / subj / "masks").mkdir(parents=True)
    cv2.imwrite(str(d / "MonoPerfCap" / subj / "bkgd.png"),
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    paths = []
    for i in range(N):
        p = f"MonoPerfCap/{subj}/images/{i:04d}.png"
        cv2.imwrite(str(d / p), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        cv2.imwrite(str(d / p.replace("/images/", "/masks/")),
                    rng.integers(0, 4, (H, W), dtype=np.uint8))
        paths.append(p)
    _spin_h5(d / "MonoPerfCap" / f"MonoPerfCap-{subj}.h5", rng, N, paths, H, W)

    ingest_main(["perfcap", str(d), str(tmp_path / "pc.h5"), "--subject", subj])
    _check_h5(str(tmp_path / "pc.h5"), n_imgs=N, n_kps=N, H=H, W=W)


def test_ingest_mixamo(tmp_path):
    """Mixamo raw layout: SPIN h5 + <subject>/<seq>/Camera_<c>/ImageNNNN.png
    + Masks/ + metadata.pickle gt poses (reference process_mixamo_data,
    load_mixamo.py:14-103)."""
    rng = np.random.default_rng(22)
    H = W = 32
    subj, seq, n_cam, n_kp = "James", "Jab", 2, 2
    d = tmp_path / "mx"
    paths = []
    for c in range(n_cam):
        cam_d = d / subj / seq / f"Camera_{c}"
        (cam_d / "Masks").mkdir(parents=True)
        for k in range(n_kp):
            name = f"Image{k + 1:04d}.png"
            cv2.imwrite(str(cam_d / name),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            cv2.imwrite(str(cam_d / "Masks" / name),
                        rng.integers(0, 4, (H, W), dtype=np.uint8))
            paths.append(f"{subj}/{seq}/Camera_{c}/{name}")
    gt = [{f"j{j}": rng.standard_normal(3).astype(np.float32) for j in range(24)}
          for _ in range(n_kp)]
    with open(d / subj / seq / "Camera_0" / "metadata.pickle", "wb") as f:
        pickle.dump({"gt_pose": gt}, f)
    (d / subj).mkdir(exist_ok=True)
    _spin_h5(d / subj / f"{subj}.h5", rng, len(paths), paths, H, W)

    from posegen_tpu.data.ingest import ingest_mixamo

    out = ingest_mixamo(str(d), str(tmp_path / "mx.h5"), subject=subj, n_cam=n_cam)
    ds = _check_h5(out, n_imgs=n_cam * n_kp, n_kps=n_cam * n_kp, H=H, W=W)
    # white background composited where the mask is off
    import h5py

    with h5py.File(out, "r") as f:
        assert "gt_kp3d" in f
        assert f["gt_kp3d"].shape == (n_kp, 24, 3)


def test_ingest_3dhp(tmp_path):
    """MPI-INF-3DHP raw layout: subject-filtered SPIN h5 + imageSequence/
    + masks/ trees + background plate (reference process_3dhp_data,
    load_3dhp.py:81-140)."""
    import h5py

    rng = np.random.default_rng(23)
    H = W = 32
    d = tmp_path / "hp"
    paths = []
    for subj, n in (("S1", 3), ("S2", 2)):
        (d / subj / "imageSequence").mkdir(parents=True)
        (d / subj / "masks").mkdir(parents=True)
        for i in range(n):
            p = f"{subj}/imageSequence/img_{i:04d}.png"
            cv2.imwrite(str(d / p), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            cv2.imwrite(str(d / p.replace("/imageSequence/", "/masks/")),
                        rng.integers(0, 4, (H, W), dtype=np.uint8))
            paths.append(p)
    cv2.imwrite(str(d / "S1_bkgd.png"),
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    _spin_h5(d / "MPI_SPIN_rect_output-maxmin.h5", rng, len(paths), paths, H, W)
    with h5py.File(d / "MPI_SPIN_rect_output-maxmin.h5", "a") as f:
        f["pose_3d"] = rng.standard_normal((len(paths), 24, 4)).astype(np.float32)

    from posegen_tpu.data.ingest import ingest_3dhp

    out = ingest_3dhp(str(d), str(tmp_path / "hp.h5"), subject="S1")
    _check_h5(out, n_imgs=3, n_kps=3, H=H, W=W)
    with h5py.File(out, "r") as f:
        assert "gt_kp3d" in f and f["gt_kp3d"].shape[0] == 3
        assert "bkgds" in f
