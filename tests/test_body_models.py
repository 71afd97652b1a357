"""SMPL-X / MANO / FLAME forward parity vs the vendored reference library.

Builds random-weights models in the official file formats, loads them
through BOTH stacks (reference smplx/smplx/body_models.py on torch CPU; our
posegen_tpu.body.models loaders), and compares vertices/joints on random
pose inputs — the `make_random_model` trick applied to the whole family.
"""

import pickle
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference/smplx")

from posegen_tpu.body.models import (  # noqa: E402
    SMPLX_JOINT_NAMES,
    load_flame_model,
    load_mano_model,
    load_smplx_model,
)

import jax.numpy as jnp  # noqa: E402


def _random_tree(rng, J):
    parents = np.zeros(J, np.int64)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)
    return parents


def _base_body_data(rng, V, J, F, n_shapecols):
    parents = _random_tree(rng, J)
    kintree = np.stack([parents.astype(np.uint32), np.arange(J, dtype=np.uint32)])
    kintree = kintree.copy()
    kintree[0, 0] = np.uint32(4294967295)  # official files store -1 as uint32
    J_reg = rng.random((J, V)).astype(np.float64)
    J_reg /= J_reg.sum(1, keepdims=True)
    return {
        "v_template": rng.standard_normal((V, 3)).astype(np.float64) * 0.1,
        "shapedirs": rng.standard_normal((V, 3, n_shapecols)) * 0.01,
        "posedirs": rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        "J_regressor": J_reg,
        "kintree_table": kintree,
        "weights": _softmax_rows(rng, V, J),
        "f": rng.integers(0, V, (F, 3)).astype(np.int64),
    }


def _softmax_rows(rng, V, J):
    w = rng.standard_normal((V, J)) * 2
    w = np.exp(w)
    return (w / w.sum(1, keepdims=True)).astype(np.float64)


def _smplx_data(rng, V=10475, J=55, F=800):
    data = _base_body_data(rng, V, J, F, n_shapecols=20)  # 10 shape + 10 expr
    data.update(
        hands_componentsl=rng.standard_normal((45, 45)) * 0.5,
        hands_componentsr=rng.standard_normal((45, 45)) * 0.5,
        hands_meanl=rng.standard_normal(45) * 0.1,
        hands_meanr=rng.standard_normal(45) * 0.1,
        lmk_faces_idx=rng.integers(0, F, (51,)).astype(np.int64),
        lmk_bary_coords=_softmax_rows(rng, 51, 3),
        dynamic_lmk_faces_idx=rng.integers(0, F, (79, 17)).astype(np.int64),
        dynamic_lmk_bary_coords=np.stack(
            [_softmax_rows(rng, 17, 3) for _ in range(79)]
        ),
    )
    return data


def test_smplx_forward_parity(tmp_path):
    import smplx as ref_smplx

    rng = np.random.default_rng(0)
    data = _smplx_data(rng)
    path = tmp_path / "SMPLX_NEUTRAL.npz"
    np.savez(path, **data)

    ref = ref_smplx.SMPLX(
        model_path=str(path), ext="npz", use_pca=True, num_pca_comps=6,
        flat_hand_mean=False, use_face_contour=True, batch_size=3,
    )
    ours = load_smplx_model(
        str(path), use_pca=True, num_pca_comps=6, flat_hand_mean=False,
        use_face_contour=True,
    )

    B = 3
    betas = rng.standard_normal((B, 10)).astype(np.float32) * 0.5
    expr = rng.standard_normal((B, 10)).astype(np.float32) * 0.5
    body = rng.standard_normal((B, 63)).astype(np.float32) * 0.3
    go = rng.standard_normal((B, 3)).astype(np.float32) * 0.5
    jaw = rng.standard_normal((B, 3)).astype(np.float32) * 0.1
    leye = rng.standard_normal((B, 3)).astype(np.float32) * 0.1
    reye = rng.standard_normal((B, 3)).astype(np.float32) * 0.1
    lh = rng.standard_normal((B, 6)).astype(np.float32) * 0.3
    rh = rng.standard_normal((B, 6)).astype(np.float32) * 0.3
    transl = rng.standard_normal((B, 3)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            betas=torch.from_numpy(betas), body_pose=torch.from_numpy(body),
            global_orient=torch.from_numpy(go),
            left_hand_pose=torch.from_numpy(lh),
            right_hand_pose=torch.from_numpy(rh),
            jaw_pose=torch.from_numpy(jaw), leye_pose=torch.from_numpy(leye),
            reye_pose=torch.from_numpy(reye),
            expression=torch.from_numpy(expr),
            transl=torch.from_numpy(transl),
        )
    out = ours(
        jnp.asarray(betas), body_pose=jnp.asarray(body),
        global_orient=jnp.asarray(go), left_hand_pose=jnp.asarray(lh),
        right_hand_pose=jnp.asarray(rh), jaw_pose=jnp.asarray(jaw),
        leye_pose=jnp.asarray(leye), reye_pose=jnp.asarray(reye),
        expression=jnp.asarray(expr), transl=jnp.asarray(transl),
    )

    np.testing.assert_allclose(
        np.asarray(out["vertices"]), out_ref.vertices.numpy(), atol=2e-5
    )
    assert out["joints"].shape == out_ref.joints.shape == (B, 127 + 17, 3)
    np.testing.assert_allclose(
        np.asarray(out["joints"]), out_ref.joints.numpy(), atol=2e-5
    )
    # full SMPL-X joint-name table covers the static output layout
    assert len(SMPLX_JOINT_NAMES) == 144
    assert SMPLX_JOINT_NAMES[22] == "jaw"
    assert SMPLX_JOINT_NAMES[55] == "nose"
    assert SMPLX_JOINT_NAMES[76] == "right_eye_brow1"
    assert SMPLX_JOINT_NAMES[127] == "right_contour_1"


def test_mano_forward_parity(tmp_path):
    import smplx as ref_smplx

    rng = np.random.default_rng(1)
    V, J, F = 778, 16, 300
    data = _base_body_data(rng, V, J, F, n_shapecols=10)
    data.update(
        hands_components=rng.standard_normal((45, 45)) * 0.5,
        hands_mean=rng.standard_normal(45) * 0.1,
    )
    path = tmp_path / "MANO_RIGHT.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)

    ref = ref_smplx.MANO(
        model_path=str(path), ext="pkl", use_pca=True, num_pca_comps=6,
        flat_hand_mean=False, batch_size=2, is_rhand=True,
    )
    ours = load_mano_model(str(path), use_pca=True, num_pca_comps=6)

    B = 2
    betas = rng.standard_normal((B, 10)).astype(np.float32) * 0.5
    hp = rng.standard_normal((B, 6)).astype(np.float32) * 0.3
    go = rng.standard_normal((B, 3)).astype(np.float32) * 0.5
    transl = rng.standard_normal((B, 3)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            betas=torch.from_numpy(betas), hand_pose=torch.from_numpy(hp),
            global_orient=torch.from_numpy(go), transl=torch.from_numpy(transl),
        )
    out = ours(
        jnp.asarray(betas), hand_pose=jnp.asarray(hp),
        global_orient=jnp.asarray(go), transl=jnp.asarray(transl),
    )
    np.testing.assert_allclose(
        np.asarray(out["vertices"]), out_ref.vertices.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["joints"]), out_ref.joints.numpy(), atol=2e-5
    )
    assert out["joints"].shape == (B, 16, 3)


def test_mano_no_pca():
    """num_pca_comps=45 disables PCA (reference body_models.py:1583-1585)."""
    rng = np.random.default_rng(2)
    import tempfile, os

    data = _base_body_data(rng, 80, 16, 40, n_shapecols=10)
    data.update(
        hands_components=rng.standard_normal((45, 45)),
        hands_mean=np.zeros(45),
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.pkl")
        with open(path, "wb") as f:
            pickle.dump(data, f)
        m = load_mano_model(path, num_pca_comps=45)
    assert not m.use_pca
    out = m(jnp.zeros((1, 10)), hand_pose=jnp.zeros((1, 45)))
    assert out["vertices"].shape == (1, 80, 3)


def test_flame_forward_parity(tmp_path):
    import smplx as ref_smplx

    rng = np.random.default_rng(3)
    V, J, F = 600, 5, 200
    data = _base_body_data(rng, V, J, F, n_shapecols=20)
    # FLAME chain: neck<-global, jaw/eyes<-neck
    parents = np.array([0, 0, 1, 1, 1], np.int64)
    kintree = np.stack([parents.astype(np.uint32), np.arange(J, dtype=np.uint32)])
    kintree[0, 0] = np.uint32(4294967295)
    data["kintree_table"] = kintree
    data["posedirs"] = rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001

    with open(tmp_path / "FLAME_NEUTRAL.pkl", "wb") as f:
        pickle.dump(data, f)
    lmk = {
        "lmk_face_idx": rng.integers(0, F, (51,)).astype(np.int64),
        "lmk_b_coords": _softmax_rows(rng, 51, 3),
    }
    with open(tmp_path / "flame_static_embedding.pkl", "wb") as f:
        pickle.dump(lmk, f)
    dyn = {
        "lmk_face_idx": rng.integers(0, F, (79, 17)).astype(np.int64),
        "lmk_b_coords": np.stack([_softmax_rows(rng, 17, 3) for _ in range(79)]),
    }
    np.save(tmp_path / "flame_dynamic_embedding.npy", dyn, allow_pickle=True)

    ref = ref_smplx.FLAME(
        model_path=str(tmp_path), ext="pkl", batch_size=2, use_face_contour=True,
    )
    ours = load_flame_model(
        str(tmp_path / "FLAME_NEUTRAL.pkl"),
        landmark_path=str(tmp_path / "flame_static_embedding.pkl"),
        contour_path=str(tmp_path / "flame_dynamic_embedding.npy"),
    )

    B = 2
    betas = rng.standard_normal((B, 10)).astype(np.float32) * 0.5
    expr = rng.standard_normal((B, 10)).astype(np.float32) * 0.5
    go = rng.standard_normal((B, 3)).astype(np.float32) * 0.4
    neck = rng.standard_normal((B, 3)).astype(np.float32) * 0.2
    jaw = rng.standard_normal((B, 3)).astype(np.float32) * 0.1
    leye = rng.standard_normal((B, 3)).astype(np.float32) * 0.1
    reye = rng.standard_normal((B, 3)).astype(np.float32) * 0.1

    with torch.no_grad():
        out_ref = ref(
            betas=torch.from_numpy(betas), global_orient=torch.from_numpy(go),
            neck_pose=torch.from_numpy(neck), jaw_pose=torch.from_numpy(jaw),
            leye_pose=torch.from_numpy(leye), reye_pose=torch.from_numpy(reye),
            expression=torch.from_numpy(expr),
        )
    out = ours(
        jnp.asarray(betas), global_orient=jnp.asarray(go),
        neck_pose=jnp.asarray(neck), jaw_pose=jnp.asarray(jaw),
        leye_pose=jnp.asarray(leye), reye_pose=jnp.asarray(reye),
        expression=jnp.asarray(expr),
    )
    np.testing.assert_allclose(
        np.asarray(out["vertices"]), out_ref.vertices.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["joints"]), out_ref.joints.numpy(), atol=2e-5
    )
