"""SMPL parameter-transfer fitting tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.body.smpl import make_random_model
from posegen_tpu.body.transfer import (
    FitConfig,
    apply_deformation_transfer,
    init_variables,
    run_fitting,
)


def _with_faces(model, seed=0):
    rng = np.random.default_rng(seed)
    V = model.n_vertices
    faces = rng.choice(V, (3 * V, 3))
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (
        faces[:, 0] != faces[:, 2]
    )
    import dataclasses

    return dataclasses.replace(model, faces=faces[ok].astype(np.int64))


@pytest.mark.slow
def test_fitting_recovers_parameters(rng):
    model = _with_faces(make_random_model(n_vertices=48, n_joints=6, n_betas=4))
    gt = {
        "betas": jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)) * 0.5,
        "global_orient": jnp.asarray((rng.standard_normal((2, 3)) * 0.2).astype(np.float32)),
        "body_pose": jnp.asarray((rng.standard_normal((2, 15)) * 0.2).astype(np.float32)),
        "transl": jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32)) * 0.3,
    }
    target = model(
        betas=gt["betas"], body_pose=gt["body_pose"],
        global_orient=gt["global_orient"], transl=gt["transl"],
    )["vertices"]

    params, losses = run_fitting(
        model, np.asarray(target), cfg=FitConfig(edge_steps=250, vertex_steps=400, lr=0.03)
    )
    assert losses["vertex_loss"] < 1e-3, losses
    fit_v = model(
        betas=params["betas"], body_pose=params["body_pose"],
        global_orient=params["global_orient"], transl=params["transl"],
    )["vertices"]
    err = float(jnp.mean(jnp.linalg.norm(fit_v - target, axis=-1)))
    assert err < 0.05, f"v2v error {err}"


def test_deformation_transfer_and_variables(rng):
    model = make_random_model(n_vertices=16, n_joints=4, n_betas=4)
    src = rng.standard_normal((2, 10, 3)).astype(np.float32)
    D = rng.uniform(0, 1, (16, 10)).astype(np.float32)
    D /= D.sum(-1, keepdims=True)
    out = apply_deformation_transfer(D, src)
    assert out.shape == (2, 16, 3)
    np.testing.assert_allclose(out[0, 0], D[0] @ src[0], atol=1e-5)

    var = init_variables(3, model, 4)
    assert var["body_pose"].shape == (3, 9)
    assert var["betas"].shape == (3, 4)


def test_transfer_cli_end_to_end(tmp_path):
    """`python -m posegen_tpu.body.transfer` analog of the reference
    `python -m transfer_model` driver: fit model params to .obj meshes and
    recover them (GT known: meshes posed by the same model)."""
    import pickle

    from posegen_tpu.body.transfer import main as transfer_main

    rng = np.random.default_rng(5)
    model = make_random_model(n_vertices=48, n_joints=6, n_betas=4, seed=2)

    # write the model as a loadable pkl
    mdl = {
        "v_template": np.asarray(model.v_template, np.float64),
        "shapedirs": np.asarray(model.shapedirs, np.float64),
        "posedirs": np.asarray(model.posedirs, np.float64).T.reshape(48, 3, -1),
        "J_regressor": np.asarray(model.J_regressor, np.float64),
        "kintree_table": np.stack([model.parents, np.arange(6)]),
        "weights": np.asarray(model.lbs_weights, np.float64),
        "f": rng.integers(0, 48, (40, 3)).astype(np.int64),
    }
    with open(tmp_path / "model.pkl", "wb") as f:
        pickle.dump(mdl, f)

    # pose the model with known params; dump meshes as .obj
    gt_pose = (rng.standard_normal((2, 5 * 3)) * 0.2).astype(np.float32)
    gt_go = (rng.standard_normal((2, 3)) * 0.2).astype(np.float32)
    gt_betas = (rng.standard_normal((2, 4)) * 0.5).astype(np.float32)
    out = model(
        jnp.asarray(gt_betas), body_pose=jnp.asarray(gt_pose),
        global_orient=jnp.asarray(gt_go),
    )
    (tmp_path / "meshes").mkdir()
    for i, v in enumerate(np.asarray(out["vertices"])):
        with open(tmp_path / "meshes" / f"m{i}.obj", "w") as f:
            for x, y, z in v:
                f.write(f"v {x} {y} {z}\n")

    transfer_main([
        "--target-model", str(tmp_path / "model.pkl"),
        "--mesh-dir", str(tmp_path / "meshes"),
        "--out", str(tmp_path / "fits.npz"),
        "--edge-steps", "250", "--vertex-steps", "350",
    ])
    fits = np.load(tmp_path / "fits.npz")
    assert fits["betas"].shape == (2, 4)
    # reconstruct and compare vertex-to-vertex error
    rec = model(
        jnp.asarray(fits["betas"]), body_pose=jnp.asarray(fits["body_pose"]),
        global_orient=jnp.asarray(fits["global_orient"]),
        transl=jnp.asarray(fits["transl"]) if "transl" in fits else None,
    )
    v2v = float(np.sqrt(((np.asarray(rec["vertices"]) - np.asarray(out["vertices"])) ** 2).sum(-1)).mean())
    assert v2v < 0.05, f"CLI fit v2v too high: {v2v}"


@pytest.mark.slow
def test_fitting_noisy_targets_and_perturbed_template(rng):
    """Harsher benchmark (VERDICT r2 #7): the source meshes come from a
    PERTURBED template (simulating a different body model's surface) with
    per-vertex noise — the staged per-part pipeline must still recover the
    pose to a v2v error of the same order as the corruption."""
    import dataclasses

    model = _with_faces(make_random_model(n_vertices=48, n_joints=6, n_betas=4))
    gt = {
        "betas": jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)) * 0.5,
        "global_orient": jnp.asarray((rng.standard_normal((2, 3)) * 0.3).astype(np.float32)),
        "body_pose": jnp.asarray((rng.standard_normal((2, 15)) * 0.3).astype(np.float32)),
        "transl": jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32)) * 0.3,
    }
    # "foreign" source model: template shifted by a smooth field
    src_model = dataclasses.replace(
        model,
        v_template=model.v_template
        + jnp.asarray((rng.standard_normal((48, 3)) * 2e-3).astype(np.float32)),
    )
    target = src_model(
        betas=gt["betas"], body_pose=gt["body_pose"],
        global_orient=gt["global_orient"], transl=gt["transl"],
    )["vertices"]
    noise = rng.standard_normal(target.shape).astype(np.float32) * 1e-3
    noisy = np.asarray(target) + noise

    params, losses = run_fitting(
        model, noisy,
        cfg=FitConfig(vertex_steps=400, lr=0.03, per_part=True, part_steps=30,
                      transl_steps=80),
    )
    fit_v = model(
        betas=params["betas"], body_pose=params["body_pose"],
        global_orient=params["global_orient"], transl=params["transl"],
    )["vertices"]
    # v2v error bounded by the corruption scale (template 2e-3 + noise 1e-3),
    # the "mm-level" criterion at this model's unit scale
    err = float(jnp.mean(jnp.linalg.norm(fit_v - jnp.asarray(noisy), axis=-1)))
    assert err < 8e-3, f"v2v error {err} vs corruption ~3e-3"
    # and pose params land near the ground truth
    pose_err = float(jnp.abs(params["body_pose"] - gt["body_pose"]).mean())
    assert pose_err < 0.15, pose_err


@pytest.mark.slow
def test_fitting_mask_ids(rng):
    """mask_ids restricts the vertex objective to a subset (reference
    f_sel/mask_ids, transfer_model.py:283-290): corrupting vertices OUTSIDE
    the mask must not disturb the fit."""
    # faces partitioned at the mask boundary (like a real body part split:
    # reference f_sel keeps faces touching mask ids, so edges never reach
    # the excluded region when no face crosses it)
    import dataclasses

    base = make_random_model(n_vertices=48, n_joints=6, n_betas=4)
    r2 = np.random.default_rng(7)
    f_in = r2.choice(40, (120, 3))
    f_out = 40 + r2.choice(8, (24, 3))
    faces = np.concatenate([f_in, f_out])
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (
        faces[:, 0] != faces[:, 2]
    )
    model = dataclasses.replace(base, faces=faces[ok].astype(np.int64))
    gt_pose = jnp.asarray((rng.standard_normal((1, 15)) * 0.2).astype(np.float32))
    target = np.asarray(
        model(betas=jnp.zeros((1, 4)), body_pose=gt_pose)["vertices"]
    )
    mask_ids = np.arange(40)  # fit on the first 40 vertices
    corrupted = target.copy()
    corrupted[:, 40:] += 10.0  # garbage outside the mask

    params, losses = run_fitting(
        model, corrupted, mask_ids=mask_ids,
        cfg=FitConfig(vertex_steps=300, lr=0.03, per_part=False,
                      edge_steps=200, transl_steps=50),
    )
    fit_v = np.asarray(
        model(betas=params["betas"], body_pose=params["body_pose"],
              global_orient=params["global_orient"], transl=params["transl"]
              )["vertices"]
    )
    err = float(np.linalg.norm(fit_v[:, :40] - target[:, :40], axis=-1).mean())
    assert err < 0.02, f"masked fit error {err}"
