"""Pose-estimator evaluation harness: 3DPW / SKI / AGORA / 3DHP.

Capability parity with the reference's evaluation stack
(core/PW3D.py:20-182 `PW3D` dataset; run_gan.py:1509-1634 `evaluate`
MPJPE / PA-MPJPE / PCK / posed+unposed mesh errors with gendered SMPL GT;
render_3dpw_testset.py:1917-3016 SKI/AGORA/3DHP variants). The per-batch
metric computation is one jitted function; datasets are host-side iterators
over annotation npz files + image crops.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.data.imutils import crop, normalize_for_spin
from posegen_tpu.evals.pose import pck, procrustes_align
from posegen_tpu.gen.hmr import hmr_apply
from posegen_tpu.utils.constants import H36M_TO_J14, PW3D_TEST_SEQS


@dataclasses.dataclass
class PoseEvalDataset:
    """Annotation-npz-driven eval set (the PW3D/SKI/AGORA/3DHP formats all
    store imgname/center/scale/pose/shape[/gender] arrays, reference
    PW3D.py:30-77)."""

    annot_files: Sequence[str]
    img_dir: str
    res: int = 224
    has_gender: bool = True

    def __post_init__(self):
        names, centers, scales, poses, betas, genders = [], [], [], [], [], []
        for f in self.annot_files:
            d = np.load(f, allow_pickle=True)
            names.extend([str(x) for x in d["imgname"]])
            centers.append(np.asarray(d["center"], np.float32))
            scales.append(np.asarray(d["scale"], np.float32))
            poses.append(np.asarray(d["pose"], np.float32))
            betas.append(np.asarray(d["shape"], np.float32))
            if self.has_gender and "gender" in d:
                genders.append(
                    np.array([0 if str(g).startswith("m") else 1 for g in d["gender"]])
                )
            else:
                genders.append(np.zeros(len(d["center"]), np.int32))
        self.imgnames = names
        self.centers = np.concatenate(centers)
        self.scales = np.concatenate(scales)
        self.poses = np.concatenate(poses)
        self.betas = np.concatenate(betas)
        self.genders = np.concatenate(genders).astype(np.int32)

    def __len__(self) -> int:
        return len(self.imgnames)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import imageio.v2 as imageio

        img = imageio.imread(os.path.join(self.img_dir, self.imgnames[i]))[..., :3]
        c = crop(img, self.centers[i], self.scales[i], (self.res, self.res))
        return {
            "image": normalize_for_spin(c),
            "pose": self.poses[i],
            "betas": self.betas[i],
            "gender": self.genders[i],
        }

    def batches(self, batch_size: int = 32) -> Iterator[Dict[str, np.ndarray]]:
        for s in range(0, len(self), batch_size):
            items = [self[i] for i in range(s, min(s + batch_size, len(self)))]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


def pw3d_dataset(annot_dir: str, img_dir: str, res: int = 224) -> PoseEvalDataset:
    """The 3DPW test split (reference PW3D('3dpw'), core/PW3D.py:20)."""
    files = [
        os.path.join(annot_dir, f"{s}.npz")
        for s in PW3D_TEST_SEQS
        if os.path.exists(os.path.join(annot_dir, f"{s}.npz"))
    ]
    if not files:  # single-file variants (ski/agora style)
        files = sorted(
            os.path.join(annot_dir, f)
            for f in os.listdir(annot_dir)
            if f.endswith(".npz")
        )
    return PoseEvalDataset(files, img_dir, res=res)


class SpinEvaluator:
    """MPJPE / PA-MPJPE / PCK / mesh errors for an HMR model
    (reference evaluate.test, run_gan.py:1586-1634).

    smpl_neutral/male/female: posegen_tpu.body.SMPLModel instances;
    J_regressor: (17, V) H36M joint regressor.
    """

    def __init__(
        self,
        hmr_params,
        hmr_state,
        smpl_neutral,
        smpl_male=None,
        smpl_female=None,
        J_regressor: Optional[np.ndarray] = None,
    ):
        self.hmr_params = hmr_params
        self.hmr_state = hmr_state
        self.smpl_neutral = smpl_neutral
        self.smpl_male = smpl_male or smpl_neutral
        self.smpl_female = smpl_female or smpl_neutral
        self.J_reg = (
            jnp.asarray(J_regressor, jnp.float32) if J_regressor is not None else None
        )
        self._step = jax.jit(self._batch_metrics)

    def _joints14(self, vertices: jax.Array) -> jax.Array:
        j = jnp.einsum("jv,bvc->bjc", self.J_reg, vertices)
        pelvis = j[:, :1]
        return j[:, jnp.asarray(H36M_TO_J14)] - pelvis

    def _batch_metrics(self, hmr_params, hmr_state, images, gt_pose, gt_betas, gender):
        pred_rotmat, pred_betas, _, _ = hmr_apply(hmr_params, hmr_state, images)
        pred = self.smpl_neutral(
            betas=pred_betas,
            body_pose=pred_rotmat[:, 1:],
            global_orient=pred_rotmat[:, :1],
            pose2rot=False,
        )
        gt_m = self.smpl_male(
            betas=gt_betas, body_pose=gt_pose[:, 3:], global_orient=gt_pose[:, :3]
        )
        gt_f = self.smpl_female(
            betas=gt_betas, body_pose=gt_pose[:, 3:], global_orient=gt_pose[:, :3]
        )
        is_f = (gender == 1)[:, None, None]
        gt_vts = jnp.where(is_f, gt_f["vertices"], gt_m["vertices"])

        pred_j = self._joints14(pred["vertices"])
        gt_j = self._joints14(gt_vts)

        err = jnp.sqrt(jnp.sum((pred_j - gt_j) ** 2, -1) + 1e-12)
        mpjpe = jnp.mean(err, -1)
        aligned = procrustes_align(pred_j, gt_j)
        pa_err = jnp.sqrt(jnp.sum((aligned - gt_j) ** 2, -1) + 1e-12)
        pa_mpjpe = jnp.mean(pa_err, -1)

        # mesh errors: posed, and unposed (identity rotations, shape only)
        pme = jnp.mean(
            jnp.sqrt(jnp.sum((pred["vertices"] - gt_vts) ** 2, -1) + 1e-12), -1
        )
        eye = jnp.broadcast_to(jnp.eye(3), (*pred_rotmat.shape[:2], 3, 3))
        up_pred = self.smpl_neutral(
            betas=pred_betas, body_pose=eye[:, 1:], global_orient=eye[:, :1],
            pose2rot=False,
        )["vertices"]
        up_gt_m = self.smpl_male(
            betas=gt_betas, body_pose=eye[:, 1:], global_orient=eye[:, :1],
            pose2rot=False,
        )["vertices"]
        up_gt_f = self.smpl_female(
            betas=gt_betas, body_pose=eye[:, 1:], global_orient=eye[:, :1],
            pose2rot=False,
        )["vertices"]
        up_gt = jnp.where(is_f, up_gt_f, up_gt_m)
        ume = jnp.mean(jnp.sqrt(jnp.sum((up_pred - up_gt) ** 2, -1) + 1e-12), -1)

        return {"mpjpe": mpjpe, "pa_mpjpe": pa_mpjpe, "pa_err": pa_err,
                "pme": pme, "ume": ume}

    def inference(self, batches) -> Dict[str, float]:
        """Run the full set; prints Final Results like run_gan.py:1572-1581."""
        acc: Dict[str, List[np.ndarray]] = {}
        for b in batches:
            out = self._step(
                self.hmr_params, self.hmr_state,
                jnp.asarray(b["image"]), jnp.asarray(b["pose"]),
                jnp.asarray(b["betas"]), jnp.asarray(b["gender"]),
            )
            for k, v in out.items():
                acc.setdefault(k, []).append(np.asarray(v))
        err_all = np.concatenate(acc["pa_err"]).reshape(-1)
        results = {
            "mpjpe": float(np.mean(np.concatenate(acc["mpjpe"]))) * 1000.0,
            "pa_mpjpe": float(np.mean(np.concatenate(acc["pa_mpjpe"]))) * 1000.0,
            "pck": float(pck(jnp.asarray(err_all))),
            "posed_mesh_error": float(np.mean(np.concatenate(acc["pme"]))),
            "unposed_mesh_error": float(np.mean(np.concatenate(acc["ume"]))),
        }
        print("== Final Results ==")
        for k, v in results.items():
            print(f"{k}: {v:.4f}")
        return results
