"""Checkpointing: native save/restore + PyTorch .tar import for parity runs.

Native format: a single .npz per step holding the flattened train state
(key-path -> array) — resumable, host-portable, no framework lock-in. The
auto-resume glob mirrors the reference (latest checkpoint in the log dir,
reference core/raycasters.py:124-142).

Torch import: the reference saves `torch.save({...global_step,
optimizer_state_dict, poseopt_layer_state_dict, network_fn_state_dict,
network_fine_state_dict, embed/embeddirs/embedbones_state_dict...})`
(core/trainer.py:487-518, key mangling core/raycasters.py:752-766).
`import_torch_checkpoint` maps those tensors onto our pytree — transposing
Linear weights (torch stores (out, in), we apply x @ W) — so renders from
reference-trained weights can be PSNR-compared.
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# native npz checkpoints
# ---------------------------------------------------------------------------

_SEP = "//"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{_SEP}{i}" if prefix else str(i)))
    elif hasattr(tree, "_fields"):  # NamedTuple (TrainState, optax states)
        for k in tree._fields:
            v = getattr(tree, k)
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    elif tree is None:
        pass
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    """Rebuild a pytree with the template's structure and the npz's values."""
    if isinstance(template, dict):
        return {
            k: _unflatten_into(v, flat, f"{prefix}{_SEP}{k}" if prefix else str(k))
            for k, v in template.items()
        }
    if hasattr(template, "_fields"):
        vals = {
            k: _unflatten_into(
                getattr(template, k), flat, f"{prefix}{_SEP}{k}" if prefix else str(k)
            )
            for k in template._fields
        }
        return type(template)(**vals)
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten_into(v, flat, f"{prefix}{_SEP}{i}" if prefix else str(i))
            for i, v in enumerate(template)
        ]
        return type(template)(seq) if isinstance(template, list) else tuple(seq)
    if template is None:
        return None
    if prefix not in flat:
        raise KeyError(f"checkpoint missing key {prefix!r}")
    return jnp.asarray(flat[prefix])


def save_checkpoint(log_dir: str, state: Any, step: Optional[int] = None) -> str:
    """Write logs/{exp}/{step:08d}.ckpt.npz (analog of the reference's
    {i:06d}.tar, trainer.py:487-508)."""
    os.makedirs(log_dir, exist_ok=True)
    if step is None:
        step = int(np.asarray(state.step))
    path = os.path.join(log_dir, f"{step:08d}.ckpt.npz")
    np.savez(path, **_flatten(state))
    return path


def latest_checkpoint(log_dir: str) -> Optional[str]:
    ckpts = sorted(glob(os.path.join(log_dir, "*.ckpt.npz")))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a train state given a same-structure template
    (e.g. a freshly built state)."""
    flat = dict(np.load(path))
    return _unflatten_into(template, flat)


# ---------------------------------------------------------------------------
# PyTorch .tar import
# ---------------------------------------------------------------------------

def _torch_linear(sd: Dict, name: str) -> Dict[str, jnp.ndarray]:
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{name}.bias"], dtype=np.float32)
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}  # (out,in) -> (in,out)


def _import_nerf_net(sd: Dict) -> Dict[str, Any]:
    """One reference NeRF state dict -> our params subtree
    (param names from reference core/networks/nerf.py:46-88)."""
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"pts_linears\.(\d+)\.weight", k))
    )
    params: Dict[str, Any] = {
        "pts_linears": [_torch_linear(sd, f"pts_linears.{i}") for i in range(n_layers)]
    }
    for name in ("alpha_linear", "feature_linear", "rgb_linear", "output_linear"):
        if f"{name}.weight" in sd:
            params[name] = _torch_linear(sd, name)
    view_idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"views_linears\.(\d+)\.weight", k))
    )
    if view_idxs:
        params["views_linears"] = [
            _torch_linear(sd, f"views_linears.{i}") for i in view_idxs
        ]
    if "framecodes.codes.weight" in sd:
        params["framecodes"] = jnp.asarray(
            np.asarray(sd["framecodes.codes.weight"], dtype=np.float32)
        )
    return params


def _import_embed(sd: Dict) -> Dict[str, jnp.ndarray]:
    out = {}
    if "tau" in sd:
        out["tau"] = jnp.asarray(np.asarray(sd["tau"], dtype=np.float32))
    if "cutoff_dist" in sd:
        out["cutoff_dist"] = jnp.asarray(np.asarray(sd["cutoff_dist"], dtype=np.float32))
    out["alpha"] = jnp.asarray(
        np.asarray(sd.get("sched_alpha", 0.0), dtype=np.float32)
    )
    return out


def import_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .tar -> (variables, extras).

    variables: {'coarse', 'fine', 'embed_kp', 'embed_view', 'embed_bone'}
    ready for render_rays. extras: {'global_step', 'pose_params'} when present.
    Requires torch (CPU) for deserialization only.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda d: {k: v.numpy() if hasattr(v, "numpy") else v for k, v in d.items()}

    variables: Dict[str, Any] = {}
    if "network_fn_state_dict" in ckpt:
        variables["coarse"] = _import_nerf_net(to_np(ckpt["network_fn_state_dict"]))
    if ckpt.get("network_fine_state_dict"):
        variables["fine"] = _import_nerf_net(to_np(ckpt["network_fine_state_dict"]))
    for src, dst in (
        ("embed_state_dict", "embed_kp"),
        ("embeddirs_state_dict", "embed_view"),
        ("embedbones_state_dict", "embed_bone"),
    ):
        # empty state dicts still count (a no-cutoff Embedder has no buffers,
        # but render_rays indexes the state unconditionally)
        if ckpt.get(src) is not None:
            variables[dst] = _import_embed(to_np(ckpt[src]))

    extras: Dict[str, Any] = {"global_step": int(ckpt.get("global_step", 0))}
    popt = ckpt.get("poseopt_layer_state_dict")
    if popt:
        popt = to_np(popt)
        pose = {}
        for k in ("pelvis", "bones", "root_bones"):
            if k in popt:
                pose[k] = jnp.asarray(np.asarray(popt[k], dtype=np.float32))
        extras["pose_params"] = pose
        # multiview layers carry their sharing maps as long buffers
        # (reference pose_opt.py:258-260); surface them so gather_pose_rows
        # can consume an imported multiview checkpoint directly
        for k in ("kp_map", "kp_uidxs"):
            if k in popt:
                extras[k] = jnp.asarray(np.asarray(popt[k], dtype=np.int64))
    return variables, extras


# ---------------------------------------------------------------------------
# PyTorch .tar export (the import's inverse: migration back OUT of this
# framework, so reference tooling can consume checkpoints trained here)
# ---------------------------------------------------------------------------

def _export_linear(p: Dict) -> Dict[str, "object"]:
    """Our {'w': (in,out), 'b': (out,)} -> torch Linear tensors (out,in)/(out,)."""
    import torch

    return {
        "weight": torch.tensor(np.asarray(p["w"], dtype=np.float32).T),
        "bias": torch.tensor(np.asarray(p["b"], dtype=np.float32)),
    }


def _export_nerf_net(params: Dict) -> "object":
    """Our params subtree -> the reference NeRF module's state dict
    (param names from reference core/networks/nerf.py:69-88)."""
    import torch

    sd = {}
    for i, lay in enumerate(params["pts_linears"]):
        for k, v in _export_linear(lay).items():
            sd[f"pts_linears.{i}.{k}"] = v
    for i, lay in enumerate(params.get("views_linears", [])):
        for k, v in _export_linear(lay).items():
            sd[f"views_linears.{i}.{k}"] = v
    for name in ("alpha_linear", "feature_linear", "rgb_linear", "output_linear"):
        if name in params:
            for k, v in _export_linear(params[name]).items():
                sd[f"{name}.{k}"] = v
    if "framecodes" in params:
        sd["framecodes.codes.weight"] = torch.tensor(
            np.asarray(params["framecodes"], dtype=np.float32)
        )
    return sd


def _export_embed(state: Optional[Dict], ecfg) -> Dict:
    """Our embed state -> the reference CutoffEmbedder's state dict. A
    cutoff-less Embedder has NO params/buffers (reference
    cutoff_embedder.py:91-99 registers cutoff_dist/tau only on the cutoff
    class, sched_alpha only under freq_schedule) — emit exactly the keys the
    module owns so the reference's strict load_state_dict accepts them."""
    import torch

    sd: Dict = {}
    if state is None or ecfg is None or not getattr(ecfg, "cutoff", False):
        return sd
    sd["cutoff_dist"] = torch.tensor(
        np.asarray(state["cutoff_dist"], dtype=np.float32)
    )
    sd["tau"] = torch.tensor(np.float32(np.asarray(state["tau"])))
    if getattr(ecfg, "freq_schedule", False):
        sd["sched_alpha"] = torch.tensor(np.float32(np.asarray(state["alpha"])))
    return sd


def export_torch_checkpoint(
    path: str,
    variables: Dict[str, Any],
    cfg,
    global_step: int = 0,
    pose_params: Optional[Dict] = None,
    rest_pose: Optional[np.ndarray] = None,
    opt_pose_lrate: float = 5e-4,
    kp_map: Optional[np.ndarray] = None,
    kp_uidxs: Optional[np.ndarray] = None,
) -> str:
    """Write a reference-format .tar (inverse of import_torch_checkpoint).

    Key scheme = reference Trainer.save_nerf (core/trainer.py:487-508) +
    RayCaster.state_dict mangling (core/raycasters.py:752-766):
    network_fn/network_fine/embed/embeddirs/embedbones _state_dict entries,
    global_step, and — when pose_params is given — poseopt_layer_state_dict
    (pelvis/bones + the rest_pose buffer the strict load expects,
    pose_opt.py:279-295) with a fresh pose_optimizer_state_dict
    (pose_opt.py:54-55 loads it unconditionally). optimizer_state_dict is
    omitted: the reference treats it as optional
    (run_nerf_helpers.py:14-15) and resumes with a fresh Adam.

    variables: the render params tree ({'coarse','fine','embed_kp',
    'embed_view','embed_bone'}); cfg: our RaycastConfig (supplies each
    embedder's cutoff/freq_schedule so only buffers the reference module
    owns are emitted). Requires torch (CPU) for serialization only.
    """
    import torch

    ckpt: Dict[str, Any] = {
        "global_step": int(global_step),
        "network_fn_state_dict": _export_nerf_net(variables["coarse"]),
    }
    if "fine" in variables:
        ckpt["network_fine_state_dict"] = _export_nerf_net(variables["fine"])
    for src, dst, ecfg in (
        ("embed_kp", "embed_state_dict", cfg.embed_kp_cfg),
        ("embed_view", "embeddirs_state_dict", cfg.embed_view_cfg),
        ("embed_bone", "embedbones_state_dict", cfg.embed_bone_cfg),
    ):
        if src in variables:
            ckpt[dst] = _export_embed(variables[src], ecfg)
    if pose_params is not None:
        if rest_pose is None:
            raise ValueError(
                "pose export needs rest_pose: the reference PoseOptLayer's "
                "strict load expects its rest_pose buffer in the state dict"
            )
        t = lambda a: torch.tensor(np.asarray(a, dtype=np.float32))
        popt_sd = {k: t(v) for k, v in pose_params.items()}
        # the reference layer registers rest_pose as (1, J, 3)
        # (pose_opt.py:249 "rest_pose: (1, N_joints, 3)"); a (J, 3) buffer
        # fails its strict load with a size mismatch
        rp = np.asarray(rest_pose, dtype=np.float32)
        popt_sd["rest_pose"] = t(rp[None] if rp.ndim == 2 else rp)
        if "root_bones" in pose_params:
            # multiview layout: the reference PoseOptLayer registers kp_map/
            # kp_uidxs as long buffers (pose_opt.py:258-260) and its strict
            # load_state_dict / load_poseopt_from_state_dict (pose_opt.py:
            # 222-226) require them in the checkpoint
            if kp_map is None or kp_uidxs is None:
                raise ValueError(
                    "multiview pose export (root_bones present) needs "
                    "kp_map and kp_uidxs — the reference PoseOptLayer "
                    "stores them as buffers in its state dict"
                )
            popt_sd["kp_map"] = torch.tensor(np.asarray(kp_map)).long()
            popt_sd["kp_uidxs"] = torch.tensor(np.asarray(kp_uidxs)).long()
        ckpt["poseopt_layer_state_dict"] = popt_sd
        # a fresh Adam over the layer's parameter list, exactly as
        # create_popt builds it (pose_opt.py:43-46)
        dummy = [torch.nn.Parameter(t(pose_params[k]))
                 for k in pose_params]
        ckpt["pose_optimizer_state_dict"] = torch.optim.Adam(
            dummy, lr=opt_pose_lrate, betas=(0.9, 0.999)
        ).state_dict()
    torch.save(ckpt, path)
    return path


def load_pose_params(path: str) -> Dict[str, jnp.ndarray]:
    """Pose params from a pose/full checkpoint — native .npz or torch .tar
    (reference --init_poseopt / load_poseopt_from_state_dict,
    pose_opt.py:212)."""
    if path.endswith(".tar"):
        _, extras = import_torch_checkpoint(path)
        if "pose_params" not in extras:
            raise KeyError(f"{path} carries no poseopt state")
        return extras["pose_params"]
    flat = dict(np.load(path))
    out = {
        k.split("//", 1)[1]: jnp.asarray(v)
        for k, v in flat.items()
        if k.startswith("pose_params//")
    }
    if not out:
        raise KeyError(f"{path} carries no pose_params")
    return out


def save_pose_checkpoint(log_dir: str, state: Any, step: Optional[int] = None) -> str:
    """Pose-only checkpoint (reference save_popt, trainer.py:510-518:
    poseopt layer + anchors saved separately every i_pose_weights)."""
    os.makedirs(log_dir, exist_ok=True)
    if step is None:
        step = int(np.asarray(state.step))
    path = os.path.join(log_dir, f"{step:08d}.pose.npz")
    flat = {}
    if state.pose_params is not None:
        flat.update(_flatten(state.pose_params, "pose_params"))
    if state.pose_anchors is not None:
        flat.update(_flatten(state.pose_anchors, "pose_anchors"))
    flat["global_step"] = np.asarray(step)
    np.savez(path, **flat)
    return path
