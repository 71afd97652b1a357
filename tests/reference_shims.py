"""Import shims that let the REFERENCE code run on CPU for parity tests.

The reference (read-only, /root/reference) imports pytorch3d and plotly,
which aren't in this image. These shims implement the handful of rotation
conversions the reference actually calls (standard formulas, in torch) and
stub plotly's graph_objects so `core.utils.skeleton_utils` imports. Used
ONLY by parity tests that compare our outputs against the reference's.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch


# ---------------------------------------------------------------------------
# pytorch3d.transforms shim (torch implementations of the used conversions)
# ---------------------------------------------------------------------------

def axis_angle_to_matrix(aa: torch.Tensor) -> torch.Tensor:
    theta = torch.linalg.norm(aa, dim=-1, keepdim=True).clamp(min=1e-12)
    axis = aa / theta
    x, y, z = axis.unbind(-1)
    zero = torch.zeros_like(x)
    K = torch.stack(
        [
            torch.stack([zero, -z, y], -1),
            torch.stack([z, zero, -x], -1),
            torch.stack([-y, x, zero], -1),
        ],
        -2,
    )
    t = theta[..., None]
    eye = torch.eye(3, dtype=aa.dtype).expand(K.shape)
    return eye + torch.sin(t) * K + (1 - torch.cos(t)) * (K @ K)


def matrix_to_axis_angle(R: torch.Tensor) -> torch.Tensor:
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def matrix_to_quaternion(R: torch.Tensor) -> torch.Tensor:
    # w,x,y,z via trace method (numerically fine for parity-test inputs)
    m = R
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    w = torch.sqrt(torch.clamp(1 + t, min=1e-12)) / 2
    x = (m[..., 2, 1] - m[..., 1, 2]) / (4 * w)
    y = (m[..., 0, 2] - m[..., 2, 0]) / (4 * w)
    z = (m[..., 1, 0] - m[..., 0, 1]) / (4 * w)
    return torch.stack([w, x, y, z], -1)


def quaternion_to_axis_angle(q: torch.Tensor) -> torch.Tensor:
    q = torch.where(q[..., :1] < 0, -q, q)
    w = q[..., 0].clamp(-1, 1)
    xyz = q[..., 1:]
    n = torch.linalg.norm(xyz, dim=-1, keepdim=True).clamp(min=1e-12)
    angle = 2 * torch.atan2(n[..., 0], w)
    return xyz / n * angle[..., None]


def axis_angle_to_quaternion(aa: torch.Tensor) -> torch.Tensor:
    theta = torch.linalg.norm(aa, dim=-1, keepdim=True).clamp(min=1e-12)
    half = theta / 2
    return torch.cat([torch.cos(half), aa / theta * torch.sin(half)], -1)


def quaternion_to_matrix(q: torch.Tensor) -> torch.Tensor:
    w, x, y, z = q.unbind(-1)
    return torch.stack(
        [
            torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


_cuda_patched = False


def _patch_cuda_to_cpu() -> None:
    """The reference hard-codes .to('cuda') (e.g. ray_utils.py:161-186);
    redirect those to CPU so the math runs in this torch-cpu image."""
    global _cuda_patched
    if _cuda_patched:
        return
    _cuda_patched = True

    def _map(a):
        if isinstance(a, (str, torch.device)) and "cuda" in str(a):
            return "cpu"
        return a

    orig_to = torch.Tensor.to

    def to_cpu(self, *args, **kwargs):
        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to_cpu
    torch.Tensor.cuda = lambda self, *a, **k: self


def install() -> None:
    """Register the pytorch3d/plotly shims in sys.modules (idempotent)."""
    _patch_cuda_to_cpu()
    if "pytorch3d" in sys.modules:
        return
    p3d = types.ModuleType("pytorch3d")
    transforms = types.ModuleType("pytorch3d.transforms")
    rc = types.ModuleType("pytorch3d.transforms.rotation_conversions")
    for mod in (transforms, rc):
        mod.axis_angle_to_matrix = axis_angle_to_matrix
        mod.matrix_to_axis_angle = matrix_to_axis_angle
        mod.matrix_to_quaternion = matrix_to_quaternion
        mod.quaternion_to_axis_angle = quaternion_to_axis_angle
        mod.axis_angle_to_quaternion = axis_angle_to_quaternion
        mod.quaternion_to_matrix = quaternion_to_matrix
    transforms.rotation_conversions = rc
    p3d.transforms = transforms
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.transforms"] = transforms
    sys.modules["pytorch3d.transforms.rotation_conversions"] = rc

    if "plotly" not in sys.modules:
        plotly = types.ModuleType("plotly")
        go = types.ModuleType("plotly.graph_objects")

        class _Stub:  # any attribute access returns a no-op factory
            def __init__(self, *a, **k):
                pass

            def __getattr__(self, name):
                return _Stub

        go.Figure = _Stub
        go.Scatter3d = _Stub
        go.Surface = _Stub
        go.Mesh3d = _Stub
        go.Layout = _Stub
        plotly.graph_objects = go
        sys.modules["plotly"] = plotly
        sys.modules["plotly.graph_objects"] = go

    if "torchgeometry" not in sys.modules:
        # the reference SPIN processor calls
        # torchgeometry.rotation_matrix_to_angle_axis on (N, 3, 4) matrices
        tg = types.ModuleType("torchgeometry")

        def rotation_matrix_to_angle_axis(rotmat: torch.Tensor) -> torch.Tensor:
            return matrix_to_axis_angle(rotmat[..., :3, :3])

        tg.rotation_matrix_to_angle_axis = rotation_matrix_to_angle_axis
        sys.modules["torchgeometry"] = tg

    if "skimage" not in sys.modules:
        # core/utils/imutils.py's final resample. skimage isn't installed;
        # the stub delegates to the SAME cv2 bilinear our data.imutils.crop
        # defaults to, so the imutils golden tests compare every piece of
        # crop arithmetic EXCEPT the resampler (the one documented numeric
        # deviation — see posegen_tpu/data/imutils.py::crop).
        ski = types.ModuleType("skimage")
        ski_t = types.ModuleType("skimage.transform")

        def resize(image, output_shape, **kwargs):
            import cv2

            return cv2.resize(
                np.asarray(image),
                (int(output_shape[1]), int(output_shape[0])),
                interpolation=cv2.INTER_LINEAR,
            )

        ski_t.resize = resize
        ski.transform = ski_t
        sys.modules["skimage"] = ski
        sys.modules["skimage.transform"] = ski_t

    # the vendored smplx package root must precede /root/reference, else
    # `import smplx` resolves to the bare /root/reference/smplx namespace dir
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/smplx")
    sys.path.insert(0, "/root/reference/pytorch-msssim")
