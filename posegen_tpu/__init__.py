"""posegen_tpu — a TPU-native articulated-human NeRF + pose-GAN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PoseGen
(mgholamikn/PoseGen, AAAI 2024): an A-NeRF-style skeleton-conditioned NeRF
renderer, per-frame pose refinement, a pose GAN with SPIN (HMR) feedback for
hard-pose mining, and the surrounding data/eval/training machinery.

Design stance (TPU-first, not a port):
  * All compute-path code is pure-functional JAX: params are pytrees, models
    are `init_*` + `apply`-style pure functions, jit/vmap/shard_map friendly.
  * Static shapes everywhere; ray sets are padded to tile multiples with mask
    lanes instead of the reference's dynamic per-image ray counts.
  * Multi-chip scaling is a 1-D `rays` mesh axis under `shard_map` with XLA
    collectives over ICI (the reference used single-process nn.DataParallel).
  * The hot render core has a fused Pallas path that keeps the MLP weights in
    VMEM and composites without HBM round-trips (replacing the reference's
    chunk/netchunk python loops).
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS / JAX_PLATFORM_NAME before any jax use: the axon TPU
# plugin in this image prepends itself to jax_platforms at jax-import time
# (env JAX_PLATFORMS=cpu still yields config 'axon,cpu' → TPU first), so a
# CLI invocation forcing CPU would still try (and, with the chip tunnel
# down, hang on) the TPU backend. jax.config.update IS honored — re-assert
# the env request there. Never clobber an explicit earlier
# jax.config.update("jax_platforms", ...) by the host application: only
# override when the live value is unset, the env request itself, or the
# plugin's self-prepension of it. Must run before the model imports below
# pull in jax.numpy.
import os as _os

_plat = _os.environ.get("JAX_PLATFORMS") or _os.environ.get("JAX_PLATFORM_NAME")
if _plat:
    import jax as _jax

    _cur = _jax.config.jax_platforms
    if _cur in (None, "", _plat) or _cur in ("axon", "axon," + _plat):
        _jax.config.update("jax_platforms", _plat)
    del _cur
del _os, _plat

from posegen_tpu.skeleton.skeleton import (  # noqa: F401
    Skeleton,
    SMPL_SKELETON,
    SMPL_REST_POSE,
)
