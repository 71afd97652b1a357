"""Shared torch->JAX weight-layout converters.

Every torch-checkpoint importer in the codebase (NeRF .tar, HMR/SPIN,
GAN generator/discriminators, DeepLab) needs the same three conversions;
keeping one copy avoids a transpose-convention fix landing in only some of
them.

  * Linear: torch (out, in) -> ours (in, out)
  * Conv2d: torch (out, in, kh, kw) -> NHWC/HWIO (kh, kw, in, out)
  * BatchNorm: weight/bias + running stats -> (params, state) pair
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def t_linear(sd: Dict[str, Any], name: str) -> Dict[str, jax.Array]:
    return {
        "w": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32).T),
        "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32)),
    }


def t_conv(sd: Dict[str, Any], name: str, bias: bool = False) -> Dict[str, jax.Array]:
    p = {
        "w": jnp.asarray(
            np.asarray(sd[f"{name}.weight"], np.float32).transpose(2, 3, 1, 0)
        )
    }
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))
    return p


def t_batchnorm(sd: Dict[str, Any], name: str) -> Tuple[Dict, Dict]:
    return (
        {
            "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32)),
        },
        {
            "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"], np.float32)),
        },
    )
