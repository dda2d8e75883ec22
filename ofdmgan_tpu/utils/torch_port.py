"""Port reference PyTorch checkpoints into framework params.

Loads a reference ``.pt`` checkpoint (train.py:411-430 format or a bare
state_dict) and maps its MiniGenerator/MiniDiscriminator tensors into the
flax param trees — the bridge used to evaluate the reference's trained
models inside this framework's harnesses (forward parity between the two
implementations is exact to float32 rounding; see tests/test_torch_parity).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_t2j(w: np.ndarray) -> np.ndarray:
    """torch conv1d [out, in, k] -> flax [k, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def load_torch_state_dict(path: str, which: str = "generator") -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    key = f"{which}_state_dict"
    sd = ckpt[key] if isinstance(ckpt, dict) and key in ckpt else ckpt
    return {k: v.detach().numpy() for k, v in sd.items()}


def generator_params_from_torch(sd: Dict[str, np.ndarray]) -> Any:
    """Reference MiniGenerator state_dict -> flax params (matmul lowering)."""
    import jax.numpy as jnp

    p = {
        "enc1": {
            "conv_kernel": jnp.asarray(_conv_t2j(sd["enc1.conv.weight"])),
            "conv_bias": jnp.asarray(sd["enc1.conv.bias"]),
        },
        "bottleneck": {
            "conv_kernel": jnp.asarray(_conv_t2j(sd["bottleneck.conv.weight"])),
            "conv_bias": jnp.asarray(sd["bottleneck.conv.bias"]),
        },
        "dec1": {
            "conv_kernel": jnp.asarray(_conv_t2j(sd["dec1.conv.weight"])),
            "conv_bias": jnp.asarray(sd["dec1.conv.bias"]),
        },
        "out_conv_kernel": jnp.asarray(_conv_t2j(sd["out_conv.weight"])),
        "out_conv_bias": jnp.asarray(sd["out_conv.bias"]),
    }
    return {"params": p}


def discriminator_params_from_torch(sd: Dict[str, np.ndarray]) -> Any:
    import jax.numpy as jnp

    p = {
        "conv1_kernel": jnp.asarray(_conv_t2j(sd["conv1.weight"])),
        "conv1_bias": jnp.asarray(sd["conv1.bias"]),
        "conv2_kernel": jnp.asarray(_conv_t2j(sd["conv2.weight"])),
        "conv2_bias": jnp.asarray(sd["conv2.bias"]),
        "dense": {
            "kernel": jnp.asarray(sd["dense.weight"].T),
            "bias": jnp.asarray(sd["dense.bias"]),
        },
    }
    return {"params": p}
