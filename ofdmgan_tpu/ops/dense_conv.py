"""Micro-conv1d as a structured dense matmul — the MXU-friendly lowering.

The reference's models are 1-D convs over 16-sample frames with 2-16
channels (reference models/generator.py:95-102). On TPU such convs are far
too small to tile the 128x128 MXU as convolutions; but each layer maps a
frame of ``L_in*C_in`` values to ``L_out*C_out`` values, both <= 64, so the
whole layer is exactly one ``[B, L_in*C_in] @ [L_in*C_in, L_out*C_out]``
matmul with a *structured* (block-sparse Toeplitz) weight matrix scattered
from the tiny conv kernel. The scatter is built from static Python loops at
trace time, costs nothing at runtime (XLA folds it into the weight tensor),
and gradients flow through it to the conv kernel. With a large batch this
keeps the GAN's entire forward/backward on the MXU.

Flattening convention: a frame ``[L, C]`` (channels-last) flattens row-major
to ``[L*C]``, i.e. index ``t*C + c``.
"""

from __future__ import annotations

import jax.numpy as jnp


def conv1d_output_length(l_in: int, kernel: int, stride: int, padding: int) -> int:
    return (l_in + 2 * padding - kernel) // stride + 1


def conv1d_dense_matrix(w: jnp.ndarray, l_in: int, stride: int, padding: int) -> jnp.ndarray:
    """Expand a conv kernel ``[K, C_in, C_out]`` into the equivalent dense
    matrix ``[L_in*C_in, L_out*C_out]`` for zero-padded strided conv1d.

    ``y.reshape(B, L_out*C_out) = x.reshape(B, L_in*C_in) @ A``.
    """
    k, cin, cout = w.shape
    l_out = conv1d_output_length(l_in, k, stride, padding)
    a = jnp.zeros((l_in * cin, l_out * cout), dtype=w.dtype)
    for t_out in range(l_out):
        for kk in range(k):
            t_in = stride * t_out - padding + kk
            if 0 <= t_in < l_in:
                a = a.at[
                    t_in * cin : (t_in + 1) * cin,
                    t_out * cout : (t_out + 1) * cout,
                ].add(w[kk])
    return a


def conv1d_via_matmul(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, stride: int, padding: int
) -> jnp.ndarray:
    """Channels-last conv1d ``[B, L, C_in] -> [B, L_out, C_out]`` lowered to a
    single dense matmul on the flattened frame."""
    batch_shape = x.shape[:-2]
    l_in, cin = x.shape[-2:]
    k, wcin, cout = w.shape
    assert wcin == cin, (wcin, cin)
    a = conv1d_dense_matrix(w, l_in, stride, padding)
    l_out = conv1d_output_length(l_in, k, stride, padding)
    y = jnp.matmul(
        x.reshape(*batch_shape, l_in * cin), a, preferred_element_type=x.dtype
    )
    y = y.reshape(*batch_shape, l_out, cout)
    if b is not None:
        y = y + b
    return y


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsample along the length axis of ``[..., L, C]``
    (reference models/generator.py:141,154 nn.Upsample mode='nearest')."""
    return jnp.repeat(x, 2, axis=-2)
