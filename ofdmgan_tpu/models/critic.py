"""Conditional Wasserstein critic + gradient penalty — flax.linen, channels-last.

Behavioral parity target: reference models/discriminator.py:42-236
(MiniDiscriminator, compute_gradient_penalty). Architecture contract
(proof/verification.py:172-241):

    concat(candidate[B,L,2], condition[B,L,2]) -> [B, L, 4]
    -> Conv1 (4->8, k3, s2) -> LeakyReLU
    -> Conv2 (8->16, k3, s2) -> LeakyReLU
    -> global SUM pool over time -> [B, 16]
    -> Dense(16 -> 1) -> unbounded Wasserstein score

No batch norm (WGAN-GP), sum pooling (not mean — matches the RTL sum_pool),
521 parameters. Gradient penalty: per-sample uniform interpolation between
real and fake, nested gradient of the critic score w.r.t. the interpolate,
penalty E[(||grad||_2 - 1)^2] — implemented with jax.grad/vjp instead of
torch autograd graphs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn import leaky_relu

from .generator import conv1d, _XAVIER, _ZEROS

_FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


class MiniDiscriminator(nn.Module):
    input_channels: int = 4  # candidate(2) + condition(2)
    frame_length: int = 16
    conv1_channels: int = 8
    conv2_channels: int = 16
    leaky_slope: float = 0.2
    use_matmul: bool = True
    act_dtype: str | None = None  # activation storage dtype ("bfloat16")

    @nn.compact
    def __call__(self, candidate: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        """``[B, L, 2] x [B, L, 2] -> [B, 1]`` critic score."""
        if candidate.dtype != condition.dtype and (
                candidate.dtype in _FP8_DTYPES or condition.dtype in _FP8_DTYPES):
            # mixed-storage call (the generator-loss chain passes the f32
            # generator output with the stored condition): fp8 lacks the
            # implicit promotion bf16 storage relies on — upcast explicitly
            target = (condition.dtype if candidate.dtype in _FP8_DTYPES
                      else candidate.dtype)
            candidate = candidate.astype(target)
            condition = condition.astype(target)
        x = jnp.concatenate([candidate, condition], axis=-1)
        h = conv1d(self, x, self.conv1_channels, 3, 2, 1, self.use_matmul, name="conv1")
        h = leaky_relu(h, negative_slope=self.leaky_slope)
        if self.act_dtype is not None:  # bf16 STORAGE (HBM-bound step;
            h = h.astype(self.act_dtype)  # matmuls still accumulate f32)
        h = conv1d(self, h, self.conv2_channels, 3, 2, 1, self.use_matmul, name="conv2")
        h = leaky_relu(h, negative_slope=self.leaky_slope)
        pooled = jnp.sum(h.astype(jnp.float32), axis=-2)  # sum pool in f32
        return nn.Dense(1, kernel_init=_XAVIER, bias_init=_ZEROS, name="dense")(pooled)

    def estimate_macs(self) -> int:
        """MACs per frame (reference models/discriminator.py:158-164)."""
        l = self.frame_length
        return (
            3 * self.input_channels * self.conv1_channels * (l // 2)
            + 3 * self.conv1_channels * self.conv2_channels * (l // 4)
            + self.conv2_channels * (l // 4)
            + self.conv2_channels
        )


# Aliases kept for API parity (models/discriminator.py:167-169).
Discriminator = MiniDiscriminator
ConditionalDiscriminator = MiniDiscriminator


def compute_gradient_penalty(
    critic_apply,
    params,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    condition: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """WGAN-GP 1-Lipschitz penalty (models/discriminator.py:172-236).

    ``critic_apply(params, candidate, condition) -> [B, 1]``. One epsilon per
    sample, broadcast over (L, C); gradient taken w.r.t. the interpolated
    candidate only; norm over the flattened per-sample dims.
    """
    batch = real.shape[0]
    fp8 = real.dtype in _FP8_DTYPES
    alpha = jax.random.uniform(key, (batch,) + (1,) * (real.ndim - 1), jnp.float32)
    # keep the interpolate in the inputs' STORAGE dtype (bf16 storage mode
    # would otherwise silently promote the whole GP chain back to f32);
    # fp8 storage has no implicit promotion, so its mix is computed via
    # explicit f32 upcasts (identical math — promotion does the same cast)
    if fp8:
        interp = (alpha * real.astype(jnp.float32)
                  + (1.0 - alpha) * fake.astype(jnp.float32))
    else:
        interp = alpha * real + (1.0 - alpha) * fake
    interp = interp.astype(real.dtype)

    def score_sum(x):
        return jnp.sum(critic_apply(params, x, condition))

    grads = jax.grad(score_sum)(interp)
    if fp8:
        # the cotangent arrives fp8-rounded at the storage boundary (that is
        # the lattice-consistency the mode trains under); the norm REDUCTION
        # itself must not also accumulate at 3 mantissa bits
        grads = grads.astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(grads.reshape(batch, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def create_discriminator(config: dict | None = None) -> MiniDiscriminator:
    """Factory mirroring reference models/discriminator.py:239-248."""
    config = config or {}
    return MiniDiscriminator(
        input_channels=config.get("input_channels", 4),
        frame_length=config.get("frame_length", 16),
        conv1_channels=config.get("conv1_channels", 8),
        conv2_channels=config.get("conv2_channels", 16),
        leaky_slope=config.get("leaky_slope", 0.2),
    )
