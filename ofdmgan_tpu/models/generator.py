"""Mini 1-D U-Net generator — flax.linen, channels-last, MXU-lowered convs.

Behavioral parity target: reference models/generator.py:83-233
(MiniGenerator). Same architecture contract (proof/verification.py:60-66):

    Input [B, L, 2] -> Enc1 (2->4, k3, s2) -> Bottleneck (4->8, k3, s2)
    -> NN-upsample x2 -> Dec1 (8->4, k3, s1) -> +skip(Enc1)
    -> NN-upsample x2 -> OutConv (4->2, k3, s1) -> tanh -> [B, L, 2]

LeakyReLU(0.2) after every conv except the tanh output; additive skip;
Xavier-uniform weights, zero biases; 258 parameters, 1728 MACs per 16-sample
frame. This implementation uses channels-last [B, L, C] (TPU layout) and, by
default, lowers each micro-conv to one structured dense matmul
(ops/dense_conv.py) so the whole forward rides the MXU; ``use_matmul=False``
selects lax's native convolution (identical numerics, used for
cross-checking).
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn import leaky_relu

from ..ops.dense_conv import conv1d_via_matmul, upsample_nearest_2x

_XAVIER = nn.initializers.xavier_uniform()
_ZEROS = nn.initializers.zeros_init()


class ConvBlock(nn.Module):
    """Conv1d + LeakyReLU (reference models/generator.py:37-80)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    leaky_slope: float = 0.2
    use_matmul: bool = True
    qat: bool = False
    act_dtype: str | None = None  # activation STORAGE dtype (e.g. "bfloat16")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv1d(
            self,
            x,
            self.features,
            self.kernel,
            self.stride,
            self.padding,
            self.use_matmul,
            qat=self.qat,
        )
        y = leaky_relu(y, negative_slope=self.leaky_slope)
        # bf16 STORAGE halves the HBM traffic of materialized activations
        # (and of their cotangents) — the fused train step is HBM-bound
        # (results/perf_hlo_analysis.json: 42 KB logical bytes/frame).
        # Matmuls still accumulate f32 on f32 weights (dense_conv).
        if self.act_dtype is not None:
            y = y.astype(self.act_dtype)
        return y


def q17_ste(w: jnp.ndarray) -> jnp.ndarray:
    """Q1.7 straight-through fake-quantization for QAT: clip to the
    representable range [-1, 127/128] and round to 1/128 steps in the
    forward pass, identity gradient. Training under this constraint makes
    the exported Q1.7 weight ROM faithful to the float model (without it,
    trained kernels exceed +-1 and the ROM clips them — see
    results/RESULTS.md)."""
    q = jnp.clip(jnp.round(w * 128.0), -128, 127) / 128.0
    return w + jax.lax.stop_gradient(q - w)


def q88_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Q8.8 straight-through activation quantization (1/256 steps)."""
    q = jnp.clip(jnp.round(x * 256.0), -32768, 32767) / 256.0
    return x + jax.lax.stop_gradient(q - x)


def conv1d(
    module: nn.Module,
    x: jnp.ndarray,
    features: int,
    kernel: int,
    stride: int,
    padding: int,
    use_matmul: bool,
    name: str = "conv",
    qat: bool = False,
) -> jnp.ndarray:
    """Parameter-compatible conv1d with two lowerings.

    Parameters are always stored in flax's native ``[K, C_in, C_out]``
    kernel layout so checkpoints are lowering-agnostic. ``qat=True``
    applies Q1.7 weight / Q8.8 bias+activation fake quantization (STE).
    """
    if use_matmul:
        w = module.param(f"{name}_kernel", _XAVIER, (kernel, x.shape[-1], features))
        b = module.param(f"{name}_bias", _ZEROS, (features,))
        if qat:
            x = q88_ste(x)
            w = q17_ste(w)
            b = q88_ste(b)
        return conv1d_via_matmul(x, w, b, stride, padding)
    if qat:
        raise NotImplementedError("QAT requires the matmul lowering")
    return nn.Conv(
        features=features,
        kernel_size=(kernel,),
        strides=(stride,),
        padding=((padding, padding),),
        kernel_init=_XAVIER,
        bias_init=_ZEROS,
        name=name,
    )(x)


class MiniGenerator(nn.Module):
    """2 -> 4 -> 8 -> 4 -> 2 channel mini U-Net over ``frame_length`` samples.

    ``frame_length`` must be divisible by 4 (two stride-2 encoders). The
    channel widths are parameterized so the same module family covers the
    scaled designs (rtl/ofdmGAN/README.md:196-206 scaling table).
    """

    input_channels: int = 2
    output_channels: int = 2
    frame_length: int = 16
    enc1_channels: int = 4
    bottleneck_channels: int = 8
    dec1_channels: int = 4
    leaky_slope: float = 0.2
    use_matmul: bool = True
    qat: bool = False  # train under Q1.7/Q8.8 fake quantization
    rtl_faithful: bool = False  # train against the RTL's exact op semantics
    act_dtype: str | None = None  # activation storage dtype ("bfloat16")
    # Opt-in input-level residual head: y = x + out_conv(...) with NO tanh.
    # The reference architecture (tanh output, skip taps enc1 activations,
    # generator.py:157-208) cannot represent the identity map, which caps
    # its SNR-averaged L1 ABOVE the identity baseline at L=16
    # (results/RESULTS.md §Identity baselines). This one-line extension
    # removes that ceiling at the same 258-param budget. Composed with
    # rtl_faithful it trains the RTL-RESIDUAL hardware datapath (clamp-tanh
    # stage replaced by a saturating input adder — intsim "rtl_residual",
    # bit-exact vs native/fixsim.cpp).
    input_residual: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """``x``: noisy I/Q frames ``[B, L, C_in]`` -> enhanced ``[B, L, C_out]``.

        ``rtl_faithful=True`` swaps in the HARDWARE's op semantics so the
        deployed RTL datapath is what gets trained (composes with ``qat``):
        LeakyReLU slope 0.3125 (the RTL's (x>>>2)+(x>>>4),
        generator_mini.v:359-361), center-tap-only output conv
        (generator_mini.v:73), and tanh-as-clamp (generator_mini.v:630-648).
        Parameter count stays 258 (the masked output-conv taps remain
        parameters; the ROM never stores them)."""
        slope = 0.3125 if self.rtl_faithful else self.leaky_slope
        mk = dict(leaky_slope=slope, use_matmul=self.use_matmul,
                  qat=self.qat, act_dtype=self.act_dtype)
        enc1 = ConvBlock(self.enc1_channels, stride=2, name="enc1", **mk)(x)
        bneck = ConvBlock(self.bottleneck_channels, stride=2, name="bottleneck", **mk)(enc1)
        up1 = upsample_nearest_2x(bneck)
        dec1 = ConvBlock(self.dec1_channels, stride=1, name="dec1", **mk)(up1)
        skip = dec1 + enc1
        up2 = upsample_nearest_2x(skip)
        if self.rtl_faithful:
            w = self.param("out_conv_kernel", _XAVIER, (3, self.dec1_channels, self.output_channels))
            b = self.param("out_conv_bias", _ZEROS, (self.output_channels,))
            mask = jnp.zeros((3, 1, 1)).at[1].set(1.0)  # center tap only
            w = w * mask
            if self.qat:
                up2 = q88_ste(up2)
                w = q17_ste(w)
                b = q88_ste(b)
            out = conv1d_via_matmul(up2, w, b, 1, 1)
            if self.input_residual:
                # RTL-residual output stage: saturating input add replaces
                # the clamp-tanh (intsim mode "rtl_residual"; the hardware
                # sat16 at ±128.0 Q8.8 is inactive for normalized signals).
                # explicit upcast: matches implicit promotion for bf16
                # storage; fp8 storage has no implicit promotion path
                return x.astype(out.dtype) + out
            # hardware tanh = clamp: >1 -> 255/256, < -1 -> -255/256
            return jnp.where(out > 1.0, 255.0 / 256.0,
                             jnp.where(out < -1.0, -255.0 / 256.0, out))
        out = conv1d(
            self, up2, self.output_channels, 3, 1, 1, self.use_matmul,
            name="out_conv", qat=self.qat,
        )
        if self.input_residual:
            return x.astype(out.dtype) + out
        return jnp.tanh(out)

    def layer_info(self) -> List[Dict[str, Any]]:
        """Layer table for docs/diagrams (reference models/generator.py:210-221)."""
        l = self.frame_length
        return [
            {"name": "enc1", "in_ch": self.input_channels, "out_ch": self.enc1_channels, "stride": 2, "length": l // 2},
            {"name": "bottleneck", "in_ch": self.enc1_channels, "out_ch": self.bottleneck_channels, "stride": 2, "length": l // 4},
            {"name": "upsample1", "scale": 2, "length": l // 2},
            {"name": "dec1", "in_ch": self.bottleneck_channels, "out_ch": self.dec1_channels, "stride": 1, "length": l // 2},
            {"name": "skip_add", "channels": self.dec1_channels, "length": l // 2},
            {"name": "upsample2", "scale": 2, "length": l},
            {"name": "out_conv", "in_ch": self.dec1_channels, "out_ch": self.output_channels, "stride": 1, "length": l},
            {"name": "tanh", "length": l},
        ]

    def estimate_macs(self) -> int:
        """MACs per frame (reference models/generator.py:227-233)."""
        l = self.frame_length
        return (
            3 * self.input_channels * self.enc1_channels * (l // 2)
            + 3 * self.enc1_channels * self.bottleneck_channels * (l // 4)
            + 3 * self.bottleneck_channels * self.dec1_channels * (l // 2)
            + 3 * self.dec1_channels * self.output_channels * l
        )


# Alias kept for API parity with the reference (models/generator.py:237).
UNetGenerator = MiniGenerator


def create_generator(config: dict | None = None) -> MiniGenerator:
    """Factory mirroring reference models/generator.py:240-250."""
    config = config or {}
    return MiniGenerator(
        input_channels=config.get("input_channels", 2),
        output_channels=config.get("output_channels", 2),
        frame_length=config.get("frame_length", 16),
        enc1_channels=config.get("enc1_channels", 4),
        bottleneck_channels=config.get("bottleneck_channels", 8),
        dec1_channels=config.get("dec1_channels", 4),
        leaky_slope=config.get("leaky_slope", 0.2),
    )


def count_parameters(params) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
