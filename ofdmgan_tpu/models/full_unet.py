"""Full-scale U-Net generator family (the 1024-sample, 7M-param design).

Behavioral parity target: the reference's full model, reconstructed from its
checked-in export (export/generator/metadata.json — the training notebook
itself is absent from the snapshot, .MISSING_LARGE_BLOBS): a 5-level 1-D
U-Net, channels 2→32→64→128→256→512, each level = strided conv + unit
conv, two-bottleneck, additive skips at every decoder level except the
last, k=3 output conv + tanh:

    enc_i:   conv(s2) + conv(s1)       L: 1024→512→256→128→64→32
    bottle:  conv(s1) x2 @ 512ch
    dec_i:   upsample x2 + conv(s1) x2, then + enc_{5-i} skip (i<5)
    final:   conv(32→2, k3) + tanh

Layer/export names match the reference metadata exactly (enc1_1 ... final).

The critic counterpart (``FullDiscriminator``) has no reference spec (the
reference never exported it); it scales the mini critic's design: concat →
strided conv stack → global sum pool → dense.

Tensor parallelism: ``unet_param_shardings`` produces a Megatron-style
alternating column/row partitioning of the conv kernels over a ``tp`` mesh
axis (``*_1`` kernels shard C_out, ``*_2``/final kernels shard C_in), so
each level needs a single all-reduce which XLA GSPMD inserts automatically.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn import leaky_relu

from ..ops.dense_conv import upsample_nearest_2x

_XAVIER = nn.initializers.xavier_uniform()
_ZEROS = nn.initializers.zeros_init()


def _conv(features: int, stride: int, name: str) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(3,),
        strides=(stride,),
        padding=((1, 1),),
        kernel_init=_XAVIER,
        bias_init=_ZEROS,
        name=name,
    )


class _QuantConv(nn.Module):
    """Conv with per-out-channel fake-quantized kernel (STE) — identical
    param tree to ``nn.Conv`` (leaves "kernel" [k, cin, cout] / "bias"), so
    float checkpoints evaluate under the quantized forward directly."""

    features: int
    stride: int
    weight_bits: int

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        from ..quant.fakequant import fake_quantize_auto

        kernel = self.param("kernel", _XAVIER, (3, h.shape[-1], self.features))
        bias = self.param("bias", _ZEROS, (self.features,))
        kq = fake_quantize_auto(kernel, self.weight_bits,
                                per_channel=True, channel_axis=2)
        out = jax.lax.conv_general_dilated(
            h, kq, window_strides=(self.stride,), padding=((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out + bias


class FullUNetGenerator(nn.Module):
    """Channels-last ``[B, L, 2] -> [B, L, 2]``; L divisible by 2^levels.

    ``weight_bits``/``act_bits`` > 0 switch on deployment quantization
    simulation (and, through the STE, full-scale QAT): per-out-channel
    fake-quantized conv kernels (the int8 export semantics,
    quant/export.py:quantize_layer_int8 / reference utils/quantization.py:
    319-335) and dynamic per-tensor fake-quantized activations. The param
    tree is identical to the float model, so any checkpoint can be
    evaluated under either forward."""

    frame_length: int = 1024
    levels: int = 5
    base_channels: int = 32
    output_channels: int = 2
    leaky_slope: float = 0.2
    weight_bits: int = 0   # 0 = float; 8 = int8 per-channel export semantics
    act_bits: int = 0      # 0 = float; 16 = int16 dynamic per-tensor

    def _maybe_quant_act(self, h: jnp.ndarray) -> jnp.ndarray:
        if self.act_bits:
            from ..quant.fakequant import fake_quantize_auto

            return fake_quantize_auto(h, self.act_bits)
        return h

    def setup(self):
        # setup()-style so ``encode``/``decode`` can be applied as separate
        # stage functions over ONE shared param tree (pipeline parallelism,
        # parallel/pipeline.py). Submodule names come from the attribute
        # names, so the param tree (and the reference export layer-name
        # contract, metadata.json) is identical to the previous @nn.compact
        # form — flax derives param RNG from the name path, so even the
        # seeded init values are unchanged.
        widths = [self.base_channels * (2**i) for i in range(self.levels)]

        if self.weight_bits:
            def conv(w, s):
                return _QuantConv(features=w, stride=s,
                                  weight_bits=self.weight_bits)
        else:
            def conv(w, s):
                return _conv(w, s, name=None)

        for i, w in enumerate(widths):
            setattr(self, f"enc{i+1}_1", conv(w, 2))
            setattr(self, f"enc{i+1}_2", conv(w, 1))
        self.bottle1 = conv(widths[-1], 1)
        self.bottle2 = conv(widths[-1], 1)
        for i in range(self.levels):
            out_w = widths[self.levels - 2 - i] if i < self.levels - 1 else widths[0]
            setattr(self, f"dec{i+1}_1", conv(out_w, 1))
            setattr(self, f"dec{i+1}_2", conv(out_w, 1))
        self.final = conv(self.output_channels, 1)

    def encode(self, x: jnp.ndarray):
        """Pipeline stage 0: the strided encoder. Returns the bottleneck
        input plus every skip activation (the inter-stage payload)."""
        a = self.leaky_slope
        skips = []
        h = self._maybe_quant_act(x)
        for i in range(self.levels):
            h = self._maybe_quant_act(leaky_relu(getattr(self, f"enc{i+1}_1")(h), a))
            h = self._maybe_quant_act(leaky_relu(getattr(self, f"enc{i+1}_2")(h), a))
            skips.append(h)
        return h, skips

    def decode(self, h: jnp.ndarray, skips) -> jnp.ndarray:
        """Pipeline stage 1: bottleneck + decoder (consumes the skips)."""
        a = self.leaky_slope
        h = self._maybe_quant_act(leaky_relu(self.bottle1(h), a))
        h = self._maybe_quant_act(leaky_relu(self.bottle2(h), a))
        for i in range(self.levels):
            h = upsample_nearest_2x(h)
            h = self._maybe_quant_act(leaky_relu(getattr(self, f"dec{i+1}_1")(h), a))
            h = self._maybe_quant_act(leaky_relu(getattr(self, f"dec{i+1}_2")(h), a))
            if i < self.levels - 1:  # additive skip (no skip at input resolution)
                h = self._maybe_quant_act(h + skips[self.levels - 2 - i])
        out = self.final(h)
        return jnp.tanh(out)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, skips = self.encode(x)
        return self.decode(h, skips)


class FullDiscriminator(nn.Module):
    """Scaled conditional critic for the 1024-sample family (no reference
    counterpart — designed to mirror the mini critic's shape: strided conv
    stack, sum pool, dense; no batchnorm)."""

    frame_length: int = 1024
    levels: int = 5
    base_channels: int = 32
    leaky_slope: float = 0.2

    @nn.compact
    def __call__(self, candidate: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        a = self.leaky_slope
        h = jnp.concatenate([candidate, condition], axis=-1)
        for i in range(self.levels):
            w = self.base_channels * (2 ** min(i, 4))
            h = leaky_relu(_conv(w, 2, f"conv{i+1}")(h), a)
        pooled = jnp.sum(h, axis=-2)
        return nn.Dense(1, kernel_init=_XAVIER, bias_init=_ZEROS, name="dense")(pooled)


# ------------------------------------------------------------------ sharding
def unet_param_shardings(params: Any, mesh) -> Any:
    """NamedSharding tree for tensor parallelism over mesh axis ``tp``.

    Megatron-style column/row alternation per level:
      * ``*_1`` conv kernels [k, cin, cout]: shard cout  -> P(None, None, 'tp')
        (their biases shard over 'tp' too),
      * ``*_2`` / ``final`` kernels: shard cin -> P(None, 'tp', None), biases
        replicated (their outputs need one all-reduce, inserted by GSPMD).
    Everything else replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    tp = mesh.shape.get("tp", 1)

    def rule(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        layer = names[-2] if len(names) >= 2 else ""
        leafname = names[-1]
        spec = P()
        if tp > 1 and leaf.ndim >= 1:
            if layer.endswith("_1") or layer.startswith("conv"):
                if leafname == "kernel" and leaf.shape[-1] % tp == 0:
                    spec = P(None, None, "tp")
                elif leafname == "bias" and leaf.shape[0] % tp == 0:
                    spec = P("tp")
            elif layer.endswith("_2") or layer in ("final", "bottle1", "bottle2"):
                if leafname == "kernel" and leaf.shape[-2] % tp == 0:
                    spec = P(None, "tp", None)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def unet_param_shardings_rowparallel(params: Any, mesh) -> Any:
    """ROW-parallel-only tensor sharding: ``*_2``/``final``/``bottle*``
    kernels shard C_in (P(None, 'tp', None)); every ``*_1`` kernel and all
    biases replicate.

    This is the sp x tp-safe variant of ``unet_param_shardings`` for
    INFERENCE ONLY: XLA's SPMD partitioner miscompiles a conv whose LHS is
    sharded on the spatial dim while its kernel is sharded on C_out (wrong
    values, no error — tests/test_gspmd.py::test_sp_tp_conv_partitioner_
    canary, scripts/sp_tp_conv_repro.py); the row-parallel form (kernel
    sharded on C_in, partial sums all-reduced by GSPMD) partitions
    correctly under spatial sharding in the FORWARD pass
    (tests/test_gspmd.py::test_sp_tp_rowparallel_forward_inference_ok), but
    its input-cotangent conv transposes into the C_out-sharded pattern, so
    TRAINING still miscompiles — parallel/gspmd.py rejects any tp-sharded
    kernel under sp, and sp x tp serving is the only supported use of this
    rule until the upstream fix lands.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    tp = mesh.shape.get("tp", 1)

    def rule(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        layer = names[-2] if len(names) >= 2 else ""
        leafname = names[-1]
        spec = P()
        if tp > 1 and leaf.ndim >= 1:
            if (layer.endswith("_2") or layer in ("final", "bottle1", "bottle2")) \
                    and leafname == "kernel" and leaf.shape[-2] % tp == 0:
                spec = P(None, "tp", None)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def full_unet_layer_names(levels: int = 5) -> List[str]:
    """Reference export ordering (export/generator/metadata.json)."""
    names = []
    for i in range(levels):
        names += [f"enc{i+1}_1", f"enc{i+1}_2"]
    names += ["bottle1", "bottle2"]
    for i in range(levels):
        names += [f"dec{i+1}_1", f"dec{i+1}_2"]
    names += ["final"]
    return names
