"""FPGA-format weight export: .bin / scales / metadata.json / CRC32.

Behavioral parity target: reference utils/quantization.py:259-450
(export_weights_fpga). Byte-identical file formats:
  * ``<layer>_weights.bin``: per-out-channel symmetric int8 quantized weights,
    flattened in torch layout ([out, in, k] for conv, [out, in] for linear),
  * ``<layer>_scale.bin``: float32 per-channel scales,
  * ``<layer>_bias.bin``: float32 biases (the reference's format — see the
    bias-format quirk note below),
  * ``metadata.json``: same keys incl. CRC32 hex per layer.

Layer names match the reference's ``named_modules`` walk of MiniGenerator:
``enc1.conv``, ``bottleneck.conv``, ``dec1.conv``, ``out_conv`` (dots
replaced by underscores in filenames), and of MiniDiscriminator: ``conv1``,
``conv2``, ``dense``.

Quirk handled explicitly: the reference *writes* float32 biases
(quantization.py:360) but its ROM codegen *reads* int32 Q16.16 and shifts
``>> 8`` (export_mini_weights.py:76-77). ``write_bias_format`` selects
"float32" (reference-compatible, default) or "int32_q1616" (self-consistent
with the ROM codegen).
"""

from __future__ import annotations

import binascii
import json
from pathlib import Path
from typing import Any, Dict, List, NamedTuple

import numpy as np

class LayerSpec(NamedTuple):
    name: str          # reference-style dotted name
    kind: str          # "Conv1d" | "Linear"
    weight: np.ndarray  # conv: [out, in, k] (torch layout); linear: [out, in]
    bias: np.ndarray | None
    stride: int = 1
    padding: int = 1


def _flatten_params(params) -> Dict[tuple, np.ndarray]:
    import flax

    tree = params.get("params", params)
    return {k: np.asarray(v) for k, v in flax.traverse_util.flatten_dict(tree).items()}


def _conv_wb(flat: Dict[tuple, np.ndarray], scope: tuple):
    """Fetch (kernel, bias) for either model lowering's param naming and
    convert the kernel from flax [k, in, out] to torch [out, in, k]."""
    if scope + ("conv_kernel",) in flat:  # matmul lowering inside ConvBlock
        w, b = flat[scope + ("conv_kernel",)], flat[scope + ("conv_bias",)]
    elif scope + ("conv", "kernel") in flat:  # nn.Conv inside ConvBlock
        w, b = flat[scope + ("conv", "kernel")], flat[scope + ("conv", "bias")]
    elif scope[:-1] + (scope[-1] + "_kernel",) in flat:  # bare conv (out_conv)
        w = flat[scope[:-1] + (scope[-1] + "_kernel",)]
        b = flat[scope[:-1] + (scope[-1] + "_bias",)]
    elif scope + ("kernel",) in flat:  # bare nn.Conv
        w, b = flat[scope + ("kernel",)], flat[scope + ("bias",)]
    else:
        raise KeyError(f"no conv params under {scope}")
    return np.transpose(w, (2, 1, 0)), b


def generator_layers(params) -> List[LayerSpec]:
    """MiniGenerator params -> reference-ordered layer specs
    (models/generator.py named_modules order)."""
    flat = _flatten_params(params)
    return [
        LayerSpec("enc1.conv", "Conv1d", *_conv_wb(flat, ("enc1",)), stride=2),
        LayerSpec("bottleneck.conv", "Conv1d", *_conv_wb(flat, ("bottleneck",)), stride=2),
        LayerSpec("dec1.conv", "Conv1d", *_conv_wb(flat, ("dec1",)), stride=1),
        LayerSpec("out_conv", "Conv1d", *_conv_wb(flat, ("out_conv",)), stride=1),
    ]


def discriminator_layers(params) -> List[LayerSpec]:
    flat = _flatten_params(params)
    dense_w = flat[("dense", "kernel")].T  # flax [in,out] -> torch [out,in]
    dense_b = flat[("dense", "bias")]
    return [
        LayerSpec("conv1", "Conv1d", *_conv_wb(flat, ("conv1",)), stride=2),
        LayerSpec("conv2", "Conv1d", *_conv_wb(flat, ("conv2",)), stride=2),
        LayerSpec("dense", "Linear", dense_w, dense_b, stride=1, padding=0),
    ]


def crc32_hex(data: bytes) -> str:
    return f"{binascii.crc32(data) & 0xFFFFFFFF:08x}"


def quantize_layer_int8(weight: np.ndarray, weight_bits: int = 8, per_channel: bool = True):
    """Per-out-channel int8 quantization (quantization.py:319-335).

    Pure numpy on purpose: export is a host-side path and must not issue
    eager ops on an accelerator backend (eager dispatch on the remote-compile
    TPU backend stalls)."""
    w = np.asarray(weight)
    max_q = 2 ** (weight_bits - 1) - 1
    if per_channel:
        axes = tuple(range(1, w.ndim))
        abs_max = np.abs(w).max(axis=axes, keepdims=True)
    else:
        abs_max = np.abs(w).max()
    scale = np.maximum(abs_max, 1e-8) / max_q
    q = np.clip(np.round(w / scale), -(max_q + 1), max_q)
    return q.astype(np.int8), np.asarray(scale, np.float32).squeeze()


def export_weights(
    layers: List[LayerSpec],
    output_dir: str,
    weight_bits: int = 8,
    activation_bits: int = 16,
    per_channel: bool = True,
    write_bias_format: str = "float32",
) -> Dict[str, Any]:
    """Write the reference's export bundle for a list of layers.

    Returns the metadata dict (also written to ``metadata.json``)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    metadata: Dict[str, Any] = {
        "config": {
            "weight_bits": weight_bits,
            "activation_bits": activation_bits,
            "per_channel": per_channel,
        },
        "layers": {},
    }
    for layer in layers:
        base = layer.name.replace(".", "_")
        w_int8, scale = quantize_layer_int8(layer.weight, weight_bits, per_channel)
        wfile = f"{base}_weights.bin"
        w_int8.flatten().tofile(out / wfile)
        sfile = f"{base}_scale.bin"
        np.asarray(scale, np.float32).tofile(out / sfile)

        bias_info = None
        if layer.bias is not None:
            bfile = f"{base}_bias.bin"
            if write_bias_format == "float32":
                layer.bias.astype(np.float32).tofile(out / bfile)
            elif write_bias_format == "int32_q1616":
                q = np.clip(np.round(layer.bias * 65536.0), -(2**31), 2**31 - 1)
                q.astype(np.int32).tofile(out / bfile)
            else:
                raise ValueError(write_bias_format)
            bias_info = {"file": bfile, "shape": list(layer.bias.shape)}

        info: Dict[str, Any] = {
            "type": layer.kind,
            "weight_file": wfile,
            "scale_file": sfile,
            "bias": bias_info,
            "weight_shape": list(layer.weight.shape),
            "crc32": crc32_hex(w_int8.flatten().tobytes()),
        }
        if layer.kind == "Conv1d":
            info.update(
                kernel_size=layer.weight.shape[2],
                stride=layer.stride,
                padding=layer.padding,
                in_channels=layer.weight.shape[1],
                out_channels=layer.weight.shape[0],
            )
        else:
            info.update(
                in_features=layer.weight.shape[1],
                out_features=layer.weight.shape[0],
            )
        # reorder keys to the reference's dict order (quantization.py:366-378)
        if layer.kind == "Conv1d":
            key_order = ["type", "weight_file", "scale_file", "bias", "weight_shape",
                         "kernel_size", "stride", "padding", "in_channels",
                         "out_channels", "crc32"]
        else:
            key_order = ["type", "weight_file", "scale_file", "bias", "weight_shape",
                         "in_features", "out_features", "crc32"]
        metadata["layers"][layer.name] = {k: info[k] for k in key_order}

    with open(out / "metadata.json", "w") as f:
        json.dump(metadata, f, indent=2)
    return metadata


def export_generator(params, output_dir: str, **kw) -> Dict[str, Any]:
    """Reference entry point equivalent: export_weights_fpga(generator, dir)
    (train.py:524-531, export.py:40-72)."""
    return export_weights(generator_layers(params), output_dir, **kw)


def export_discriminator(params, output_dir: str, **kw) -> Dict[str, Any]:
    """New capability vs the reference (which never exports the critic —
    export_mini_weights.py:147-162 uses random placeholders)."""
    return export_weights(discriminator_layers(params), output_dir, **kw)


def full_unet_layers(params, levels: int = 0) -> List[LayerSpec]:
    """FullUNetGenerator params -> reference-ordered layer specs with the
    reference's export names (enc1_1 ... final, export/generator/
    metadata.json). ``levels`` 0 = infer from the parameter tree (supports
    the smaller 3-level test variants)."""
    from ..models.full_unet import full_unet_layer_names

    flat = _flatten_params(params)
    if not levels:
        levels = max(int(name[3]) for name, _ in flat if name.startswith("enc"))
    specs = []
    for name in full_unet_layer_names(levels):
        w = np.transpose(flat[(name, "kernel")], (2, 1, 0))
        b = flat[(name, "bias")]
        stride = 2 if name.startswith("enc") and name.endswith("_1") else 1
        specs.append(LayerSpec(name, "Conv1d", w, b, stride=stride, padding=1))
    return specs


def export_full_unet(params, output_dir: str, levels: int = 0, **kw) -> Dict[str, Any]:
    """Reference-format export of the full 1024-sample U-Net — produces the
    same file set as the checked-in export/generator/ directory."""
    return export_weights(full_unet_layers(params, levels), output_dir, **kw)
