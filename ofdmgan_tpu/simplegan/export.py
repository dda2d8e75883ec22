"""simpleGAN fixed-point weight export + integer inference.

Behavioral parity targets:
  * weight text files: one ``<int> // <float:.10f>`` line per value,
    row-major; weights Q1.7 (round(x·128) int8), biases Q8.8 (round(x·256)
    int16) — LSI_Contest_simple_gan_3x3.m weight-extraction section and the
    checked-in rtl/simpleGAN/model/gen_w1.txt format.
  * integer datapath: sequential dense y = Wx + b in Q-format with per-
    product ``>>> 7`` requantize and 256-entry activation LUTs
    (dense_layer.v, activation_tanh.v, activation_sigmoid.v semantics):
      - tanh LUT: 256 entries covering [0, 4) (index = q8.8 value >> 2),
        sign-mirrored, saturating to tanh(4),
      - sigmoid LUT: 256 entries covering [0, 8) (index = q8.8 >> 3),
        mirrored via sigmoid(-x) = 1 - sigmoid(x).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from .model import SimpleGANParams

_FILES = [
    ("gen_w1.txt", "wg2", 7), ("gen_b1.txt", "bg2", 8),
    ("gen_w2.txt", "wg3", 7), ("gen_b2.txt", "bg3", 8),
    ("disc_w1.txt", "wd2", 7), ("disc_b1.txt", "bd2", 8),
    ("disc_w2.txt", "wd3", 7), ("disc_b2.txt", "bd3", 8),
]


def export_weights_txt(params: SimpleGANParams, output_dir: str) -> Dict[str, int]:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    counts = {}
    for fname, field, frac in _FILES:
        arr = np.asarray(getattr(params, field), np.float64)
        flat = arr.flatten()  # numpy row-major == MATLAB matrix' (:)
        width = 8 if frac == 7 else 16
        lo, hi = -(2 ** (width - 1)), 2 ** (width - 1) - 1
        with open(out / fname, "w") as f:
            for v in flat:
                q = int(np.clip(np.round(v * (2**frac)), lo, hi))
                f.write(f"{q} // {v:.10f}\n")
        counts[fname] = len(flat)
    return counts


def load_weights_txt(input_dir: str) -> SimpleGANParams:
    """Read the fixed-point text files back (works on the reference's
    checked-in files too); returns the QUANTIZED float values (int/2^frac)."""
    import jax.numpy as jnp

    shapes = {
        "wg2": (3, 2), "bg2": (3,), "wg3": (9, 3), "bg3": (9,),
        "wd2": (3, 9), "bd2": (3,), "wd3": (1, 3), "bd3": (1,),
    }
    vals = {}
    for fname, field, frac in _FILES:
        ints = []
        for line in (Path(input_dir) / fname).read_text().splitlines():
            line = line.strip()
            if line:
                ints.append(int(line.split("//")[0].strip()))
        vals[field] = jnp.asarray(
            np.asarray(ints, np.float32).reshape(shapes[field]) / (2**frac)
        )
    return SimpleGANParams(**vals)


# ------------------------------------------------------------- integer path
_TANH_LUT = np.round(np.tanh(np.arange(256) * 4.0 / 256.0) * 256.0).astype(np.int32)
_SIGM_LUT = np.round(
    1.0 / (1.0 + np.exp(-np.arange(256) * 8.0 / 256.0)) * 256.0
).astype(np.int32)


def tanh_lut_q88(x_q88: np.ndarray) -> np.ndarray:
    """256-entry LUT tanh with sign mirror (activation_tanh.v semantics)."""
    x = np.asarray(x_q88, np.int64)
    mag = np.abs(x)
    idx = np.minimum(mag >> 2, 255)
    y = _TANH_LUT[idx]
    y = np.where(mag >= 1024, _TANH_LUT[255], y)
    return (np.sign(x) * y).astype(np.int32)


def sigmoid_lut_q88(x_q88: np.ndarray) -> np.ndarray:
    """256-entry LUT sigmoid using sigmoid(-x) = 1 - sigmoid(x)
    (activation_sigmoid.v semantics)."""
    x = np.asarray(x_q88, np.int64)
    mag = np.abs(x)
    idx = np.minimum(mag >> 3, 255)
    y = _SIGM_LUT[idx]
    y = np.where(mag >= 2048, _SIGM_LUT[255], y)
    return np.where(x >= 0, y, 256 - y).astype(np.int32)


def _dense_int(x_q88: np.ndarray, w_q17: np.ndarray, b_q88: np.ndarray) -> np.ndarray:
    """Sequential-MAC dense layer with per-product >>>7 (dense_layer.v)."""
    prod = (x_q88[None, :].astype(np.int64) * w_q17.astype(np.int64)) >> 7
    acc = prod.sum(axis=1) + b_q88
    return np.clip(acc, -32768, 32767).astype(np.int32)


def quantize_params(params: SimpleGANParams):
    """float params -> (Q1.7 weight, Q8.8 bias) int arrays per layer."""
    q = {}
    for _, field, frac in _FILES:
        arr = np.asarray(getattr(params, field), np.float64)
        width = 8 if frac == 7 else 16
        lo, hi = -(2 ** (width - 1)), 2 ** (width - 1) - 1
        q[field] = np.clip(np.round(arr * (2**frac)), lo, hi).astype(np.int32)
    return q


def generator_int_forward(qparams: Dict[str, np.ndarray], ng_q88: np.ndarray) -> np.ndarray:
    """Integer simple-GAN generator: latent Q8.8 [2] -> image Q8.8 [9]
    (simple_generator.v datapath)."""
    h = tanh_lut_q88(_dense_int(ng_q88, qparams["wg2"], qparams["bg2"]))
    return tanh_lut_q88(_dense_int(h, qparams["wg3"], qparams["bg3"]))


def discriminator_int_forward(qparams: Dict[str, np.ndarray], x_q88: np.ndarray) -> int:
    """Integer simple-GAN critic: image Q8.8 [9] -> probability Q8.8
    (simple_discriminator.v datapath)."""
    h = tanh_lut_q88(_dense_int(x_q88, qparams["wd2"], qparams["bd2"]))
    return int(sigmoid_lut_q88(_dense_int(h, qparams["wd3"], qparams["bd3"]))[0])
