"""Golden-vector generation + parity checks against the reference's vectors.

Behavioral parity target: reference proof/verification.py:252-328
(GoldenVectorGenerator). Identical artifact formats:
  * ``input_float.npy`` / ``output_float.npy``: float32, reference layout
    ``[1, 2, L]`` (channel-first),
  * ``input_q88.npy`` / ``output_q88.npy``: int16, value*256 truncated toward
    zero (numpy astype semantics),
  * ``input.hex`` / ``output.hex``: one 4-digit uppercase two's-complement
    hex word per line, row-major flatten (all I samples then all Q samples),
  * ``golden_metadata.json``: input/output shapes, format string, hooked
    layer count.

``check_reference_encoding_parity`` re-encodes the float arrays checked into
the reference repo and asserts bit-exact agreement with its int16/hex files
— the rebuild's golden-parity contract (BASELINE.md, SURVEY.md §4.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..utils.iq import ncl_to_nlc, nlc_to_ncl


def q88_int16(x: np.ndarray) -> np.ndarray:
    """value*256 with truncation toward zero — int16 cast semantics."""
    return (np.asarray(x, np.float32) * 256).astype(np.int16)


def write_hex(path: Path, q88: np.ndarray):
    with open(path, "w") as f:
        for v in q88.flatten():
            f.write(f"{int(v) & 0xFFFF:04X}\n")


def read_hex(path: Path) -> np.ndarray:
    vals = []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        u = int(line, 16)
        vals.append(u - 0x10000 if u >= 0x8000 else u)
    return np.asarray(vals, np.int16)


def generate_golden_vectors(
    model, params, input_ncl: np.ndarray, output_dir: str
) -> Dict[str, Any]:
    """Run one forward pass and emit the golden-vector bundle.

    ``input_ncl``: reference-layout ``[1, C, L]`` float32 (the file layout);
    internally converted to channels-last for the model.
    """
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    x_nlc = jnp.asarray(ncl_to_nlc(jnp.asarray(input_ncl)))
    y_nlc = model.apply(params, x_nlc)
    y_ncl = np.asarray(nlc_to_ncl(y_nlc))

    # hooked-layer count = conv/dense kernels in the param tree (the
    # reference hooks every Conv1d/Linear, proof/verification.py:266-280)
    import flax

    flat = flax.traverse_util.flatten_dict(params.get("params", params))
    n_layers = sum(1 for k in flat if k[-1].endswith("kernel"))

    np.save(out / "input_float.npy", np.asarray(input_ncl, np.float32))
    np.save(out / "output_float.npy", y_ncl.astype(np.float32))
    in_q = q88_int16(input_ncl)
    out_q = q88_int16(y_ncl)
    np.save(out / "input_q88.npy", in_q)
    np.save(out / "output_q88.npy", out_q)
    write_hex(out / "input.hex", in_q)
    write_hex(out / "output.hex", out_q)

    metadata = {
        "input_shape": list(np.asarray(input_ncl).shape),
        "output_shape": list(y_ncl.shape),
        "format": "Q8.8 fixed-point",
        "layers": n_layers,
    }
    with open(out / "golden_metadata.json", "w") as f:
        json.dump(metadata, f, indent=2)
    return metadata


def check_reference_encoding_parity(ref_dir: str) -> Dict[str, bool]:
    """Bit-exactness against a checked-in golden-vector directory.

    For each of input/output: re-encode the reference's float .npy with our
    Q8.8 encoder and compare against its int16 .npy and .hex files.
    """
    ref = Path(ref_dir)
    results = {}
    for name in ("input", "output"):
        f = np.load(ref / f"{name}_float.npy")
        q_ref = np.load(ref / f"{name}_q88.npy")
        q_ours = q88_int16(f)
        npy_ok = bool(np.array_equal(q_ours, q_ref))
        hex_ref = read_hex(ref / f"{name}.hex")
        hex_ok = bool(np.array_equal(q_ours.flatten(), hex_ref))
        results[f"{name}_npy_bitexact"] = npy_ok
        results[f"{name}_hex_bitexact"] = hex_ok
    return results
