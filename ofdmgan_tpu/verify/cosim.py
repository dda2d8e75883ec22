"""ctypes binding for the native C++ fixed-point cosimulation engine.

The rebuild's equivalent of the reference's Python <-> iverilog subprocess
boundary (visualization/rtl_verification_viz.py:62-105): an independent
native implementation of the Q1.7/Q8.8 datapath, used to cross-validate the
JAX integer path (quant/intsim.py) bit-for-bit. Builds ``native/libfixsim.so``
on demand with make.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfixsim.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.fixsim_generator_forward_batch.argtypes = [i8p, i16p, i16p, i16p, ctypes.c_int]
    lib.fixsim_generator_forward_batch.restype = None
    lib.fixsim_generator_forward_res_batch.argtypes = [i8p, i16p, i16p, i16p, ctypes.c_int]
    lib.fixsim_generator_forward_res_batch.restype = None
    lib.fixsim_discriminator_forward_batch.argtypes = [i8p, i16p, i16p, i16p, i16p, ctypes.c_int]
    lib.fixsim_discriminator_forward_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def generator_forward(rom_w: np.ndarray, rom_b: np.ndarray, x_ncl_q88: np.ndarray,
                      residual: bool = False) -> np.ndarray:
    """Native generator inference.

    ``x_ncl_q88``: int16 ``[N, 2, 16]`` channel-major Q8.8 frames.
    Returns int16 ``[N, 2, 16]``. ``residual=True`` selects the
    saturating-input-add output stage (intsim mode "rtl_residual").
    """
    lib = _load()
    x = np.ascontiguousarray(x_ncl_q88, np.int16)
    n = x.shape[0]
    out = np.zeros_like(x)
    fn = (lib.fixsim_generator_forward_res_batch if residual
          else lib.fixsim_generator_forward_batch)
    fn(
        np.ascontiguousarray(rom_w, np.int8),
        np.ascontiguousarray(rom_b, np.int16),
        x, out, n,
    )
    return out


def discriminator_forward(
    rom_w: np.ndarray, rom_b: np.ndarray,
    cand_ncl_q88: np.ndarray, cond_ncl_q88: np.ndarray,
) -> np.ndarray:
    """Native critic inference -> int16 scores ``[N]``."""
    lib = _load()
    cand = np.ascontiguousarray(cand_ncl_q88, np.int16)
    cond = np.ascontiguousarray(cond_ncl_q88, np.int16)
    n = cand.shape[0]
    scores = np.zeros(n, np.int16)
    lib.fixsim_discriminator_forward_batch(
        np.ascontiguousarray(rom_w, np.int8),
        np.ascontiguousarray(rom_b, np.int16),
        cand, cond, scores, n,
    )
    return scores
