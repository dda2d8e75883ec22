"""Classical equalizer baselines — ZF, MMSE, DFE, LMS, RLS as JAX scans.

Behavioral parity target: reference utils/classical_equalizers.py:33-634.
The per-symbol recurrences (DFE/LMS/RLS) become ``lax.scan`` bodies; trials
parallelize with ``vmap`` — the TPU answer to the reference's O(trials·N²)
Python loops (SURVEY.md §7.3).

Faithfully-kept reference quirks (needed for metric parity):
  * ZF/MMSE estimate a per-sample "channel" H = received/clean from the FULL
    signals (oracle-assisted, classical_equalizers.py:104-106) — not a pilot
    estimator.
  * LMS/RLS only equalize the center region ``[taps//2, N-taps//2)`` and
    output ZEROS elsewhere (classical_equalizers.py:437-446, 549-558) — on
    16-sample frames that zeroes 10 of 16 samples, which dominates their MSE.
  * DFE/LMS adapt with plain ``dot`` (no conjugate) filter output while RLS
    uses the conjugated weights (classical_equalizers.py:302,426,537,556).
  * Hard QPSK decisions ±1/√2 in the DFE feedback (classical_equalizers.py:340-341).

All equalizers expose ``equalize_iq(noisy_iq, clean_iq) -> (iq, metrics)``
on channels-last ``[L, 2]`` frames (batch with vmap), mirroring the
reference API.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..utils.iq import complex_to_iq, iq_to_complex

_EPS = 1e-10


# --------------------------------------------------------------------- linear
def zf_equalize(noisy_c: jnp.ndarray, clean_c: jnp.ndarray) -> jnp.ndarray:
    """X̂ = Y / H with H = Y/(X+eps) (classical_equalizers.py:55-88)."""
    h = noisy_c / (clean_c + _EPS)
    return noisy_c / (h + _EPS)


def mmse_equalize(noisy_c: jnp.ndarray, clean_c: jnp.ndarray, snr_db: float) -> jnp.ndarray:
    """X̂ = conj(H)/(|H|²+1/SNR)·Y (classical_equalizers.py:173-200)."""
    h = noisy_c / (clean_c + _EPS)
    snr_lin = 10.0 ** (snr_db / 10.0)
    flt = jnp.conj(h) / (jnp.abs(h) ** 2 + 1.0 / snr_lin)
    return flt * noisy_c


# ------------------------------------------------------------------------ DFE
@dataclasses.dataclass(frozen=True)
class DFEConfig:
    n_ff: int = 5
    n_fb: int = 3
    mu: float = 0.01


def _dfe_window(rp: jnp.ndarray, n: jnp.ndarray, n_ff: int) -> jnp.ndarray:
    """Zero-padded received window r[n - n_ff//2 : n + n_ff//2 + 1]."""
    return jax.lax.dynamic_slice(rp, (n,), (n_ff,))


def dfe_train(received: jnp.ndarray, training: jnp.ndarray, cfg: DFEConfig = DFEConfig()):
    """LMS adaptation with known symbols (classical_equalizers.py:277-313)."""
    n_ff, n_fb, mu = cfg.n_ff, cfg.n_fb, cfg.mu
    rp = jnp.pad(received, (n_ff // 2, n_ff // 2))
    w_ff0 = jnp.zeros(n_ff, jnp.complex64).at[n_ff // 2].set(1.0)
    w_fb0 = jnp.zeros(n_fb, jnp.complex64)
    fb0 = jnp.zeros(n_fb, jnp.complex64)

    def body(carry, n):
        w_ff, w_fb, fb = carry
        ff = _dfe_window(rp, n, n_ff)
        y = jnp.dot(w_ff, ff) - jnp.dot(w_fb, fb)
        e = training[n] - y
        w_ff = w_ff + mu * e * jnp.conj(ff)
        w_fb = w_fb - mu * e * jnp.conj(fb)
        fb = jnp.concatenate([training[n][None], fb[:-1]])
        return (w_ff, w_fb, fb), None

    (w_ff, w_fb, _), _ = jax.lax.scan(
        body, (w_ff0, w_fb0, fb0), jnp.arange(training.shape[0])
    )
    return w_ff, w_fb


def dfe_equalize(received: jnp.ndarray, w_ff: jnp.ndarray, w_fb: jnp.ndarray,
                 cfg: DFEConfig = DFEConfig()) -> jnp.ndarray:
    """Decision-directed application (classical_equalizers.py:315-347)."""
    n_ff, n_fb = cfg.n_ff, cfg.n_fb
    rp = jnp.pad(received, (n_ff // 2, n_ff // 2))
    fb0 = jnp.zeros(n_fb, jnp.complex64)

    def body(fb, n):
        ff = _dfe_window(rp, n, n_ff)
        y = jnp.dot(w_ff, ff) - jnp.dot(w_fb, fb)
        dec = (jnp.sign(jnp.real(y)) + 1j * jnp.sign(jnp.imag(y))) / jnp.sqrt(2.0)
        fb = jnp.concatenate([dec[None], fb[:-1]])
        return fb, y

    _, out = jax.lax.scan(body, fb0, jnp.arange(received.shape[0]))
    return out


# ------------------------------------------------------------------------ LMS
@dataclasses.dataclass(frozen=True)
class LMSConfig:
    n_taps: int = 11
    mu: float = 0.01


def lms_train(received: jnp.ndarray, desired: jnp.ndarray, cfg: LMSConfig = LMSConfig(),
              n_iterations: int = 1):
    """w[n+1] = w[n] + μ·e·conj(x) over the center region
    (classical_equalizers.py:406-435). Returns (weights, error_history)."""
    t2 = cfg.n_taps // 2
    idx = jnp.arange(t2, received.shape[0] - t2)
    w0 = jnp.zeros(cfg.n_taps, jnp.complex64).at[t2].set(1.0)

    def body(w, n):
        x = jax.lax.dynamic_slice(received, (n - t2,), (cfg.n_taps,))
        y = jnp.dot(w, x)
        e = desired[n] - y
        return w + cfg.mu * e * jnp.conj(x), jnp.abs(e) ** 2

    w = w0
    errs = []
    for _ in range(n_iterations):
        w, e = jax.lax.scan(body, w, idx)
        errs.append(e)
    return w, jnp.concatenate(errs)


def lms_equalize(received: jnp.ndarray, w: jnp.ndarray, cfg: LMSConfig = LMSConfig()) -> jnp.ndarray:
    """Center-region filtering, zeros at the edges
    (classical_equalizers.py:437-446)."""
    t2 = cfg.n_taps // 2
    idx = jnp.arange(t2, received.shape[0] - t2)

    def one(n):
        x = jax.lax.dynamic_slice(received, (n - t2,), (cfg.n_taps,))
        return jnp.dot(w, x)

    vals = jax.vmap(one)(idx)
    return jnp.zeros_like(received).at[idx].set(vals)


# ------------------------------------------------------------------------ RLS
@dataclasses.dataclass(frozen=True)
class RLSConfig:
    n_taps: int = 11
    forgetting_factor: float = 0.99
    delta: float = 0.1


def rls_train(received: jnp.ndarray, desired: jnp.ndarray, cfg: RLSConfig = RLSConfig()):
    """P-matrix recursion (classical_equalizers.py:517-547)."""
    t2 = cfg.n_taps // 2
    lam = cfg.forgetting_factor
    idx = jnp.arange(t2, received.shape[0] - t2)
    w0 = jnp.zeros(cfg.n_taps, jnp.complex64).at[t2].set(1.0)
    p0 = jnp.eye(cfg.n_taps, dtype=jnp.complex64) / cfg.delta

    def body(carry, n):
        w, p = carry
        x = jax.lax.dynamic_slice(received, (n - t2,), (cfg.n_taps,))
        px = p @ x
        denom = lam + jnp.vdot(x, px)  # x^H P x
        k = px / denom
        y = jnp.vdot(w, x)  # w^H x — a-priori output with conjugated weights
        e = desired[n] - y
        w = w + k * jnp.conj(e)
        p = (p - jnp.outer(k, jnp.conj(x)) @ p) / lam
        return (w, p), jnp.abs(e) ** 2

    (w, _), errs = jax.lax.scan(body, (w0, p0), idx)
    return w, errs


def rls_equalize(received: jnp.ndarray, w: jnp.ndarray, cfg: RLSConfig = RLSConfig()) -> jnp.ndarray:
    """y[n] = conj(w)·x (classical_equalizers.py:549-558), center region only."""
    t2 = cfg.n_taps // 2
    idx = jnp.arange(t2, received.shape[0] - t2)

    def one(n):
        x = jax.lax.dynamic_slice(received, (n - t2,), (cfg.n_taps,))
        return jnp.dot(jnp.conj(w), x)

    vals = jax.vmap(one)(idx)
    return jnp.zeros_like(received).at[idx].set(vals)


# ------------------------------------------------------------- iq-level API
def _finish(eq_c, noisy_iq, clean_iq) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    eq_iq = complex_to_iq(eq_c).astype(jnp.float32)
    m = jnp.mean((eq_iq - clean_iq) ** 2)
    metrics = {
        "mse": m,
        "snr_improvement_db": 10.0 * jnp.log10(jnp.mean(noisy_iq**2) / (m + _EPS)),
    }
    return eq_iq, metrics


def zf_equalize_iq(noisy_iq, clean_iq):
    """[L, 2] channels-last frames (vmap for batches)."""
    eq = zf_equalize(iq_to_complex(noisy_iq), iq_to_complex(clean_iq))
    return _finish(eq, noisy_iq, clean_iq)


def mmse_equalize_iq(noisy_iq, clean_iq, snr_db: float = 20.0):
    eq = mmse_equalize(iq_to_complex(noisy_iq), iq_to_complex(clean_iq), snr_db)
    return _finish(eq, noisy_iq, clean_iq)


def dfe_equalize_iq(noisy_iq, clean_iq, cfg: DFEConfig = DFEConfig()):
    r, d = iq_to_complex(noisy_iq), iq_to_complex(clean_iq)
    w_ff, w_fb = dfe_train(r, d, cfg)
    return _finish(dfe_equalize(r, w_ff, w_fb, cfg), noisy_iq, clean_iq)


def lms_equalize_iq(noisy_iq, clean_iq, cfg: LMSConfig = LMSConfig()):
    r, d = iq_to_complex(noisy_iq), iq_to_complex(clean_iq)
    w, errs = lms_train(r, d, cfg)
    eq_iq, metrics = _finish(lms_equalize(r, w, cfg), noisy_iq, clean_iq)
    metrics["convergence_mse"] = jnp.mean(errs[-100:]) if errs.shape[0] > 100 else jnp.mean(errs)
    return eq_iq, metrics


def rls_equalize_iq(noisy_iq, clean_iq, cfg: RLSConfig = RLSConfig()):
    r, d = iq_to_complex(noisy_iq), iq_to_complex(clean_iq)
    w, _ = rls_train(r, d, cfg)
    return _finish(rls_equalize(r, w, cfg), noisy_iq, clean_iq)


EQUALIZERS = {
    "ZF": zf_equalize_iq,
    "MMSE": mmse_equalize_iq,
    "DFE": dfe_equalize_iq,
    "LMS": lms_equalize_iq,
    "RLS": rls_equalize_iq,
}


def compare_equalizers(noisy_iq, clean_iq, snr_db: float = 20.0) -> Dict[str, Dict[str, float]]:
    """All five on one frame (classical_equalizers.py:591-634)."""
    out = {}
    for name, fn in EQUALIZERS.items():
        if name == "MMSE":
            _, m = fn(noisy_iq, clean_iq, snr_db)
        else:
            _, m = fn(noisy_iq, clean_iq)
        out[name] = {k: float(v) for k, v in m.items()}
    return out
