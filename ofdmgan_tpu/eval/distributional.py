"""Distributional realism metrics: does the adversarial term buy anything?

The reference's claim structure ("GAN beats classical", README.md:33-36)
and this framework's own results leave one open question (VERDICT round 2):
the committed champions win on *reconstruction* (L1/MSE), where supervised
training dominates — so what, if anything, does the adversarial machinery
improve? These metrics answer it on the axis GANs are supposed to win:
closeness of the *distribution* of enhanced frames to the distribution of
clean frames, rather than per-frame distance to the paired target.

Three measures, all jittable and hard-synced friendly:

  * **PSD match** — mean absolute dB gap between the average periodogram of
    enhanced frames and of clean frames. Supervised L1/L2 regression is
    biased toward the posterior mean, which *under-represents* high
    frequencies (conditional averaging cancels phase-incoherent content);
    an adversarial term should pull spectra back onto the data manifold.
  * **Amplitude-moment match** — |x| distribution mean/std/skew/kurtosis
    deltas vs clean. Posterior-mean collapse shows up as under-dispersed
    amplitudes.
  * **MMD²** — unbiased Gaussian-kernel maximum mean discrepancy between
    enhanced and clean frame sets (frames as flat R^{2L} vectors, median-
    heuristic bandwidth measured on the clean set). The null scale is
    reported via clean-vs-clean MMD² on two independent clean draws, so a
    model is "distribution-matched" when its MMD² is statistically
    indistinguishable from that floor.

No reference counterpart (its evaluation is purely paired MSE/EVM,
benchmark_comparison.py:137-146).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..signal.datagen import DatagenConfig, synthetic_batch


def periodogram_db(frames: jnp.ndarray) -> jnp.ndarray:
    """Mean periodogram of complex I/Q frames [B, L, 2] -> [L] in dB."""
    x = frames[..., 0] + 1j * frames[..., 1]
    psd = jnp.mean(jnp.abs(jnp.fft.fft(x, axis=-1)) ** 2, axis=0)
    return 10.0 * jnp.log10(psd + 1e-12)


def psd_distance_db(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Mean |dB gap| between average periodograms."""
    return jnp.mean(jnp.abs(periodogram_db(est) - periodogram_db(ref)))


def amplitude_moments(frames: jnp.ndarray) -> jnp.ndarray:
    """[mean, std, skew, excess kurtosis] of the |I+jQ| amplitude."""
    a = jnp.abs(frames[..., 0] + 1j * frames[..., 1]).reshape(-1)
    mu = jnp.mean(a)
    sd = jnp.std(a) + 1e-12
    z = (a - mu) / sd
    return jnp.stack([mu, sd, jnp.mean(z**3), jnp.mean(z**4) - 3.0])


def mmd2_unbiased(x: jnp.ndarray, y: jnp.ndarray, bandwidth: jnp.ndarray) -> jnp.ndarray:
    """Unbiased MMD² with a Gaussian RBF kernel.

    ``x``: [m, d], ``y``: [n, d]. O(m·n) memory — keep m, n ≲ 4096.
    """
    def k(a, b):
        d2 = jnp.sum(a**2, -1)[:, None] + jnp.sum(b**2, -1)[None, :] - 2.0 * a @ b.T
        return jnp.exp(-d2 / (2.0 * bandwidth**2))

    m, n = x.shape[0], y.shape[0]
    kxx = k(x, x)
    kyy = k(y, y)
    kxy = k(x, y)
    sum_xx = (jnp.sum(kxx) - jnp.trace(kxx)) / (m * (m - 1))
    sum_yy = (jnp.sum(kyy) - jnp.trace(kyy)) / (n * (n - 1))
    return sum_xx + sum_yy - 2.0 * jnp.mean(kxy)


def median_bandwidth(x: jnp.ndarray) -> jnp.ndarray:
    """Median pairwise distance (the median heuristic), on [m, d]."""
    d2 = jnp.sum(x**2, -1)[:, None] + jnp.sum(x**2, -1)[None, :] - 2.0 * x @ x.T
    iu = jnp.triu_indices(x.shape[0], k=1)
    return jnp.sqrt(jnp.median(jnp.maximum(d2[iu], 0.0)) + 1e-12)


def make_report_fn(
    apply_fn: Callable,
    dg_cfg: DatagenConfig,
    batch_size: int = 512,
    n_batches: int = 64,
    mmd_samples: int = 2048,
) -> Callable[[dict, jax.Array], Dict[str, jnp.ndarray]]:
    """Build a jitted ``report(params, key) -> metrics dict``.

    Streams ``n_batches`` paired batches through the generator inside one
    ``lax.scan`` (single dispatch on the remote backend), accumulating PSD
    and moment statistics over every frame and reservoir-style collecting
    the first ``mmd_samples`` frames of each population for the MMD pass.
    ``apply_fn(params, noisy) -> enhanced``; pass the identity lambda to
    measure the un-enhanced noisy distribution.
    """
    frames_per_batch = min(mmd_samples // n_batches + 1, batch_size)

    @jax.jit
    def report(params, key):
        keys = jax.random.split(key, n_batches)
        # an INDEPENDENT clean draw for the clean-vs-clean MMD null floor
        null_keys = jax.random.split(jax.random.fold_in(key, 777), n_batches)

        def body(_, ks):
            k, nk = ks
            batch = synthetic_batch(k, batch_size, dg_cfg)
            clean2 = synthetic_batch(nk, batch_size, dg_cfg)["clean"]
            est = apply_fn(params, batch["noisy"])
            out = (
                periodogram_db(est),
                periodogram_db(batch["clean"]),
                amplitude_moments(est),
                amplitude_moments(batch["clean"]),
                est[:frames_per_batch].reshape(frames_per_batch, -1),
                batch["clean"][:frames_per_batch].reshape(frames_per_batch, -1),
                clean2[:frames_per_batch].reshape(frames_per_batch, -1),
                jnp.mean(jnp.abs(est - batch["clean"])),
            )
            return 0, out

        _, (psd_e, psd_c, mom_e, mom_c, se, sc, sc2, l1) = jax.lax.scan(
            body, 0, (keys, null_keys))
        se = se.reshape(-1, se.shape[-1])[:mmd_samples]
        sc = sc.reshape(-1, sc.shape[-1])[:mmd_samples]
        sc2 = sc2.reshape(-1, sc2.shape[-1])[:mmd_samples]
        bw = median_bandwidth(sc[: min(2048, mmd_samples)])
        return {
            "psd_distance_db": jnp.mean(jnp.abs(jnp.mean(psd_e, 0) - jnp.mean(psd_c, 0))),
            "moments_est": jnp.mean(mom_e, 0),
            "moments_clean": jnp.mean(mom_c, 0),
            "mmd2": mmd2_unbiased(se, sc, bw),
            "mmd2_null": mmd2_unbiased(sc2, sc, bw),
            "bandwidth": bw,
            "paired_l1": jnp.mean(l1),
        }

    return report
