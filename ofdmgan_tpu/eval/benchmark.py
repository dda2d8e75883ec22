"""GAN-vs-classical equalizer benchmark — the SNR-sweep comparison harness.

Behavioral parity target: reference benchmark_comparison.py:62-472. Same
experiment design:
  * clean OFDM-like frames: ifft(CN(0,1) spectrum)·sqrt(L),
  * optional nonlinear impairments (Rapp PA, IQ imbalance, phase noise)
    applied BEFORE the linear channel (benchmark_comparison.py:99-116),
  * per-frame INDEPENDENT max-abs normalization of noisy and clean
    (benchmark_comparison.py:129-134,196-197 — unlike training's joint norm),
  * methods: GAN, ZF, MMSE, DFE, LMS, RLS, NoEQ; classical equalizers get
    the clean frame for channel estimation/training (oracle-assisted, a
    documented reference quirk — SURVEY.md §7.4),
  * metrics: MSE and EVM(dB), averaged over trials per SNR.

TPU-native design: all trials for one SNR run as ONE batched, jitted
computation (vmapped equalizer scans + batched GAN forward) instead of the
reference's per-trial Python loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..signal import channel as channel_lib
from ..signal import impairments as imp_lib
from ..signal.ofdm import ofdm_like_frame
from ..utils.iq import complex_to_iq
from . import equalizers as eq
from .metrics import evm_db, mse

METHODS = ["GAN", "GAN-Q", "ZF", "MMSE", "Wiener", "DFE", "LMS", "RLS", "NoEQ"]


def _normalize_each(iq: jnp.ndarray) -> jnp.ndarray:
    """Independent per-frame max-abs normalization (benchmark_comparison.py:129)."""
    m = jnp.max(jnp.abs(iq), axis=tuple(range(1, iq.ndim)), keepdims=True)
    return iq / jnp.maximum(m, 1e-12)


@partial(jax.jit, static_argnames=("n_trials", "frame_length", "channel_type",
                                   "nonlinear", "gen_apply", "normalization",
                                   "int_mode", "protocol", "gen_q_apply"))
def _one_snr_batch(
    key: jax.Array,
    params_g,
    snr_db: jnp.ndarray,
    n_trials: int,
    frame_length: int,
    channel_type: str,
    nonlinear: bool,
    pa_saturation: float,
    gen_apply: Optional[Callable],
    normalization: str = "independent",
    int_gen_params=None,
    int_mode: str = "rtl",
    protocol: str = "oracle",
    gen_q_apply: Optional[Callable] = None,
):
    """All trials at one SNR as a single fused computation.
    Returns per-method (mse[n_trials], evm[n_trials]).

    ``protocol``:
      * "oracle" — the reference's quirk: classical equalizers receive the
        CLEAN data frame for channel estimation/adaptation
        (benchmark_comparison.py:219-245), an advantage the GAN never gets.
      * "pilot" — the fair variant: a KNOWN preamble frame precedes each
        data frame through the SAME channel realization (and the same
        nonlinear front-end); ZF/MMSE estimate H from the received/known
        preamble ratio (the time-domain analog of the pilot LS estimate in
        signal/ofdm.py:demodulate) and DFE/LMS/RLS adapt their taps on the
        preamble only, then equalize the unseen data frame. No method sees
        the clean data.
    """
    k_sym, k_imp, k_ch = jax.random.split(key, 3)
    kr, ki = jax.random.split(k_sym)
    freq = (
        jax.random.normal(kr, (n_trials, frame_length))
        + 1j * jax.random.normal(ki, (n_trials, frame_length))
    ) / jnp.sqrt(2.0)
    clean_c = ofdm_like_frame(freq)

    tx_p = None
    if protocol == "pilot":
        # deterministic public preamble (same for every trial/run)
        kp_r, kp_i = jax.random.split(jax.random.PRNGKey(2024))
        pfreq = (jax.random.normal(kp_r, (frame_length,))
                 + 1j * jax.random.normal(kp_i, (frame_length,))) / jnp.sqrt(2.0)
        tx_p = jnp.broadcast_to(ofdm_like_frame(pfreq), clean_c.shape)
        tx = jnp.concatenate([tx_p, clean_c], axis=-1)  # preamble ++ data
    else:
        tx = clean_c

    distorted = tx
    if nonlinear:
        distorted = imp_lib.pa_rapp(distorted, pa_saturation, 3.0)
        distorted = imp_lib.iq_imbalance(distorted, 1.0, 5.0)
        distorted = imp_lib.phase_noise(k_imp, distorted, -80.0, 1e6)

    noisy_c, _ = channel_lib.apply(
        k_ch, distorted, snr_db, channel_lib.ChannelConfig(channel_type)
    )
    rx_p = None
    if protocol == "pilot":
        rx_p, noisy_c = noisy_c[..., :frame_length], noisy_c[..., frame_length:]

    if normalization == "joint":
        # the TRAINING protocol's joint normalization (utils/dataset.py:284);
        # matches what the GAN was conditioned on
        from ..utils.iq import joint_max_normalize

        noisy_iq, clean_iq = joint_max_normalize(
            complex_to_iq(noisy_c).astype(jnp.float32),
            complex_to_iq(clean_c).astype(jnp.float32),
        )
    else:
        # the reference benchmark's INDEPENDENT normalization
        # (benchmark_comparison.py:129-134,196-197)
        clean_iq = _normalize_each(complex_to_iq(clean_c).astype(jnp.float32))
        noisy_iq = _normalize_each(complex_to_iq(noisy_c).astype(jnp.float32))

    results = {}

    def add(name, est_iq):
        results[name] = (
            mse(est_iq, clean_iq, per_item=True),
            evm_db(est_iq, clean_iq, per_item=True),
        )

    if gen_apply is not None:
        add("GAN", gen_apply(params_g, noisy_iq))
        if int_gen_params is not None:
            # Q1.7/Q8.8 fixed-point generator (quant/intsim RTL semantics) —
            # the deployed datapath's accuracy measured in the same sweep,
            # something the reference could only probe via iverilog runs.
            from ..quant import intsim

            yq = intsim.generator_int_forward(
                int_gen_params, intsim.float_to_q88(noisy_iq), int_mode
            )
            add("GAN-Q", intsim.q88_to_float(yq))
        elif gen_q_apply is not None:
            # quantization-simulated forward for model families without a
            # Q1.7 ROM datapath (the full U-Net's int8 per-channel export
            # semantics, models/full_unet.py:weight_bits/act_bits)
            add("GAN-Q", gen_q_apply(params_g, noisy_iq))
    add("NoEQ", noisy_iq)
    # Non-oracle baseline (extension over the reference): frame-wise Wiener
    # shrinkage X̂ = SNR/(1+SNR)·Y using only the sweep's nominal SNR — the
    # optimal LINEAR estimator for Gaussian frames in AWGN, with no access
    # to the clean signal. Any GAN advantage over this row under nonlinear
    # impairments is a genuine nonlinear-processing gain.
    snr_lin = 10.0 ** (snr_db / 10.0)
    add("Wiener", (snr_lin / (1.0 + snr_lin)) * noisy_iq)

    if protocol == "pilot":
        eps = 1e-10

        def norm_iq(est_c):
            return _normalize_each(complex_to_iq(est_c).astype(jnp.float32))

        h_p = rx_p / (tx_p + eps)  # per-sample LS estimate from the preamble
        add("ZF", norm_iq(noisy_c / (h_p + eps)))
        add("MMSE", norm_iq(jnp.conj(h_p) / (jnp.abs(h_p) ** 2 + 1.0 / snr_lin)
                            * noisy_c))

        def dfe_one(rp, tp, n):
            w_ff, w_fb = eq.dfe_train(rp, tp)
            return eq.dfe_equalize(n, w_ff, w_fb)

        def lms_one(rp, tp, n):
            w, _ = eq.lms_train(rp, tp)
            return eq.lms_equalize(n, w)

        def rls_one(rp, tp, n):
            w, _ = eq.rls_train(rp, tp)
            return eq.rls_equalize(n, w)

        for name, fn in (("DFE", dfe_one), ("LMS", lms_one), ("RLS", rls_one)):
            add(name, norm_iq(jax.vmap(fn)(rx_p, tx_p, noisy_c)))
    else:
        add("ZF", jax.vmap(lambda n, c: eq.zf_equalize_iq(n, c)[0])(noisy_iq, clean_iq))
        add("MMSE", jax.vmap(lambda n, c: eq.mmse_equalize_iq(n, c, snr_db)[0])(noisy_iq, clean_iq))
        add("DFE", jax.vmap(lambda n, c: eq.dfe_equalize_iq(n, c)[0])(noisy_iq, clean_iq))
        add("LMS", jax.vmap(lambda n, c: eq.lms_equalize_iq(n, c)[0])(noisy_iq, clean_iq))
        add("RLS", jax.vmap(lambda n, c: eq.rls_equalize_iq(n, c)[0])(noisy_iq, clean_iq))
    return results


def run_benchmark(
    gen_apply: Optional[Callable],
    params_g,
    n_trials: int = 100,
    frame_length: int = 16,
    snr_values: List[float] = (0, 5, 10, 15, 20, 25, 30),
    channel_type: str = "awgn",
    nonlinear: bool = False,
    pa_saturation: float = 1.0,
    seed: int = 0,
    normalization: str = "independent",
    include_quantized: bool = False,
    int_mode: str = "rtl",
    protocol: str = "oracle",
    gen_q_apply: Optional[Callable] = None,
) -> Dict[str, Dict[float, Dict[str, float]]]:
    """SNR sweep -> method -> snr -> {mse, mse_std, evm, evm_std}
    (benchmark_comparison.py:149-261). ``normalization``: "independent"
    (the reference's protocol) or "joint" (the training protocol).
    ``protocol``: "oracle" (reference quirk — equalizers see the clean data
    frame) or "pilot" (fair — known-preamble channel estimation/adaptation
    only; see _one_snr_batch)."""
    int_gen_params = None
    if include_quantized and gen_apply is not None and gen_q_apply is None:
        from ..quant import intsim

        int_gen_params = intsim.quantize_weights_rtl(
            jax.device_get(params_g), "generator"
        )
    have_q = int_gen_params is not None or (include_quantized and gen_q_apply is not None)
    methods = [m for m in METHODS
               if (gen_apply is not None or m not in ("GAN", "GAN-Q"))
               and (have_q or m != "GAN-Q")]
    out = {m: {} for m in methods}
    print(f"\nRunning benchmark: {n_trials} trials x {len(snr_values)} SNR values")
    print(f"Channel: {channel_type}, Non-linear: {nonlinear}")
    if nonlinear:
        print(f"  PA Saturation: {pa_saturation}, IQ Imbalance: 1.0dB/5deg")
    for i, snr in enumerate(snr_values):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        res = _one_snr_batch(
            key, params_g, jnp.float32(snr), n_trials, frame_length,
            channel_type, nonlinear, pa_saturation, gen_apply, normalization,
            int_gen_params, int_mode, protocol,
            gen_q_apply if include_quantized else None,
        )
        for m in methods:
            ms, es = np.asarray(res[m][0]), np.asarray(res[m][1])
            out[m][snr] = {
                "mse": float(ms.mean()), "mse_std": float(ms.std()),
                "evm": float(es.mean()), "evm_std": float(es.std()),
            }
        print(f"  SNR = {snr} dB: done")
    return out


def print_results_table(results, snr_values, title: str = ""):
    """MSE-in-dB table + improvement summary (benchmark_comparison.py:315-352)."""
    methods = [m for m in ("GAN", "GAN-Q", "MMSE", "Wiener", "DFE", "RLS", "NoEQ") if m in results]
    print(f"\n{'=' * 80}\n  {title}\n{'=' * 80}")
    header = f"{'SNR (dB)':<10}" + "".join(f"{m:>12}" for m in methods)
    print(header)
    print("-" * 80)
    for snr in snr_values:
        row = f"{snr:<10.0f}"
        for m in methods:
            row += f"{10 * np.log10(results[m][snr]['mse'] + 1e-10):>12.2f}"
        print(row)
    print("-" * 80)
    high = max(snr_values)
    if "NoEQ" in results:
        print(f"\nImprovement over No Equalization at SNR={high}dB:")
        noeq = results["NoEQ"][high]["mse"]
        for m in methods:
            if m == "NoEQ":
                continue
            imp = 10 * np.log10(noeq / (results[m][high]["mse"] + 1e-10))
            print(f"  {m}: {imp:+.2f} dB")


def plot_benchmark_results(results, snr_values, title_suffix: str = "", save_path=None):
    """MSE/EVM vs SNR figure (benchmark_comparison.py:264-312)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    methods = [m for m in METHODS if m in results]
    colors = dict(zip(METHODS, ["red", "darkred", "blue", "green", "teal", "orange", "purple", "brown", "gray"]))
    markers = dict(zip(METHODS, ["o", "h", "s", "^", "*", "v", "D", "p", "x"]))

    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    for ax, metric, ylabel in ((axes[0], "mse", "MSE (dB)"), (axes[1], "evm", "EVM (dB)")):
        for m in methods:
            vals = [results[m][s][metric] for s in snr_values]
            if metric == "mse":
                vals = [10 * np.log10(v + 1e-10) for v in vals]
            ax.plot(snr_values, vals, color=colors[m], marker=markers[m],
                    label=m, linewidth=2, markersize=8)
        ax.set_xlabel("SNR (dB)", fontsize=12)
        ax.set_ylabel(ylabel, fontsize=12)
        ax.set_title(f"{ylabel.split()[0]} vs SNR {title_suffix}", fontsize=14)
        ax.legend(loc="upper right")
        ax.grid(True, alpha=0.3)
        ax.set_xlim([min(snr_values), max(snr_values)])
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        print(f"Saved: {save_path}")
    plt.close(fig)
    return fig


def degradation_summary(results_linear, results_nonlinear, snr_values):
    """Linear-vs-nonlinear degradation table (benchmark_comparison.py:450-469)."""
    high = max(snr_values)
    rows = []
    for m in ("GAN", "MMSE", "DFE", "RLS"):
        if m not in results_linear:
            continue
        lin = 10 * np.log10(results_linear[m][high]["mse"] + 1e-10)
        nl = 10 * np.log10(results_nonlinear[m][high]["mse"] + 1e-10)
        rows.append((m, lin, nl, nl - lin))
    print(f"\nAt SNR = {high} dB:")
    print("-" * 60)
    print(f"{'Method':<12} {'Linear MSE (dB)':<18} {'Non-Linear MSE (dB)':<18} {'Degradation'}")
    print("-" * 60)
    for m, lin, nl, d in rows:
        print(f"{m:<12} {lin:>16.2f}   {nl:>16.2f}   {d:>+8.2f} dB")
    print("-" * 60)
    return rows
