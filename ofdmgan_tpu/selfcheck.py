"""Module self-verification runner: ``python -m ofdmgan_tpu.selfcheck``.

The reference makes every library module executable with a self-verifying
``__main__`` block (SURVEY.md §4.2). Here those checks are centralized: one
command exercises each subsystem end-to-end on the current backend and
prints PASS/FAIL per module. Exit code 0 iff everything passed.
"""

from __future__ import annotations

import sys
import traceback


def _check_signal():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .signal import DatagenConfig, OFDMSpec, ofdm, qam, synthetic_batch

    key = jax.random.PRNGKey(0)
    bits = jax.random.bernoulli(key, 0.5, (120,)).astype(jnp.int32)

    @jax.jit
    def roundtrip(bits):
        spec = OFDMSpec(n_subcarriers=16, cp_length=4, pilot_spacing=4)
        syms = qam.modulate(bits, "QAM16")
        sig = ofdm.modulate(syms, spec)
        data, _ = ofdm.demodulate(sig, spec)
        return jnp.mean((qam.demodulate(data[: syms.shape[-1]], "QAM16") != bits) * 1.0)

    assert float(roundtrip(bits)) == 0.0, "QAM/OFDM roundtrip BER != 0"
    out = jax.jit(lambda k: synthetic_batch(k, 256, DatagenConfig.make()))(key)
    assert out["noisy"].shape == (256, 16, 2)
    assert np.isfinite(np.asarray(out["noisy"])).all()


def _check_models():
    import jax
    import jax.numpy as jnp

    from .models import MiniDiscriminator, MiniGenerator, count_parameters

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 2))
    g, d = MiniGenerator(), MiniDiscriminator()
    pg, pd = g.init(key, x), d.init(key, x, x)
    assert count_parameters(pg) == 258 and count_parameters(pd) == 521
    assert jax.jit(g.apply)(pg, x).shape == (2, 16, 2)
    assert jax.jit(d.apply)(pd, x, x).shape == (2, 1)


def _check_training():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models import MiniDiscriminator, MiniGenerator
    from .signal import DatagenConfig
    from .training import LossConfig, TrainState, make_adam, make_train_step

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 2))
    g, d = MiniGenerator(), MiniDiscriminator()
    tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
    state = TrainState.create(g.init(key, x), d.init(key, x, x), tx_g, tx_d)
    step = make_train_step(g.apply, d.apply, tx_g, tx_d, DatagenConfig.make(),
                           LossConfig(n_critic=2), 64, donate=False)
    _, m = step(state, key)
    assert all(np.isfinite(float(v)) for v in m.values())


def _check_quant():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models import MiniGenerator
    from .quant import intsim

    params = jax.device_get(MiniGenerator().init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 2))))
    ip = intsim.quantize_weights_rtl(params, "generator")
    y = intsim.generator_int_forward(
        ip, intsim.float_to_q88(jnp.ones((1, 16, 2)) * 0.3), "rtl"
    )
    assert int(jnp.abs(y).max()) <= 256


def _check_equalizers():
    import jax
    import numpy as np

    from .eval import compare_equalizers

    rng = np.random.default_rng(0)
    clean = (rng.choice([-1, 1], 64) + 1j * rng.choice([-1, 1], 64)) / np.sqrt(2)
    noisy = clean + 0.1 * (rng.standard_normal(64) + 1j * rng.standard_normal(64))
    clean_iq = np.stack([clean.real, clean.imag], -1).astype(np.float32)
    noisy_iq = np.stack([noisy.real, noisy.imag], -1).astype(np.float32)
    # host-side sanity check: the equalizer scans run eagerly, which the
    # remote TPU backend doesn't support (per-op dispatch) — pin to CPU,
    # like the other host-side verify tools
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        import jax.numpy as jnp

        res = compare_equalizers(jnp.asarray(noisy_iq), jnp.asarray(clean_iq))
    assert set(res) == {"ZF", "MMSE", "DFE", "LMS", "RLS"}


def _check_cosim():
    from .verify import cosim

    if not cosim.available():
        raise RuntimeError("native fixsim build failed")


def _check_pallas_datagen():
    """Statistical validation of the Pallas datagen kernel against the XLA
    lowering — needs the real TPU PRNG (the CPU interpreter stubs
    prng_random_bits to zeros), so it runs here on the hardware the kernel
    targets and is skipped on CPU (tests/test_pallas_datagen.py carries the
    CPU-checkable plumbing/basis half)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        print("    (skipped on cpu: needs hardware PRNG)")
        return
    import functools

    import jax.numpy as jnp
    import numpy as np

    from .ops.pallas_datagen import synthetic_batch_pallas
    from .signal import DatagenConfig, synthetic_batch

    # everything (key creation included) stays inside one jitted program —
    # eager ops are unsupported on the remote backend
    @functools.partial(jax.jit, static_argnames="nl")
    def stats(seed, nl):
        out = synthetic_batch_pallas(jax.random.PRNGKey(seed), 65536,
                                     nonlinear=nl, pa_saturation=0.8)
        cfg = DatagenConfig.make(frame_length=16, snr_range=(0, 30),
                                 nonlinear=nl, pa_saturation=0.8)
        ref = synthetic_batch(jax.random.PRNGKey(seed + 1), 65536, cfg)
        return {
            "noisy_std": (jnp.std(out["noisy"]), jnp.std(ref["noisy"])),
            "clean_std": (jnp.std(out["clean"]), jnp.std(ref["clean"])),
            "l1": (jnp.mean(jnp.abs(out["noisy"] - out["clean"])),
                   jnp.mean(jnp.abs(ref["noisy"] - ref["clean"]))),
            "snr": (jnp.min(out["snr"]), jnp.max(out["snr"]), jnp.mean(out["snr"])),
        }

    measured = {}
    for nl in (False, True):
        m = jax.device_get(stats(0, nl))
        task = "nonlinear" if nl else "linear"
        for field in ("noisy_std", "clean_std", "l1"):
            a, b = (float(v) for v in m[field])
            assert abs(a - b) < 0.01, (nl, field, a, b)
            measured[f"{task}_{field}_pallas"] = a
            measured[f"{task}_{field}_xla"] = b
        lo, hi, mean = (float(v) for v in m["snr"])
        assert lo >= 0 and hi <= 30 and abs(mean - 15) < 0.5, (lo, hi, mean)
        assert np.isfinite([lo, hi, mean]).all()
        measured[f"{task}_snr_min_max_mean"] = [lo, hi, mean]
    return measured


CHECKS = {
    "signal": _check_signal,
    "models": _check_models,
    "training": _check_training,
    "quant": _check_quant,
    "equalizers": _check_equalizers,
    "native-cosim": _check_cosim,
    "pallas-datagen": _check_pallas_datagen,
}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None,
                    help="write a machine-readable artifact (per-check status "
                         "+ measured pallas-datagen statistics) to this path")
    args = ap.parse_args(argv)

    ok = True
    report = {}
    for name, fn in CHECKS.items():
        try:
            detail = fn()
            print(f"  [PASS] {name}")
            report[name] = {"status": "pass", **({"measured": detail} if detail else {})}
        except Exception as e:
            ok = False
            print(f"  [FAIL] {name}")
            traceback.print_exc()
            report[name] = {"status": "fail", "error": repr(e)}
    print("ALL PASSED" if ok else "FAILURES PRESENT")
    if args.json:
        import json
        import platform
        import time

        import jax

        report["_meta"] = {
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "python": platform.python_version(),
            "jax": jax.__version__,
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "ok": ok,
        }
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"artifact written: {args.json}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
