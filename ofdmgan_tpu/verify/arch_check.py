"""Architecture contract verification against the RTL blueprint.

Behavioral parity target: reference proof/verification.py:48-249
(MiniArchitectureVerifier) and :387-473 (run_full_verification): shape
round-trip, parameter budgets (258/521 ±5%), channel progression
(2→4→8→4→2 and 4→8→16→1), tanh output range, gradient-penalty smoke test;
results persisted to ``verification_summary.json``.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (
    MiniDiscriminator,
    MiniGenerator,
    compute_gradient_penalty,
    count_parameters,
)


@dataclasses.dataclass
class VerificationResult:
    passed: bool
    message: str
    details: Dict[str, Any]


EXPECTED_GEN_PARAMS = 258
EXPECTED_DISC_PARAMS = 521
EXPECTED_FRAME_LENGTH = 16
GEN_CHANNELS = (2, 4, 8, 4, 2)
DISC_CHANNELS = (4, 8, 16, 1)


class MiniArchitectureVerifier:
    def __init__(self, tolerance: float = 0.05):
        self.tolerance = tolerance

    def verify_generator(self, model: MiniGenerator, params) -> VerificationResult:
        results: Dict[str, Any] = {}
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, EXPECTED_FRAME_LENGTH, 2))
        try:
            y = model.apply(params, x)
            results["shape_test"] = {
                "passed": y.shape == x.shape,
                "input_shape": list(x.shape),
                "output_shape": list(y.shape),
            }
        except Exception as e:  # forward itself broken (proof/verification.py:98-99)
            results["shape_test"] = {"passed": False, "error": str(e)}
        n = count_parameters(params)
        err = abs(n - EXPECTED_GEN_PARAMS) / EXPECTED_GEN_PARAMS
        results["param_test"] = {
            "passed": err < self.tolerance,
            "actual_params": n,
            "expected_params": EXPECTED_GEN_PARAMS,
            "error": f"{err*100:.1f}%",
        }
        prog = (
            model.input_channels,
            model.enc1_channels,
            model.bottleneck_channels,
            model.dec1_channels,
            model.output_channels,
        )
        results["channel_test"] = {
            "passed": prog == GEN_CHANNELS,
            "expected": "->".join(map(str, GEN_CHANNELS)),
            "actual": "->".join(map(str, prog)),
        }
        try:
            yb = model.apply(params, jax.random.normal(key, (10, EXPECTED_FRAME_LENGTH, 2)))
            in_range = bool(jnp.min(yb) >= -1.0) and bool(jnp.max(yb) <= 1.0)
            results["range_test"] = {
                "passed": in_range,
                "min": float(jnp.min(yb)),
                "max": float(jnp.max(yb)),
                "expected_range": "[-1, 1]",
            }
        except Exception as e:
            results["range_test"] = {"passed": False, "error": str(e)}
        ok = all(r["passed"] for r in results.values())
        return VerificationResult(ok, "Generator verification " + ("PASSED" if ok else "FAILED"), results)

    def verify_discriminator(self, model: MiniDiscriminator, params) -> VerificationResult:
        results: Dict[str, Any] = {}
        key = jax.random.PRNGKey(0)
        cand = jax.random.normal(key, (1, EXPECTED_FRAME_LENGTH, 2))
        cond = jax.random.normal(jax.random.PRNGKey(1), (1, EXPECTED_FRAME_LENGTH, 2))
        score = model.apply(params, cand, cond)
        results["shape_test"] = {
            "passed": score.shape == (1, 1),
            "output_shape": list(score.shape),
            "expected_shape": [1, 1],
        }
        n = count_parameters(params)
        err = abs(n - EXPECTED_DISC_PARAMS) / EXPECTED_DISC_PARAMS
        results["param_test"] = {
            "passed": err < self.tolerance,
            "actual_params": n,
            "expected_params": EXPECTED_DISC_PARAMS,
            "error": f"{err*100:.1f}%",
        }
        prog = (model.input_channels, model.conv1_channels, model.conv2_channels, 1)
        results["channel_test"] = {
            "passed": prog == DISC_CHANNELS,
            "expected": "->".join(map(str, DISC_CHANNELS)),
            "actual": "->".join(map(str, prog)),
        }
        ok = all(r["passed"] for r in results.values())
        return VerificationResult(ok, "Discriminator verification " + ("PASSED" if ok else "FAILED"), results)


def run_full_verification(
    gen_params=None,
    disc_params=None,
    output_dir: str = "./verification_output",
) -> Dict[str, VerificationResult]:
    """Complete verification suite + golden vectors + GP smoke test
    (proof/verification.py:387-473)."""
    from .golden import generate_golden_vectors

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(0)
    gen = MiniGenerator()
    disc = MiniDiscriminator()
    x0 = jnp.zeros((1, EXPECTED_FRAME_LENGTH, 2))
    if gen_params is None:
        gen_params = gen.init(key, x0)
    if disc_params is None:
        disc_params = disc.init(key, x0, x0)

    results: Dict[str, VerificationResult] = {}
    print("Running mini architecture verification...")
    v = MiniArchitectureVerifier()
    results["generator"] = v.verify_generator(gen, gen_params)
    print(f"  Generator: {results['generator'].message}")
    results["discriminator"] = v.verify_discriminator(disc, disc_params)
    print(f"  Discriminator: {results['discriminator'].message}")

    print("\nGenerating golden vectors for RTL...")
    test_input = np.asarray(jax.random.normal(key, (1, 2, EXPECTED_FRAME_LENGTH)), np.float32)
    meta = generate_golden_vectors(gen, gen_params, test_input, str(out / "golden_vectors"))
    results["golden_vectors"] = VerificationResult(True, "Golden vectors generated successfully", meta)

    print("\nTesting gradient penalty...")
    real = jax.random.normal(key, (4, EXPECTED_FRAME_LENGTH, 2))
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, EXPECTED_FRAME_LENGTH, 2))
    cond = jax.random.normal(jax.random.PRNGKey(2), (4, EXPECTED_FRAME_LENGTH, 2))
    gp = compute_gradient_penalty(disc.apply, disc_params, real, fake, cond, jax.random.PRNGKey(3))
    results["gradient_penalty"] = VerificationResult(
        bool(np.isfinite(float(gp))), "Gradient penalty computed successfully",
        {"gp_value": float(gp)},
    )

    summary = {k: {"passed": r.passed, "message": r.message} for k, r in results.items()}
    with open(out / "verification_summary.json", "w") as f:
        json.dump(summary, f, indent=2)

    print("\n" + "=" * 60 + "\nVERIFICATION SUMMARY\n" + "=" * 60)
    all_ok = True
    for name, r in results.items():
        print(f"{name}: {'PASS' if r.passed else 'FAIL'}")
        all_ok &= r.passed
    print("=" * 60)
    print(f"OVERALL: {'ALL TESTS PASSED' if all_ok else 'SOME TESTS FAILED'}")
    return results
