"""AOT serving export (export_serving.py): StableHLO round trip.

The artifact must load WITHOUT the repo's model code and reproduce the
in-process forward, with a symbolic batch dimension (one artifact, any
batch size). Counterpart of the reference's FPGA export bundle tests —
here the deployment target is a PJRT runtime instead of an FPGA.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
MINI_CHAMPION = REPO / "results/residual_checkpoints/nonlinear/champion_params_g.npz"


@pytest.fixture(scope="module")
def exported_mini(tmp_path_factory):
    out = tmp_path_factory.mktemp("serving") / "mini_residual"
    r = subprocess.run(
        [sys.executable, str(REPO / "export_serving.py"), "--model", "mini",
         "--checkpoint", str(MINI_CHAMPION), "--residual",
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "selftest: PASS" in r.stdout
    return out


def test_artifact_and_metadata(exported_mini):
    art = exported_mini.with_suffix(".stablehlo")
    meta = json.loads(exported_mini.with_suffix(".metadata.json").read_text())
    assert art.stat().st_size == meta["artifact_bytes"]
    assert meta["n_params_baked"] == 258
    assert set(meta["platforms"]) == {"tpu", "cpu"}
    assert meta["input"].startswith("[b, 16, 2]")


def test_symbolic_batch_roundtrip(exported_mini):
    """Deserialized artifact == in-process residual forward, at two batch
    sizes through the same artifact (symbolic b)."""
    from jax import export as jexport

    from ofdmgan_tpu.models.flat import make_generator_flat_apply
    from ofdmgan_tpu.utils.params_io import load_params_tree

    back = jexport.deserialize(
        exported_mini.with_suffix(".stablehlo").read_bytes())
    params = load_params_tree(str(MINI_CHAMPION))
    apply = make_generator_flat_apply(input_residual=True)
    for batch in (3, 17):
        x = jax.random.normal(jax.random.PRNGKey(batch), (batch, 16, 2),
                              jnp.float32)
        y_art = np.asarray(back.call(x))
        y_ref = np.asarray(apply(params, x))
        assert y_art.shape == (batch, 16, 2)
        np.testing.assert_allclose(y_art, y_ref, rtol=0, atol=1e-6)


def test_full_model_export_small():
    """The full-family export path (fused serving decoder, bf16, baked
    params) round-trips on a REDUCED U-Net via the library API — the CLI's
    3.94M-param export is exercised on-chip (results/RESULTS.md §Serving)."""
    from jax import export as jexport

    from ofdmgan_tpu.models.full_unet import FullUNetGenerator
    from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply

    model = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 2)))
    baked = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    inner = make_unet_infer_apply(levels=3)

    def apply(x):
        return inner(baked, x).astype(jnp.float32)

    (b,) = jexport.symbolic_shape("b")
    exp = jexport.export(jax.jit(apply), platforms=("tpu", "cpu"))(
        jax.ShapeDtypeStruct((b, 64, 2), jnp.float32))
    back = jexport.deserialize(exp.serialize())
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 64, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(back.call(x)),
                               np.asarray(apply(x)), rtol=0, atol=1e-2)


class TestCommittedArtifacts:
    """Parity for the COMMITTED results/serving/*.stablehlo artifacts (not
    just freshly-exported ones) so they cannot rot silently as model code
    evolves (VERDICT r3 item 9): deserialize on the CPU backend, assert
    byte integrity vs the metadata sha256, and numerical equality with the
    live forward at a pinned batch."""

    def _load(self, stem):
        import hashlib

        from jax import export as jexport

        art = REPO / "results" / "serving" / f"{stem}.stablehlo"
        meta = json.loads(
            (REPO / "results" / "serving" / f"{stem}.metadata.json").read_text())
        blob = art.read_bytes()
        assert len(blob) == meta["artifact_bytes"]
        assert hashlib.sha256(blob).hexdigest() == meta["artifact_sha256"]
        return jexport.deserialize(blob), meta

    def test_committed_mini_residual_parity(self):
        from ofdmgan_tpu.models.flat import make_generator_flat_apply
        from ofdmgan_tpu.utils.params_io import load_params_tree

        back, meta = self._load("mini_residual_nonlinear")
        params = load_params_tree(str(REPO / meta["checkpoint"]))
        apply = make_generator_flat_apply(input_residual=True)
        x = jax.random.normal(jax.random.PRNGKey(7), (9, 16, 2), jnp.float32)
        np.testing.assert_allclose(np.asarray(back.call(x)),
                                   np.asarray(apply(params, x)),
                                   rtol=0, atol=1e-6)

    def test_committed_full_unet_parity(self):
        from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply
        from ofdmgan_tpu.utils.params_io import load_params_tree

        back, meta = self._load("full_awgn_nonlinear")
        params = load_params_tree(str(REPO / meta["checkpoint"]))
        baked = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        inner = make_unet_infer_apply(act_dtype=jnp.bfloat16)

        def apply(x):
            with jax.default_matmul_precision("bfloat16"):
                return inner(baked, x.astype(jnp.bfloat16)).astype(jnp.float32)

        x = jax.random.normal(jax.random.PRNGKey(8), (2, 1024, 2), jnp.float32)
        y_art = np.asarray(back.call(x))
        y_ref = np.asarray(jax.jit(apply)(x))
        assert y_art.shape == (2, 1024, 2)
        np.testing.assert_allclose(y_art, y_ref, rtol=0, atol=2e-2)

    @pytest.mark.parametrize("stem", ["full_fading_gan", "full_fading_gan_v2",
                                      "full_fading_gan_v3",
                                      "full_fading_gan_v4"])
    def test_committed_full_fading_gan_parity(self, stem):
        """Round 5: the shipped fading-GAN frontier-ladder artifacts
        (results/serving/full_fading_gan*.stablehlo) — same contract as the
        AWGN full artifact: byte integrity + numerical parity with the
        live bf16 fused-decoder serving forward."""
        from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply
        from ofdmgan_tpu.utils.params_io import load_params_tree

        back, meta = self._load(stem)
        params = load_params_tree(str(REPO / meta["checkpoint"]))
        baked = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        inner = make_unet_infer_apply(act_dtype=jnp.bfloat16)

        def apply(x):
            with jax.default_matmul_precision("bfloat16"):
                return inner(baked, x.astype(jnp.bfloat16)).astype(jnp.float32)

        x = jax.random.normal(jax.random.PRNGKey(9), (2, 1024, 2), jnp.float32)
        y_art = np.asarray(back.call(x))
        y_ref = np.asarray(jax.jit(apply)(x))
        assert y_art.shape == (2, 1024, 2)
        np.testing.assert_allclose(y_art, y_ref, rtol=0, atol=2e-2)
