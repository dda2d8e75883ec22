"""Full 1024-sample U-Net family: architecture vs the reference's export
metadata, export byte-format parity, full->mini ROM slicing against the
reference's checked-in export bundle, and tensor-parallel sharding."""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.models.full_unet import (
    FullDiscriminator,
    FullUNetGenerator,
    full_unet_layer_names,
    unet_param_shardings,
)
from ofdmgan_tpu.models import count_parameters
from ofdmgan_tpu.quant.export import export_full_unet, full_unet_layers

KEY = jax.random.PRNGKey(0)
REF_EXPORT = Path("/root/reference/export/generator")
REF_META = REF_EXPORT / "metadata.json"


class TestArchitecture:
    def test_forward_shapes(self):
        model = FullUNetGenerator(frame_length=1024)
        x = jnp.zeros((1, 1024, 2))
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (1, 1024, 2)
        assert float(jnp.abs(y).max()) <= 1.0

    def test_layer_shapes_match_reference_metadata(self):
        if not REF_META.exists():
            pytest.skip("reference export absent")
        meta = json.loads(REF_META.read_text())
        model = FullUNetGenerator(frame_length=1024)
        params = model.init(KEY, jnp.zeros((1, 1024, 2)))
        layers = {l.name: l for l in full_unet_layers(params)}
        assert set(layers) == set(meta["layers"])
        for name, info in meta["layers"].items():
            assert list(layers[name].weight.shape) == info["weight_shape"], name
            assert layers[name].stride == info["stride"], name

    def test_critic_forward(self):
        model = FullDiscriminator(frame_length=1024)
        x = jnp.zeros((2, 1024, 2))
        params = model.init(KEY, x, x)
        s = model.apply(params, x, x)
        assert s.shape == (2, 1)

    def test_param_count_plausible(self):
        model = FullUNetGenerator(frame_length=1024)
        params = model.init(KEY, jnp.zeros((1, 1024, 2)))
        n = count_parameters(params)
        # exact total of the reference export's weight shapes + biases
        assert n == 3_936_578, n

    def test_small_instance(self):
        # 64-sample 3-level instance (the family is parametric)
        model = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        x = jnp.zeros((2, 64, 2))
        params = model.init(KEY, x)
        assert model.apply(params, x).shape == (2, 64, 2)


class TestExportParity:
    def test_export_format_matches_reference_bundle(self, tmp_path):
        if not REF_META.exists():
            pytest.skip("reference export absent")
        model = FullUNetGenerator(frame_length=1024)
        params = model.init(KEY, jnp.zeros((1, 1024, 2)))
        meta = export_full_unet(params, str(tmp_path))
        ref = json.loads(REF_META.read_text())
        assert set(meta["layers"]) == set(ref["layers"])
        for name, info in ref["layers"].items():
            ours = meta["layers"][name]
            assert list(ours.keys()) == list(info.keys()), name
            assert ours["weight_shape"] == info["weight_shape"], name
            # byte sizes match the checked-in files
            ours_size = (tmp_path / ours["weight_file"]).stat().st_size
            ref_size = (REF_EXPORT / info["weight_file"]).stat().st_size
            assert ours_size == ref_size, name


class TestFullToMiniSlicing:
    def test_slices_reference_checked_in_export(self, tmp_path):
        """Run the reference's own export bundle through our full->mini
        codegen (export_mini_weights.py parity)."""
        if not REF_EXPORT.exists():
            pytest.skip("reference export absent")
        from ofdmgan_tpu.quant.rom_codegen import (
            generate_mini_rom_from_full_export, parse_rom_verilog,
            slice_full_export_to_mini,
        )

        weights, biases = slice_full_export_to_mini(str(REF_EXPORT))
        # enc1 region equals the first 4 output channels of enc1_1 bin
        ref_enc1 = np.fromfile(REF_EXPORT / "enc1_1_weights.bin", np.int8).reshape(32, 2, 3)
        np.testing.assert_array_equal(weights[0:24], ref_enc1[:4].flatten())
        ref_final = np.fromfile(REF_EXPORT / "final_weights.bin", np.int8).reshape(2, 32, 3)
        np.testing.assert_array_equal(weights[216:224], ref_final[:, :4, 1].flatten())
        # discriminator region zero
        assert np.all(weights[256:752] == 0)

        nw, nb = generate_mini_rom_from_full_export(str(REF_EXPORT), str(tmp_path / "rom.v"))
        assert (nw, nb) == (224, 18)
        w2, b2 = parse_rom_verilog(str(tmp_path / "rom.v"))
        np.testing.assert_array_equal(w2[:224], weights[:224])
        np.testing.assert_array_equal(b2[:18], biases[:18])


class TestTensorParallel:
    def test_tp_sharded_forward_runs(self):
        from ofdmgan_tpu.parallel import make_mesh

        mesh = make_mesh({"dp": 4, "tp": 2})
        model = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        x = jnp.zeros((8, 64, 2))
        params = model.init(KEY, x)
        shardings = unet_param_shardings(params, mesh)
        params_sharded = jax.device_put(params, shardings)
        # at least one kernel is actually split over tp
        import flax

        flat = flax.traverse_util.flatten_dict(
            jax.tree_util.tree_map(lambda a: a.sharding.spec, params_sharded)["params"]
        )
        assert any("tp" in str(s) for s in flat.values())

        from jax.sharding import NamedSharding, PartitionSpec as P

        fwd = jax.jit(
            model.apply,
            in_shardings=(shardings, NamedSharding(mesh, P("dp", None, None))),
        )
        y = fwd(params_sharded, jax.device_put(x, NamedSharding(mesh, P("dp", None, None))))
        assert y.shape == (8, 64, 2)
        assert np.isfinite(np.asarray(y)).all()

    def test_tp_matches_replicated_numerics(self):
        from ofdmgan_tpu.parallel import make_mesh

        mesh = make_mesh({"dp": 1, "tp": 8})
        model = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        x = jax.random.normal(KEY, (4, 64, 2))
        params = model.init(KEY, x)
        y_ref = model.apply(params, x)
        shardings = unet_param_shardings(params, mesh)
        y_tp = jax.jit(model.apply, in_shardings=(shardings, None))(
            jax.device_put(params, shardings), x
        )
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref), atol=2e-5)


class TestQuantizedDeployment:
    """int8 per-channel / int16-activation quantization simulation of the
    full U-Net (models/full_unet.py weight_bits/act_bits — the deployment
    story for the reference's real exported artifact,
    export/generator/metadata.json)."""

    def test_param_tree_identical_and_error_small(self):
        import jax.numpy as jnp

        g = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        gq = FullUNetGenerator(frame_length=64, levels=3, base_channels=8,
                               weight_bits=8, act_bits=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 2))
        p = g.init(jax.random.PRNGKey(1), x)
        assert jax.tree_util.tree_structure(p) == \
            jax.tree_util.tree_structure(gq.init(jax.random.PRNGKey(1), x))
        y, yq = g.apply(p, x), gq.apply(p, x)
        rms = float(jnp.sqrt(jnp.mean(y**2)))
        assert float(jnp.max(jnp.abs(y - yq))) < 0.1 * rms

    def test_kernel_quantization_matches_export_semantics(self):
        """The simulated forward's weights must round-trip EXACTLY like the
        export bundle's int8 quantization (quant/export.py:93-108)."""
        import numpy as np

        from ofdmgan_tpu.quant.export import quantize_layer_int8
        from ofdmgan_tpu.quant.fakequant import fake_quantize_auto

        g = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 2))
        p = g.init(jax.random.PRNGKey(1), x)
        k = np.asarray(p["params"]["enc1_1"]["kernel"])       # [k, cin, cout]
        q8, scale = quantize_layer_int8(np.transpose(k, (2, 1, 0)))
        deq = q8.astype(np.float32) * np.asarray(scale).reshape(-1, 1, 1)
        kq = np.asarray(fake_quantize_auto(jnp.asarray(k), 8,
                                           per_channel=True, channel_axis=2))
        np.testing.assert_array_equal(np.transpose(kq, (2, 1, 0)), deq)

    def test_qat_gradients_flow(self):
        """STE: the quantized forward must be trainable (finite, nonzero
        grads on every kernel)."""
        import jax.numpy as jnp

        gq = FullUNetGenerator(frame_length=64, levels=3, base_channels=8,
                               weight_bits=8, act_bits=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
        p = gq.init(jax.random.PRNGKey(1), x)
        grads = jax.grad(lambda p: jnp.mean(jnp.abs(gq.apply(p, x) - x)))(p)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
