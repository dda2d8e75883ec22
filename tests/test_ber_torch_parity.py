"""BER evaluation + torch-checkpoint porting tests. The parity test loads
the reference implementation directly (read-only) and asserts exact forward
agreement between the ported params and the torch model."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.eval.ber import (
    ber_curve_snr_offset, ber_ofdm, ber_time_domain,
)
from ofdmgan_tpu.models import MiniGenerator

KEY = jax.random.PRNGKey(0)
REF = Path("/root/reference")


class TestBER:
    def test_noeq_ber_decreases_with_snr(self):
        curve = ber_time_domain(None, None, [0.0, 6.0, 12.0], n_frames=512)
        assert curve[0.0] > curve[6.0] > curve[12.0]
        assert curve[0.0] > 0.05

    def test_ofdm_protocol_roundtrip_at_high_snr(self):
        curve = ber_ofdm(None, None, [40.0], n_frames=256)
        assert curve[40.0] < 1e-3  # near-noiseless channel, no enhancer

    def test_gan_ber_runs(self):
        gen = MiniGenerator()
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        curve = ber_time_domain(gen.apply, params, [10.0], n_frames=256)
        assert 0.0 <= curve[10.0] <= 1.0

    def test_snr_offset(self):
        a = {0.0: 0.1, 10.0: 0.01, 20.0: 0.001}
        b = {0.0: 0.1, 10.0: 0.01, 20.0: 0.001}
        assert abs(ber_curve_snr_offset(a, b, 1e-2)) < 1e-9
        shifted = {k: v for k, v in zip([2.0, 12.0, 22.0], a.values())}
        off = ber_curve_snr_offset(shifted, b, 1e-2)
        assert abs(off - 2.0) < 1e-6

    def test_offset_none_when_unreachable(self):
        floor = {0.0: 0.2, 10.0: 0.05, 20.0: 0.04}  # never hits 1e-2
        good = {0.0: 0.1, 10.0: 0.01, 20.0: 0.001}
        assert ber_curve_snr_offset(floor, good, 1e-2) is None


@pytest.mark.skipif(not REF.exists(), reason="reference absent")
class TestTorchPort:
    def test_forward_parity_with_reference_model(self):
        """Random torch reference model -> ported params -> identical
        forward outputs (float32 rounding)."""
        import torch

        sys.path.insert(0, str(REF))
        from models.generator import MiniGenerator as TorchGen

        from ofdmgan_tpu.utils.torch_port import generator_params_from_torch

        torch.manual_seed(42)
        tm = TorchGen()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = generator_params_from_torch(sd)

        x = np.random.default_rng(0).standard_normal((8, 2, 16)).astype(np.float32)
        with torch.no_grad():
            y_t = tm(torch.from_numpy(x)).numpy()
        gen = MiniGenerator()
        y_j = np.swapaxes(
            np.asarray(gen.apply(params, jnp.asarray(np.swapaxes(x, 1, 2)))), 1, 2
        )
        np.testing.assert_allclose(y_t, y_j, atol=1e-6)

    def test_discriminator_port(self):
        import torch

        sys.path.insert(0, str(REF))
        from models.discriminator import MiniDiscriminator as TorchDisc

        from ofdmgan_tpu.models import MiniDiscriminator
        from ofdmgan_tpu.utils.torch_port import discriminator_params_from_torch

        torch.manual_seed(1)
        tm = TorchDisc()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = discriminator_params_from_torch(sd)
        x = np.random.default_rng(1).standard_normal((4, 2, 16)).astype(np.float32)
        c = np.random.default_rng(2).standard_normal((4, 2, 16)).astype(np.float32)
        with torch.no_grad():
            s_t = tm(torch.from_numpy(x), torch.from_numpy(c)).numpy()
        disc = MiniDiscriminator()
        s_j = np.asarray(disc.apply(
            params, jnp.asarray(np.swapaxes(x, 1, 2)), jnp.asarray(np.swapaxes(c, 1, 2))
        ))
        np.testing.assert_allclose(s_t, s_j, atol=1e-5)
