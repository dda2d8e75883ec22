#!/usr/bin/env python3
"""Self-checking model test script — the reference's test_models.py surface
(six tests, exit code 0/1). The full pytest suite lives in tests/; this
script is the quick standalone sanity runner the reference ships at its
repo root (test_models.py:10-228)."""

import sys


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ofdmgan_tpu.config import load_config
    from ofdmgan_tpu.models import (
        MiniDiscriminator, MiniGenerator, count_parameters,
    )

    key = jax.random.PRNGKey(0)
    results = []

    def check(name, fn):
        try:
            fn()
            print(f"  [PASS] {name}")
            results.append(True)
        except Exception as e:
            print(f"  [FAIL] {name}: {e}")
            results.append(False)

    gen = MiniGenerator()
    disc = MiniDiscriminator()
    x = jax.random.normal(key, (2, 16, 2))
    pg = gen.init(key, x)
    pd = disc.init(key, x, x)

    def test_generator():
        y = gen.apply(pg, x)
        assert y.shape == (2, 16, 2), y.shape
        assert float(jnp.abs(y).max()) <= 1.0

    def test_discriminator():
        s = disc.apply(pd, x, x)
        assert s.shape == (2, 1), s.shape

    def test_training_config():
        cfg = load_config("config/config.yaml")
        assert cfg["ofdm"]["frame_length"] == 16
        lr = float(cfg["training"]["optimizer"]["lr_generator"])
        assert 0 < lr < 1

    def test_parameter_count():
        ng, nd = count_parameters(pg), count_parameters(pd)
        assert ng < 1000 and nd < 1000, (ng, nd)
        assert ng == 258 and nd == 521, (ng, nd)

    def test_gradient_flow():
        def loss(pg_, pd_):
            fake = gen.apply(pg_, x)
            return -jnp.mean(disc.apply(pd_, fake, x)) + jnp.mean(jnp.abs(fake - x))

        gg, gd = jax.grad(loss, argnums=(0, 1))(pg, pd)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves((gg, gd)))
        assert np.isfinite(total) and total > 0

    def test_rtl_compatibility():
        assert (gen.input_channels, gen.enc1_channels, gen.bottleneck_channels,
                gen.dec1_channels, gen.output_channels) == (2, 4, 8, 4, 2)
        assert (disc.input_channels, disc.conv1_channels, disc.conv2_channels) == (4, 8, 16)

    print("Running model self-checks:")
    check("generator forward", test_generator)
    check("discriminator forward", test_discriminator)
    check("training config", test_training_config)
    check("parameter count (258/521)", test_parameter_count)
    check("gradient flow", test_gradient_flow)
    check("RTL channel-progression compatibility", test_rtl_compatibility)
    n_pass = sum(results)
    print(f"\n{n_pass}/{len(results)} tests passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
