"""simpleGAN — the 3x3 circle/cross dense GAN (LSI contest design).

Behavioral parity target: reference rtl/simpleGAN/model/
LSI_Contest_simple_gan_3x3.m (toolbox-free MATLAB training) and the dense
RTL modules (simple_generator.v: 2->3 tanh -> 9 tanh;
simple_discriminator.v: 9->3 tanh -> 1 sigmoid).

Training recipe (the .m script, lines 9-20, 63-180):
  * data: 3x3 "circle" and "cross" patterns in {-1, +1}, one random sample
    per step,
  * losses: L_D = -(log(y_real)+log(1-y_fake)), L_G = -log(y_fake),
  * plain SGD, lr 0.001 both nets; D updated every step, G applied every
    DGL=2 steps, 30000 steps,
  * init 0.1·randn weights, zero biases.

Gradient-mode note: the MATLAB backprop multiplies the output delta by an
EXTRA sigmoid' factor (deltad3 = -(1-y)·y·(1-y) instead of -(1-y),
.m lines 121-146) — a softer, vanishing-gradient variant of the exact BCE
gradient. ``grad_mode="matlab"`` reproduces those exact update directions;
``grad_mode="exact"`` uses jax.grad of the stated losses. Default is
"matlab" for parity.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LATENT_DIM = 2
HIDDEN = 3
IMG = 9  # 3x3


def patterns() -> jnp.ndarray:
    """The two training patterns, flattened the MATLAB way (transpose then
    column-major == row-major of the drawn matrix, .m lines 23-31)."""
    circle = np.array([[1, 1, 1], [1, -1, 1], [1, 1, 1]], np.float32)
    cross = np.array([[-1, 1, -1], [1, 1, 1], [-1, 1, -1]], np.float32)
    return jnp.asarray(np.stack([circle.flatten(), cross.flatten()]))


class SimpleGANParams(NamedTuple):
    wg2: jnp.ndarray  # [3, 2]
    bg2: jnp.ndarray  # [3]
    wg3: jnp.ndarray  # [9, 3]
    bg3: jnp.ndarray  # [9]
    wd2: jnp.ndarray  # [3, 9]
    bd2: jnp.ndarray  # [3]
    wd3: jnp.ndarray  # [1, 3]
    bd3: jnp.ndarray  # [1]


def init_params(key: jax.Array) -> SimpleGANParams:
    ks = jax.random.split(key, 4)
    return SimpleGANParams(
        wg2=0.1 * jax.random.normal(ks[0], (HIDDEN, LATENT_DIM)),
        bg2=jnp.zeros(HIDDEN),
        wg3=0.1 * jax.random.normal(ks[1], (IMG, HIDDEN)),
        bg3=jnp.zeros(IMG),
        wd2=0.1 * jax.random.normal(ks[2], (HIDDEN, IMG)),
        bd2=jnp.zeros(HIDDEN),
        wd3=0.1 * jax.random.normal(ks[3], (1, HIDDEN)),
        bd3=jnp.zeros(1),
    )


def generator_forward(p: SimpleGANParams, ng: jnp.ndarray):
    """latent [2] -> (hidden [3], image [9]) with tanh activations."""
    ag2 = jnp.tanh(p.wg2 @ ng + p.bg2)
    x_fake = jnp.tanh(p.wg3 @ ag2 + p.bg3)
    return ag2, x_fake


def discriminator_forward(p: SimpleGANParams, x: jnp.ndarray):
    """image [9] -> (hidden [3], probability scalar)."""
    ad2 = jnp.tanh(p.wd2 @ x + p.bd2)
    y = jax.nn.sigmoid(p.wd3 @ ad2 + p.bd3)
    return ad2, y[0]


def _matlab_d_grads(p: SimpleGANParams, x_real, x_fake):
    """The .m script's hand-derived D gradients, extra-sigmoid' factor
    included (lines 121-146)."""
    ad2_r, y_r = discriminator_forward(p, x_real)
    ad2_f, y_f = discriminator_forward(p, x_fake)

    delta3_r = (-(1.0 - y_r)) * y_r * (1.0 - y_r)
    dwd3 = delta3_r * ad2_r[None, :]
    dbd3 = jnp.asarray([delta3_r])
    delta2_r = (p.wd3[0] * delta3_r) * (1.0 - ad2_r**2)
    dwd2 = jnp.outer(delta2_r, x_real)
    dbd2 = delta2_r

    delta3_f = y_f * y_f * (1.0 - y_f)
    dwd3 = dwd3 + delta3_f * ad2_f[None, :]
    dbd3 = dbd3 + jnp.asarray([delta3_f])
    delta2_f = (p.wd3[0] * delta3_f) * (1.0 - ad2_f**2)
    dwd2 = dwd2 + jnp.outer(delta2_f, x_fake)
    dbd2 = dbd2 + delta2_f
    return dwd2, dbd2, dwd3, dbd3


def _matlab_g_grads(p: SimpleGANParams, ng):
    """Hand-derived G gradients (lines 151-170)."""
    ag2, x_fake = generator_forward(p, ng)
    ad2_f, y_f = discriminator_forward(p, x_fake)
    delta3 = (-(1.0 - y_f)) * y_f * (1.0 - y_f)
    delta2 = (p.wd3[0] * delta3) * (1.0 - ad2_f**2)
    deltag3 = (p.wd2.T @ delta2) * (1.0 - x_fake**2)
    dwg3 = jnp.outer(deltag3, ag2)
    dbg3 = deltag3
    deltag2 = (p.wg3.T @ deltag3) * (1.0 - ag2**2)
    dwg2 = jnp.outer(deltag2, ng)
    dbg2 = deltag2
    return dwg2, dbg2, dwg3, dbg3


def _exact_d_grads(p: SimpleGANParams, x_real, x_fake):
    def loss(q):
        _, y_r = discriminator_forward(q, x_real)
        _, y_f = discriminator_forward(q, x_fake)
        return -(jnp.log(y_r + 1e-8) + jnp.log(1.0 - y_f + 1e-8))

    g = jax.grad(loss)(p)
    return g.wd2, g.bd2, g.wd3, g.bd3


def _exact_g_grads(p: SimpleGANParams, ng):
    def loss(q):
        _, x_fake = generator_forward(q, ng)
        _, y_f = discriminator_forward(
            p._replace(wg2=q.wg2, bg2=q.bg2, wg3=q.wg3, bg3=q.bg3), x_fake
        )
        return -jnp.log(y_f + 1e-8)

    g = jax.grad(loss)(p)
    return g.wg2, g.bg2, g.wg3, g.bg3


@partial(jax.jit, static_argnames=("n_steps", "dgl", "grad_mode"))
def train(
    key: jax.Array,
    params: SimpleGANParams,
    n_steps: int = 30_000,
    eta_d: float = 0.001,
    eta_g: float = 0.001,
    dgl: int = 2,
    grad_mode: str = "matlab",
) -> Tuple[SimpleGANParams, Dict[str, jnp.ndarray]]:
    """Full training loop as one lax.scan (.m lines 63-180)."""
    data = patterns()

    def step(carry, inp):
        p = carry
        k, i = inp
        k_idx, k_ng1, k_ng2 = jax.random.split(k, 3)
        idx = jax.random.randint(k_idx, (), 0, data.shape[0])
        x_real = data[idx]
        ng = jax.random.normal(k_ng1, (LATENT_DIM,))
        _, x_fake = generator_forward(p, ng)

        if grad_mode == "matlab":
            dwd2, dbd2, dwd3, dbd3 = _matlab_d_grads(p, x_real, x_fake)
        else:
            dwd2, dbd2, dwd3, dbd3 = _exact_d_grads(p, x_real, x_fake)
        _, y_r = discriminator_forward(p, x_real)
        _, y_f = discriminator_forward(p, x_fake)
        loss_d = -(jnp.log(y_r + 1e-8) + jnp.log(1.0 - y_f + 1e-8))
        p = p._replace(
            wd3=p.wd3 - eta_d * dwd3, bd3=p.bd3 - eta_d * dbd3,
            wd2=p.wd2 - eta_d * dwd2, bd2=p.bd2 - eta_d * dbd2,
        )

        ng2 = jax.random.normal(k_ng2, (LATENT_DIM,))
        if grad_mode == "matlab":
            dwg2, dbg2, dwg3, dbg3 = _matlab_g_grads(p, ng2)
        else:
            dwg2, dbg2, dwg3, dbg3 = _exact_g_grads(p, ng2)
        _, xf2 = generator_forward(p, ng2)
        _, yf2 = discriminator_forward(p, xf2)
        loss_g = -jnp.log(yf2 + 1e-8)
        apply_g = ((i + 1) % dgl) == 0  # MATLAB: rem(epoch, DGL) == 0, 1-based
        p = p._replace(
            wg3=jnp.where(apply_g, p.wg3 - eta_g * dwg3, p.wg3),
            bg3=jnp.where(apply_g, p.bg3 - eta_g * dbg3, p.bg3),
            wg2=jnp.where(apply_g, p.wg2 - eta_g * dwg2, p.wg2),
            bg2=jnp.where(apply_g, p.bg2 - eta_g * dbg2, p.bg2),
        )
        return p, {"loss_d": loss_d, "loss_g": loss_g}

    keys = jax.random.split(key, n_steps)
    params, losses = jax.lax.scan(step, params, (keys, jnp.arange(n_steps)))
    return params, losses


def generate_samples(p: SimpleGANParams, key: jax.Array, n: int = 9) -> jnp.ndarray:
    """n generated 3x3 images in [-1, 1] (.m lines 196-210)."""
    ngs = jax.random.normal(key, (n, LATENT_DIM))
    _, imgs = jax.vmap(lambda z: generator_forward(p, z))(ngs)
    return imgs.reshape(n, 3, 3)


def pattern_score(p: SimpleGANParams) -> Dict[str, float]:
    """How close the canonical test latents come to the two patterns
    (.m verification section, ng=[-1;1] and [-3;3])."""
    data = np.asarray(patterns())
    out = {}
    for name, z in (("cross", (-1.0, 1.0)), ("circle", (-3.0, 3.0))):
        _, img = generator_forward(p, jnp.asarray(z))
        d = np.mean((np.asarray(img)[None] - data) ** 2, axis=1)
        out[f"{name}_latent_best_match"] = ["circle", "cross"][int(np.argmin(d))]
        out[f"{name}_latent_best_mse"] = float(d.min())
    return out
