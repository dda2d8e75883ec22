"""simpleGAN training CLI: ``python -m ofdmgan_tpu.simplegan.train_cli``.

Trains the 3x3 dense GAN with the MATLAB recipe, exports fixed-point text
weights, and saves generated-sample + loss-curve figures (the .m script's
outputs: gen_*/disc_*.txt, generated_samples.png, loss_curve.png).
"""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description="Train the 3x3 simpleGAN")
    parser.add_argument("--steps", type=int, default=30_000)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--dgl", type=int, default=2, help="D:G update ratio")
    parser.add_argument("--grad_mode", choices=["matlab", "exact"], default="matlab")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_dir", type=str, default="./simplegan_output")
    args = parser.parse_args()

    import jax
    import numpy as np

    from . import (
        export_weights_txt, generate_samples, init_params, pattern_score, train,
    )

    key = jax.random.PRNGKey(args.seed)
    params = init_params(key)
    params, losses = train(
        jax.random.fold_in(key, 1), params,
        n_steps=args.steps, eta_d=args.lr, eta_g=args.lr,
        dgl=args.dgl, grad_mode=args.grad_mode,
    )
    ld = np.asarray(losses["loss_d"])
    lg = np.asarray(losses["loss_g"])
    print(f"Trained {args.steps} steps | final L_D={ld[-1]:.3f} L_G={lg[-1]:.3f}")
    print("Pattern scores:", pattern_score(params))

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    counts = export_weights_txt(params, str(out))
    print(f"Exported weights: {counts}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs = np.asarray(generate_samples(params, jax.random.fold_in(key, 2), 9))
    fig, axes = plt.subplots(3, 3, figsize=(5, 5))
    for ax, img in zip(axes.flat, imgs):
        ax.imshow(img / 2 + 0.5, cmap="gray", vmin=0, vmax=1)
        ax.axis("off")
    fig.suptitle("Generated Samples (Trained simpleGAN)")
    fig.savefig(out / "generated_samples.png", dpi=130)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(ld, "r", lw=0.5, label="Discriminator Loss")
    ax.plot(lg, "b", lw=0.5, label="Generator Loss")
    ax.legend(); ax.set_xlabel("Epoch"); ax.set_ylabel("Loss"); ax.grid(alpha=0.3)
    ax.set_title("GAN Training Loss")
    fig.savefig(out / "loss_curve.png", dpi=130)
    plt.close(fig)
    print(f"Figures saved under {out}")


if __name__ == "__main__":
    main()
