"""Train and validate an EDM diffusion model on an analytic toy dataset.

The analogue of the reference's toy training entry point
(reference tests/test_karras_on_toy_dataset.py run as a script): trains an
MLP score net on a 2D Gaussian mixture and verifies the sampled
distribution against the analytic law.

Usage:
    python scripts/train_diffusion_toy.py [--steps 2000]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffsci_tpu import data
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                    MLPUncond, create_train_state,
                                    make_train_step)

    dataset = data.MixtureOfGaussiansDataset(
        num_samples=args.batch * 64,
        means=[[-2.0, 0.0], [2.0, 0.0]], weights=[0.5, 0.5], scale=0.3)
    xs = dataset.sample(jax.random.PRNGKey(0))

    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[128, 128, 128]),
                        KarrasModelConfig.from_edm(loss_metric="mse"))
    state, tx = create_train_state(model, jax.random.PRNGKey(1),
                                   (args.batch, 2))
    step_fn = make_train_step(model, tx)

    key = jax.random.PRNGKey(2)
    n = xs.shape[0]
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        lo = (i * args.batch) % (n - args.batch)
        state, metrics = step_fn(state, sub, xs[lo:lo + args.batch])
        if i % 200 == 0:
            print(f"step {i}: loss={float(metrics['train_loss']):.4f}")

    samples = model.sample(state.variables(), key, 4096, (2,), nsteps=50)
    s = np.asarray(samples)
    frac_left = (s[:, 0] < 0).mean()
    print(f"samples: modes at {s[s[:, 0] < 0, 0].mean():.2f} / "
          f"{s[s[:, 0] > 0, 0].mean():.2f} (target -2 / +2), "
          f"balance {frac_left:.2f} (target 0.5)")


if __name__ == "__main__":
    main()
