"""Minimal unconditional 2D DDPM prototype (the `explorations/
base_model.ipynb` equivalent, as a runnable script).

Trains a tiny UNet on synthetic BraTS slices for a couple of epochs on
whatever backend is available (CPU-friendly sizes), prints the loss curve,
and writes a DDIM sample grid — the one-file end-to-end smoke demo of the
framework's core loop.

Usage: python examples/minimal_2d_ddpm.py [--epochs 2] [--out grid.png]
"""

import argparse
import sys
import tempfile
from pathlib import Path

# allow running straight from a checkout: python examples/<script>.py
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=16)
    ap.add_argument("--out", default="minimal_ddpm_grid.png")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mrijax.data import BatchLoader, SliceDataset2D
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
    from mrijax.io import save_grid_png
    from mrijax.models import UNet2D
    from mrijax.train import create_train_state, make_diffusion_train_step

    root = write_synthetic_brats(
        tempfile.mkdtemp(prefix="brats_mini_"), num_subjects=2, shape=(32, 32, 20)
    )
    ds = SliceDataset2D(root, image_size=args.image_size)
    loader = BatchLoader(ds, batch_size=8)
    print(f"dataset: {len(ds)} slices; backend: {jax.default_backend()}")

    model = UNet2D(in_channels=1, out_channels=1, base_channels=8,
                   channel_mults=(1, 2), time_emb_dim=16)
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(50)))
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, args.image_size, args.image_size, 1)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)))
    state = create_train_state(params, 2e-3)
    step = make_diffusion_train_step(model, diffusion)

    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        losses = []
        t0 = time.time()
        for batch in loader:
            key, sub = jax.random.split(key)
            state, loss = step(state, batch, sub)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({len(losses)} steps, {time.time()-t0:.1f}s)")

    def model_fn(x, t):
        return model.apply(state.params, x, t, jnp.full((x.shape[0],), 0.5))

    grid = diffusion.ddim_sample(
        model_fn, (16, args.image_size, args.image_size, 1),
        jax.random.PRNGKey(1), num_steps=10,
    )
    save_grid_png(args.out, np.asarray(grid)[..., 0], nrow=4)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
