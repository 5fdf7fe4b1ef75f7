"""NaN/Inf guard: non-finite steps must not touch the parameters.

The reference has no such protection (SURVEY §5: "no NaN guards") — one
overflowing batch permanently poisons training. With
``TrainConfig.nan_guard`` the optimizer update is applied only when the
loss and every gradient are finite.
"""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
from mrijax.models import UNet2D
from mrijax.train.state import TrainState
from mrijax.train.steps import apply_if_finite, make_diffusion_train_step


def _state(params, lr=1e-2):
    return TrainState.create(apply_fn=None, params=params, tx=optax.adam(lr))


def test_apply_if_finite_selects_old_state_on_nan():
    params = {"w": jnp.ones((3,))}
    state = _state(params)
    good = {"w": jnp.full((3,), 0.5)}
    bad = {"w": jnp.asarray([0.5, jnp.nan, 0.5])}

    new_state, loss = apply_if_finite(state, good, jnp.float32(1.0))
    assert not np.allclose(np.asarray(new_state.params["w"]), 1.0)
    assert int(new_state.step) == 1

    # NaN gradient: params AND optimizer state stay put
    kept, loss = apply_if_finite(state, bad, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(kept.params["w"]), 1.0)
    assert int(kept.step) == 0

    # NaN loss with finite grads: also skipped
    kept2, loss2 = apply_if_finite(state, good, jnp.float32(jnp.nan))
    np.testing.assert_array_equal(np.asarray(kept2.params["w"]), 1.0)
    assert not np.isfinite(float(loss2))


def test_guarded_train_step_survives_nan_batch():
    model = UNet2D(in_channels=1, out_channels=1, base_channels=8,
                   channel_mults=(1, 2), time_emb_dim=16, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    diff = GaussianDiffusion(make_schedule(linear_beta_schedule(10)))
    step = make_diffusion_train_step(model, diff, donate=False, nan_guard=True)
    state = _state(params, lr=1e-3)

    clean = {
        "image": jnp.zeros((2, 16, 16, 1)) + 0.1,
        "z_pos": jnp.asarray([0.3, 0.7]),
    }
    poisoned = {
        "image": clean["image"].at[0, 0, 0, 0].set(jnp.nan),
        "z_pos": clean["z_pos"],
    }

    s1, loss1 = step(state, poisoned, jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss1))  # reported for logging/alerting
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s2, loss2 = step(s1, clean, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params))
    )
    assert changed
