"""Gradient accumulation for the stage-1 VAE step (round-3 verdict item #2).

The TPU compiler refuses the flagship-size VAE fwd+bwd at batch >= 2
(PERF.md "Stage-1 VAE training"), so effective batch can only come from a
`lax.scan` over bs-microbatches whose BODY is the compiling bs-size graph.
These tests pin the math: the scanned step's gradient equals the mean of
the per-microbatch gradients (an oracle built directly from `jax.grad`),
and therefore equals large-batch SGD on the strided microbatch grouping.
The reference has no accumulation anywhere — its stage-1 is hard-locked to
bs=1/GPU (`ddpm_3d_ldm/train.py:258-348`); this is a capability superset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

from mrijax.models import VAE3D
from mrijax.train.state import TrainState
from mrijax.train.steps import make_vae_train_step, vae_loss

KL = 1e-4


def _vae():
    return VAE3D(in_channels=4, base_channels=8, num_down=2,
                 latent_channels=4, dtype=jnp.float32)


def _state(params, lr=1e-2):
    # SGD so the optimizer is linear in the gradient: equality between the
    # scanned step and the oracle is then float-tight and discriminating
    return TrainState.create(apply_fn=None, params=params,
                             tx=optax.sgd(lr), ema_params=None)


def _batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    return {"volume": jnp.asarray(
        rng.normal(size=(b, 8, 8, 8, 4)).astype(np.float32))}


def _oracle_update(vae, state, batch, key, accum):
    """Hand-built accumulation: per-microbatch jax.grad with the SAME
    strided row assignment and fold keys, averaged, one optimizer update."""
    x = batch["volume"]
    micro = x.shape[0] // accum
    xs = jnp.moveaxis(x.reshape(micro, accum, *x.shape[1:]), 1, 0)
    keys = jax.random.split(key, accum)

    def loss_fn(params, xm, km):
        recon, mu, logvar = vae.apply(params, xm, km)
        return vae_loss(recon, xm, mu, logvar, KL)

    grads_sum = None
    losses = []
    for a in range(accum):
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, xs[a], keys[a])
        losses.append(float(loss))
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda v: v / accum, grads_sum)
    return state.apply_gradients(grads=grads), float(np.mean(losses))


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_per_microbatch_oracle(accum):
    vae = _vae()
    batch = _batch(b=4)
    params = vae.init(jax.random.PRNGKey(0), batch["volume"][:1],
                      jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(7)

    step = make_vae_train_step(vae, kl_weight=KL, donate=False,
                               grad_accum=accum)
    new_state, metrics = step(_state(params), batch, key)
    oracle_state, oracle_loss = _oracle_update(
        vae, _state(params), batch, key, accum)

    for got, want in zip(jax.tree.leaves(new_state.params),
                         jax.tree.leaves(oracle_state.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(metrics["loss"]), oracle_loss,
                               rtol=1e-6)


def test_accum_one_is_the_plain_step():
    """grad_accum=1 must be bit-identical to the historical step (same
    trace, same RNG consumption)."""
    vae = _vae()
    batch = _batch(b=2)
    params = vae.init(jax.random.PRNGKey(0), batch["volume"][:1],
                      jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)

    s_plain, m_plain = make_vae_train_step(vae, kl_weight=KL, donate=False)(
        _state(params), batch, key)
    s_acc, m_acc = make_vae_train_step(vae, kl_weight=KL, donate=False,
                                       grad_accum=1)(
        _state(params), batch, key)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_acc.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert float(m_plain["loss"]) == float(m_acc["loss"])


def test_accum_metrics_are_microbatch_means():
    vae = _vae()
    batch = _batch(b=4, seed=2)
    params = vae.init(jax.random.PRNGKey(0), batch["volume"][:1],
                      jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(11)
    step = make_vae_train_step(vae, kl_weight=KL, donate=False, grad_accum=2)
    _, metrics = step(_state(params), batch, key)
    # recon + KL*kl == loss must survive the averaging
    np.testing.assert_allclose(
        float(metrics["recon"]) + KL * float(metrics["kl"]),
        float(metrics["loss"]), rtol=1e-6)


def test_accum_nan_guard_skips_update():
    """One poisoned microbatch must leave the params untouched under
    nan_guard (the guard sees the AVERAGED gradient, which a single NaN
    microbatch poisons — exactly the all-reduce semantics of the
    multi-device step)."""
    vae = _vae()
    batch = _batch(b=4, seed=3)
    vol = np.array(batch["volume"])  # writable host copy
    vol[1] = np.nan  # strided assignment -> lands in microbatch 1 of 2
    batch = {"volume": jnp.asarray(vol)}
    params = vae.init(jax.random.PRNGKey(0), batch["volume"][:1],
                      jax.random.PRNGKey(1))
    step = make_vae_train_step(vae, kl_weight=KL, donate=False,
                               grad_accum=2, nan_guard=True)
    new_state, _ = step(_state(params), batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_accum_rejects_indivisible_batch():
    vae = _vae()
    batch = _batch(b=3)
    params = vae.init(jax.random.PRNGKey(0), batch["volume"][:1],
                      jax.random.PRNGKey(1))
    step = make_vae_train_step(vae, kl_weight=KL, donate=False, grad_accum=2)
    with pytest.raises(ValueError, match="not divisible"):
        step(_state(params), batch, jax.random.PRNGKey(0))


def test_accum_on_data_mesh_matches_single_device():
    """The scanned step under a data mesh (sharded batch dim) reproduces the
    single-device result — the strided microbatch split keeps every device
    contributing to every microbatch."""
    from mrijax.parallel import make_mesh, replicated_sharding, shard_batch

    vae = _vae()
    batch = _batch(b=8, seed=4)
    params = vae.init(jax.random.PRNGKey(0), batch["volume"][:1],
                      jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(5)
    step = make_vae_train_step(vae, kl_weight=KL, donate=False, grad_accum=2)

    single, m_single = step(_state(params), batch, key)

    mesh = make_mesh(("data",))
    state_r = jax.device_put(_state(params), replicated_sharding(mesh))
    with mesh:
        sharded, m_sharded = step(state_r, shard_batch(mesh, batch), key)
    for a, b in zip(jax.tree.leaves(single.params),
                    jax.tree.leaves(sharded.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-5)
