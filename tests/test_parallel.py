"""Distributed-without-a-cluster tests (SURVEY.md §4.4): the shard_map DP step
on 8 virtual CPU devices must match the single-device step on the full batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import get_config
from keypoints_tpu.parallel import (data_parallel_mesh, make_dp_train_step,
                                    replicate, shard_batch)
from keypoints_tpu.training import build_model, init_state, make_train_step


def _cfg():
    return get_config("pong64").override(**{
        "model.encoder_filters": (8, 16),
        "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True),
        "model.groups": 4,
        "data.image_size": 32,
        "data.pair_mode": "temporal",   # avoid per-shard RNG aug in the
        "train.batch_size": 16,          # equivalence check
        "train.compute_dtype": "float32",
    })


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device():
    cfg = _cfg()
    mesh = data_parallel_mesh()
    n = len(jax.devices())
    assert n == 8

    rs = np.random.RandomState(0)
    batch = (jnp.array(rs.rand(16, 1, 32, 32), jnp.float32),
             jnp.array(rs.rand(16, 1, 32, 32), jnp.float32))

    state = init_state(cfg, jax.random.PRNGKey(0))
    single = jax.jit(make_train_step(cfg, build_model(cfg)))
    s1, m1 = single(state, batch, jax.random.PRNGKey(3))

    state_r = replicate(mesh, init_state(cfg, jax.random.PRNGKey(0)))
    dp = make_dp_train_step(cfg, mesh)
    s2, m2 = dp(state_r, shard_batch(mesh, batch), jax.random.PRNGKey(3))

    # pmean over 8 shards reorders the fp32 reduction vs the global mean;
    # agreement is to relative fp32 tolerance, not bitwise.
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_dp_shard_rng_decorrelated():
    # the exact helper the DP step uses must give every shard a distinct key
    from jax.sharding import PartitionSpec as P

    from keypoints_tpu.parallel.dp import DATA_AXIS, shard_rng

    mesh = data_parallel_mesh()
    f = jax.shard_map(lambda r: shard_rng(r)[None], mesh=mesh,
                      in_specs=P(), out_specs=P(DATA_AXIS), check_vma=False)
    keys = np.asarray(f(jax.random.PRNGKey(7)))
    assert keys.shape[0] == len(jax.devices())
    assert len({tuple(k) for k in keys}) == keys.shape[0]


def test_dp_warp_mode_runs_with_decorrelated_rng():
    cfg = _cfg().override(**{"data.pair_mode": "warp"})
    mesh = data_parallel_mesh()
    state = replicate(mesh, init_state(cfg, jax.random.PRNGKey(0)))
    dp = make_dp_train_step(cfg, mesh)
    imgs = jnp.array(np.random.RandomState(1).rand(16, 1, 32, 32), jnp.float32)
    s2, m = dp(state, shard_batch(mesh, imgs), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    assert int(np.asarray(s2.step)) == 1


def test_dp_fused_chunk_matches_per_step_dp():
    """The fused in-step-sampling DP chunk (VERDICT r2 missing #2) is
    semantically identical to per-step dispatch: chunk(n=4) == 4×chunk(n=1),
    and one fused step == make_dp_train_step fed the hand-assembled
    equivalent batch (per-shard key = fold_in(step key, shard index))."""
    from keypoints_tpu.parallel import make_dp_fused_chunk
    from keypoints_tpu.train import SyntheticBatches

    cfg = _cfg().override(**{"data.pair_mode": "warp"})
    mesh = data_parallel_mesh()
    n_dev = len(jax.devices())
    shard_b = cfg.train.batch_size // n_dev

    def mk(k, n):
        return jax.random.uniform(k, (n, 1, 32, 32), jnp.float32)

    smp = SyntheticBatches(mk, cfg.train.batch_size, cfg.train.seed, 0)
    rng = jax.random.PRNGKey(3)

    def state0():
        return replicate(mesh, init_state(cfg, jax.random.PRNGKey(0)))

    fused = make_dp_fused_chunk(cfg, mesh, smp)
    s_chunk, m_chunk = fused(state0(), (), rng, 4)

    s_step = m_step = None
    s_step = state0()
    for _ in range(4):
        s_step, m_step = fused(s_step, (), rng, 1)
    for a, b in zip(jax.tree_util.tree_leaves(s_chunk.params),
                    jax.tree_util.tree_leaves(s_step.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_chunk["loss"]), float(m_step["loss"]),
                               rtol=1e-5)
    assert int(np.asarray(s_chunk.step)) == 4

    # one fused step == per-step DP on the equivalent host-built batch:
    # shard i draws mk(fold_in(step_key(0), i), shard_b)
    base = smp.step_key(0)
    parts = [mk(jax.random.fold_in(base, i), shard_b) for i in range(n_dev)]
    batch = jnp.concatenate(parts, axis=0)
    dp_step = make_dp_train_step(cfg, mesh)
    s_ref, m_ref = dp_step(state0(), shard_batch(mesh, batch), rng)
    s_one, m_one = fused(state0(), (), rng, 1)
    np.testing.assert_allclose(float(m_one["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_one.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dp_warp_aug_decorrelates_shards_end_to_end():
    """VERDICT r2 #6: in the COMPOSED DP step on a constant replicated batch,
    per-shard losses differ (each shard draws its own warp), and the DP
    update equals the mean of the 8 manually-computed per-shard updates
    (SGD lr=1 turns updates into raw gradients)."""
    import optax
    from jax.sharding import PartitionSpec as P

    from keypoints_tpu.parallel.dp import shard_rng

    cfg = _cfg().override(**{"data.pair_mode": "warp"})
    mesh = data_parallel_mesh()
    n_dev = len(jax.devices())
    per = 16 // n_dev
    state = init_state(cfg, jax.random.PRNGKey(0))
    model = build_model(cfg)
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(3)

    one = jnp.array(np.random.RandomState(1).rand(per, 1, 32, 32), jnp.float32)
    batch = jnp.tile(one, (n_dev, 1, 1, 1))   # every shard: identical images

    # per-shard losses WITHOUT pmean: the only difference between shards is
    # the fold_in(axis_index) aug rng — all 8 must differ
    inner = make_train_step(cfg, model, tx=tx)

    def per_shard(st, b, r):
        _, m = inner(st, b, shard_rng(r))
        return m["loss"][None]

    f = jax.shard_map(per_shard, mesh=mesh,
                      in_specs=(P(), P("data"), P()),
                      out_specs=P("data"), check_vma=False)
    losses = np.asarray(f(state, batch, rng))
    assert losses.shape == (n_dev,)
    assert len({round(float(x), 10) for x in losses}) == n_dev

    # manual 8-shard gradient reference (fresh state for the donating DP
    # step: replicate() may alias the original buffers, which donation
    # would then delete out from under the manual loop below)
    dp_step = make_dp_train_step(cfg, mesh, tx=tx)
    s_dp, _ = dp_step(replicate(mesh, init_state(cfg, jax.random.PRNGKey(0))),
                      shard_batch(mesh, batch), rng)
    single = jax.jit(make_train_step(cfg, model, tx=tx))
    shard_params = []
    for i in range(n_dev):
        s_i, _ = single(state, batch[per * i:per * (i + 1)],
                        jax.random.fold_in(rng, i))
        shard_params.append(s_i.params)
    mean_params = jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x, np.float64) for x in xs) / n_dev,
        *shard_params)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(mean_params)):
        np.testing.assert_allclose(np.asarray(a, np.float64), b,
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dp_fused_chunk_with_grad_accum(tmp_path):
    """DP × grad_accum COMPOSED (VERDICT r3 #7): the fused DP chunk with
    accum=2 matches the accum=1 trajectory exactly (averaged micro-grads ==
    full per-shard gradient under pmean), and a per-shard batch that accum
    doesn't divide fails loudly at trace time."""
    from keypoints_tpu.parallel import make_dp_fused_chunk
    from keypoints_tpu.train import SyntheticBatches

    mesh = data_parallel_mesh()
    n_dev = len(jax.devices())
    cfg = _cfg()                       # batch 16 → per-shard 2 on 8 devices

    def mk(k, n):
        ka, kb = jax.random.split(k)
        return (jax.random.uniform(ka, (n, 1, 32, 32), jnp.float32),
                jax.random.uniform(kb, (n, 1, 32, 32), jnp.float32))

    smp = SyntheticBatches(mk, cfg.train.batch_size, cfg.train.seed, 0)
    rng = jax.random.PRNGKey(3)

    def run(accum):
        import optax
        c = cfg.override(**{"train.grad_accum": accum})
        # SGD keeps the equivalence sharp: Adam's eps-normalization
        # amplifies fp-reassociation noise (micro-sum vs one reduce) in
        # tiny bias params far beyond any meaningful tolerance
        fused = make_dp_fused_chunk(c, mesh, smp, tx=optax.sgd(1e-3))
        state = replicate(mesh, init_state(c, jax.random.PRNGKey(0)))
        state, m = fused(state, (), rng, 3)
        return state, m

    s1, m1 = run(1)
    s2, m2 = run(2)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        # micro-sum/2 vs one mean-reduce: identical up to f32 reassociation
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert int(np.asarray(s2.step)) == 3

    # per-SHARD divisibility is the binding constraint under DP: batch 16
    # splits to 2 per shard, which accum=4 does not divide — the documented
    # training.py check must fire on the composed path, not just solo
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        run(n_dev // 2)
