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
