"""Keypoint-quality regression gates (VERDICT r3 #4, SURVEY.md §4.3).

Two layers:

* ``test_dot_locking_three_seeds`` — a CPU-scaled 3-seed convergence study
  on the tiny dot-discovery config: every seed must lock below a threshold
  set ABOVE the measured band (probed 2026-08-19: seeds 0/1/2 → medians
  0.03-0.12 at 150 steps), so a silent optimizer/model/aug regression fails
  a test instead of surfacing in a manual sweep.
* ``test_tpu_quality_band_within_thresholds`` — gates the RECORDED on-chip
  multi-seed study (benchmarks/quality.json, written by
  benchmarks/quality_sweep.py on the TPU at pinned schedules): if a future
  sweep re-run regresses past the documented band, the suite goes red. The
  thresholds sit above the measured mean+spread in BASELINE.md.
"""

import json
import os

import numpy as np
import pytest

import jax

from keypoints_tpu.configs import get_config
from keypoints_tpu.data.synthetic import moving_dots_pair
from keypoints_tpu.training import (build_model, init_state, make_extract_fn,
                                    make_train_step)

_QUALITY_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "quality.json")

# Locking-median gates for the pinned TPU schedules (quality_sweep.py).
# Set above the measured 3-seed band so run variance doesn't flake the
# suite, but low enough that "stopped learning" fails loudly.
TPU_THRESHOLDS = {
    "pong64": 0.16,             # band ~0.10 at 3k steps (r2/r3 sweeps)
    "transporter_atari": 0.16,  # band ~0.10 at 3k steps
    "celeba128": 0.20,          # band ~0.11-0.13 at 4k steps
    "pose256": 0.12,            # band 0.041-0.071 at 2k steps
}


def _tiny_cfg(seed: int):
    return get_config("pong64").override(**{
        "model.encoder_filters": (16, 32),
        "model.encoder_strides": (2, 1),
        "model.decoder_filters": (32, 16),
        "model.decoder_upsample": (True, False),
        "model.groups": 4,
        "model.num_keypoints": 1,
        "model.sigma": 0.3,
        "data.image_size": 32,
        "train.batch_size": 16,
        "train.compute_dtype": "float32",
        "train.lr": 2e-3,
        "train.warmup_steps": 10,
        "train.seed": seed,
    })


def _one_dot(key):
    return moving_dots_pair(key, 16, 32, num_dots=1, channels=1, sigma=0.12,
                            max_shift=0.8)


@pytest.mark.slow
def test_dot_locking_three_seeds():
    medians = []
    for seed in (0, 1, 2):
        cfg = _tiny_cfg(seed)
        model = build_model(cfg)
        state = init_state(cfg, jax.random.PRNGKey(seed))
        step = jax.jit(make_train_step(cfg, model))
        for i in range(150):
            src, tgt, _ = _one_dot(jax.random.PRNGKey(1000 + i))
            state, _ = step(state, (src, tgt), jax.random.PRNGKey(2))
        extract = jax.jit(make_extract_fn(cfg, model))
        _, tgt, pos = _one_dot(jax.random.PRNGKey(77))
        kp = np.asarray(extract(state.params, tgt))
        d = np.linalg.norm(np.asarray(pos) - kp, axis=-1)
        medians.append(float(np.median(d)))
    assert max(medians) < 0.2, medians     # band 0.03-0.12; gate above it


def test_tpu_quality_band_within_thresholds():
    """The committed on-chip study must sit under the documented gates for
    every (preset, seed) it records. Cheap (reads a JSON) → not slow-marked:
    any commit that records a regressed sweep goes red immediately."""
    if not os.path.exists(_QUALITY_JSON):
        pytest.skip("benchmarks/quality.json not recorded yet")
    with open(_QUALITY_JSON) as f:
        q = json.load(f)
    assert q["runs"], "quality.json exists but records no runs"
    for key, run in q["runs"].items():
        thr = TPU_THRESHOLDS[run["preset"]]
        assert run["locking_median"] < thr, (
            f"{key}: locking_median {run['locking_median']} >= gate {thr}")
    # the summary must agree with the raw runs it claims to summarize
    for preset, s in q["summary"].items():
        vals = [r["locking_median"] for r in q["runs"].values()
                if r["preset"] == preset]
        assert s["seeds"] == len(vals)
        np.testing.assert_allclose(s["locking_median_mean"], np.mean(vals),
                                   atol=1e-3)
