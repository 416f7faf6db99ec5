"""Evaluation harness: fixed-set metrics + keypoint-locking measurement.

SURVEY.md §3.5 — the eval pass is also the parity set: a fixed batch, fp32
forward (``jax.default_matmul_precision('float32')`` so MXU bf16 doesn't leak
into the parity numbers), reporting reconstruction loss, keypoint spread, and
— when ground-truth positions exist (synthetic sets) — locking distance.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from keypoints_tpu.configs import Config
from keypoints_tpu.losses import l2_loss
from keypoints_tpu.training import build_model, make_extract_fn


def evaluate(cfg: Config, params, src, tgt,
             true_positions: Optional[np.ndarray] = None,
             loss: Optional[Callable] = None) -> dict[str, float]:
    model = build_model(cfg)
    recon_loss = loss or l2_loss

    @jax.jit
    def forward(params, src, tgt):
        with jax.default_matmul_precision("float32"):
            recon, kp = model.apply({"params": params}, src, tgt)
            return recon_loss(recon, tgt), kp

    value, kp = forward(params, src, tgt)
    kp = np.asarray(kp)
    out = {
        "eval_loss": float(np.asarray(value)),
        # spread: mean pairwise keypoint distance — collapse indicator
        "keypoint_spread": float(np.mean(np.linalg.norm(
            kp[:, :, None] - kp[:, None], axis=-1))),
        "keypoint_in_bounds": float(np.mean(np.abs(kp) <= 1.0)),
    }
    if true_positions is not None:
        d = np.linalg.norm(
            np.asarray(true_positions)[:, :, None] - kp[:, None], axis=-1)
        out["locking_median"] = float(np.median(d.min(axis=-1)))
        out["locking_mean"] = float(np.mean(d.min(axis=-1)))
    return out


def coordinate_parity(cfg: Config, params, golden_fn: Callable,
                      images: np.ndarray) -> float:
    """Max keypoint L2 vs a golden model on a fixed set — the <1e-3 bar [B:5]."""
    model = build_model(cfg)
    extract = jax.jit(make_extract_fn(cfg, model))
    with jax.default_matmul_precision("float32"):
        got = np.asarray(extract(params, jnp.asarray(images)))
    want = np.asarray(golden_fn(images))
    return float(np.linalg.norm(got - want, axis=-1).max())
