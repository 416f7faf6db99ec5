"""Multi-seed keypoint-quality study: 3 seeds x every preset (VERDICT r3 #4).

Pinned short schedules (pong64 3k, transporter_atari 3k, celeba128 4k,
pose256 2k) trained with the REAL loop (``train()`` — fused chunked scan,
checkpointing off) for seeds 0/1/2, then the honest warped eval
(``synthetic_eval_batch`` + ``evaluate``) on a fixed 64-image set per preset.
Writes benchmarks/quality.json with per-seed locking/PCK and mean ± spread —
the measured band that the slow-marked regression thresholds in
tests/test_quality_regression.py sit above, and that BASELINE.md records.

Run ON THE TPU (hours of CPU otherwise):
  python benchmarks/quality_sweep.py [preset ...]    # default: all four

``--smoke`` (VERDICT r4 #5 — a LIVE on-chip quality gate): re-train ONE
pinned known-healthy seed per preset at the pinned schedule from CURRENT
code and ASSERT locking against smoke-calibrated bounds (exit nonzero on
violation). Writes quality_smoke.json; never touches quality.json (the
3-seed band artifact). This is the documented pre-snapshot command — a
code change that silently hurts on-chip locking now fails this run, not a
future manual sweep:
  python benchmarks/quality_sweep.py --smoke [preset ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HERE = os.path.dirname(os.path.abspath(__file__))

SCHEDULES = {          # preset → pinned step count (VERDICT r3 #4)
    # pong64 needs 10k: at 3k the recon loss has converged (0.0038) but the
    # keypoints have not left the center yet (locking 0.89 — measured this
    # round); r3's 3k-step 0.10 band was the dots VARIANT, the scripted-Pong
    # preset locked 0.103 at 10k (BASELINE.md r3 sweep).
    "pong64": 10000,
    "transporter_atari": 3000,
    "celeba128": 4000,
    "pose256": 2000,
}
SEEDS = (0, 1, 2)

#: --smoke: one pinned KNOWN-HEALTHY seed per preset (quality.json r4:
#: pong64 s2 0.063, atari s0 0.058, celeba s0 0.079, pose s2 0.035) —
#: the smoke gate asserts code health, not the init lottery (the lottery
#: is the 3-seed band's job, and pong64 seed 0 is a DOCUMENTED failure).
SMOKE_SEED = {"pong64": 2, "transporter_atari": 0,
              "celeba128": 0, "pose256": 2}

#: locking_median bounds for the smoke gate: the r4/r5 recorded value for
#: that (preset, seed, schedule) with a 1.6x margin for run variance
#: (BASELINE.md records the bands; re-pin if a schedule changes).
SMOKE_BOUNDS = {"pong64": 0.10, "transporter_atari": 0.095,
                "celeba128": 0.13, "pose256": 0.06}


def run_one(preset: str, steps: int, seed: int, workdir: str) -> dict:
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.eval import evaluate, synthetic_eval_batch
    from keypoints_tpu.train import train

    cfg = get_config(preset).override(**{
        "train.steps": steps, "train.seed": seed,
        "train.checkpoint_dir": os.path.join(workdir, f"{preset}_s{seed}"),
        # quality study, not an ops test: skip best/latest checkpoint IO
        "train.save_best": False,
        "train.checkpoint_every": steps + 1,
        "train.eval_every": steps + 1,
        "train.log_every": max(steps // 10, 1),
    })
    t0 = time.perf_counter()
    state = train(cfg, logdir=None)
    dt = time.perf_counter() - t0
    # fixed eval set per preset (key independent of the train seed), the
    # same warped-pair distribution training sees
    src, tgt, pos = synthetic_eval_batch(cfg, 64, jax.random.PRNGKey(99))
    m = evaluate(cfg, state.params, src, tgt, pos)
    m.update(preset=preset, seed=seed, steps=steps,
             train_s=round(dt, 1), fps=round(steps * cfg.train.batch_size / dt, 1))
    return m


def smoke(presets=None) -> int:
    """One pinned healthy seed per preset from CURRENT code; assert the
    smoke bounds. → exit code (0 healthy). Writes quality_smoke.json."""
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    presets = presets or list(SCHEDULES)
    dst = os.path.join(_HERE, "quality_smoke.json")
    workdir = tempfile.mkdtemp(prefix="kp_smoke_")
    results, failures = {}, []
    try:
        for preset in presets:
            seed, steps = SMOKE_SEED[preset], SCHEDULES[preset]
            print(f"=== smoke {preset} seed {seed} ({steps} steps)",
                  flush=True)
            m = run_one(preset, steps, seed, workdir)
            bound = SMOKE_BOUNDS[preset]
            m["bound"] = bound
            m["ok"] = bool(m["locking_median"] <= bound)
            results[preset] = m
            print(preset, json.dumps(m), flush=True)
            if not m["ok"]:
                failures.append(
                    f"{preset}: locking_median {m['locking_median']:.3f} "
                    f"> bound {bound}")
            with open(dst, "w") as f:
                json.dump({"runs": results,
                           "device": jax.devices()[0].platform}, f, indent=1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    if failures:
        print("SMOKE GATE FAILED:\n  " + "\n  ".join(failures), flush=True)
        return 1
    print("smoke gate ok:", {p: round(r["locking_median"], 3)
                             for p, r in results.items()}, flush=True)
    return 0


def main(presets=None):
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    presets = presets or list(SCHEDULES)
    dst = os.path.join(_HERE, "quality.json")
    results = {}
    if os.path.exists(dst):                      # resume a partial sweep
        with open(dst) as f:
            results = json.load(f).get("runs", {})
    workdir = tempfile.mkdtemp(prefix="kp_quality_")
    try:
        for preset in presets:
            steps = SCHEDULES[preset]
            for seed in SEEDS:
                key = f"{preset}_s{seed}"
                # cached rows are only valid at the CURRENT schedule — a
                # schedule change (e.g. pong64 3k→10k this round) must
                # re-run, not re-certify stale short-schedule numbers
                if results.get(key, {}).get("steps") == steps:
                    print(f"{key}: cached", flush=True)
                    continue
                print(f"=== {preset} seed {seed} ({steps} steps)", flush=True)
                m = run_one(preset, steps, seed, workdir)
                results[key] = m
                print(key, json.dumps(m), flush=True)
                _write(dst, results)             # survive a mid-sweep crash
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    _write(dst, results)
    print("wrote", dst)


def _write(dst, results):
    summary = {}
    for preset in SCHEDULES:
        vals = [r["locking_median"] for k, r in results.items()
                if r["preset"] == preset]
        if vals:
            summary[preset] = {
                "locking_median_mean": round(float(np.mean(vals)), 4),
                "locking_median_min": round(float(np.min(vals)), 4),
                "locking_median_max": round(float(np.max(vals)), 4),
                "seeds": len(vals),
                "steps": SCHEDULES[preset],
            }
    with open(dst, "w") as f:
        json.dump({"runs": results, "summary": summary,
                   "device": jax.devices()[0].platform}, f, indent=1)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--smoke" in argv:
        argv.remove("--smoke")
        raise SystemExit(smoke(argv or None))
    main(argv or None)
