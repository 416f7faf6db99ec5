"""Verify the pong64 discovery-failure threshold at the CHECK STEP.

configs.pong64 pins ``train.min_spread=0.65`` / ``spread_check_step=2000``
from the r4 quality study's END-of-run separation (failing seed 0 spread
0.46 vs healthy 0.88/0.95 at 10k steps, quality.json). The detector fires
at 2k steps — this script verifies the separation already exists THERE by
re-training the known-failing and a known-healthy seed for 2.5k steps with
a metrics logdir and reading the logged ``keypoint_spread`` series
(exactly what train() computes at eval cadence).

Writes benchmarks/spread_check.json; BASELINE.md records the result.

Run on the TPU: python benchmarks/spread_check.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HERE = os.path.dirname(os.path.abspath(__file__))


def run_seed(seed: int, steps: int, workdir: str) -> dict:
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import train

    logdir = os.path.join(workdir, f"log_s{seed}")
    cfg = get_config("pong64").override(**{
        "train.steps": steps, "train.seed": seed,
        "train.checkpoint_dir": os.path.join(workdir, f"ck_s{seed}"),
        "train.save_best": False,
        "train.checkpoint_every": steps + 1,
        "train.eval_every": 500,
        "train.log_every": 500,
    })
    train(cfg, logdir=logdir)
    series = {}
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "keypoint_spread" in rec:
                series[rec["step"]] = round(rec["keypoint_spread"], 4)
    return series


def main():
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    from keypoints_tpu.configs import get_config
    enable_compile_cache()
    cfg = get_config("pong64")
    thr, check = cfg.train.min_spread, cfg.train.spread_check_step
    steps = 2500
    workdir = tempfile.mkdtemp(prefix="kp_spread_")
    out = {"threshold": thr, "check_step": check, "steps": steps}
    try:
        for name, seed in (("failing", 0), ("healthy", 2)):
            series = run_seed(seed, steps, workdir)
            out[name] = {"seed": seed, "spread_by_step": series}
            print(name, seed, series, flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    fail_at = [v for s, v in out["failing"]["spread_by_step"].items()
               if s >= check]
    heal_at = [v for s, v in out["healthy"]["spread_by_step"].items()
               if s >= check]
    out["separated"] = bool(fail_at and heal_at
                            and max(fail_at) < thr < min(heal_at))
    with open(os.path.join(_HERE, "spread_check.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("separated at check step:", out["separated"])
    print("wrote spread_check.json")


if __name__ == "__main__":
    main()
