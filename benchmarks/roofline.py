"""Executable roofline accounting: XLA cost analysis vs device peaks.

Formalizes the DESIGN.md "Roofline accounting" method as a tool: compile a
program, ask XLA for per-step FLOPs and logical bytes, and derive aggregate
MXU / HBM floors. The aggregate floors are LOWER bounds, looser than
DESIGN.md's per-component additive floor (logical bytes overcount real HBM
traffic for fused/VMEM-resident touches, and the MXU floor assumes perfect
overlap) — use them as the denominator for paths that lack a hand-built
additive floor, and the additive table for the binding [B:5] bar.

Two modes:

* ``python benchmarks/roofline.py <preset> [--batch N] [--measured-ms X]``
  — the round-3 CLI: one preset's train step, human-readable report.
* ``python benchmarks/roofline.py --record [--measure]`` — VERDICT r3 #2:
  derive floors for ALL THREE headline paths (celeba128 b128 train,
  pose256 b128 perceptual train, celeba128 b1024 extract) and write
  benchmarks/roofline.json; bench.py folds the measured/floor ratios into
  its extra. ``--measure`` also wall-times each path on the device.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HERE = os.path.dirname(os.path.abspath(__file__))

# (bf16 MXU FLOP/s, HBM bytes/s) by device-kind prefix — public peak specs.
PEAKS = (
    ("TPU v5 lite", (197e12, 819e9)),
    ("TPU v5e", (197e12, 819e9)),
    ("TPU v5p", (459e12, 2765e9)),
    ("TPU v5", (197e12, 819e9)),
    ("TPU v6 lite", (918e12, 1640e9)),
    ("TPU v4", (275e12, 1228e9)),
    ("TPU v3", (123e12, 900e9)),
)


def device_peaks():
    kind = getattr(jax.devices()[0], "device_kind", "") or ""
    for prefix, peaks in PEAKS:
        if kind.startswith(prefix):
            return peaks
    return None


def _floors(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):            # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    ma = compiled.memory_analysis()
    peak = getattr(ma, "peak_memory_in_bytes", 0)
    out = {"flops": flops, "bytes": nbytes, "hbm_peak": int(peak)}
    peaks = device_peaks()
    if peaks:
        mxu, hbm = peaks
        out["mxu_floor_ms"] = round(flops / mxu * 1e3, 3)
        # XLA's "bytes accessed" counts per-op LOGICAL touches — fused /
        # VMEM-resident reads are overcounted, so this is NOT a valid
        # lower bound on time (the celeba128 step measures FASTER than
        # its logical-bytes "floor"). Informational only; the defensible
        # aggregate floor is the MXU one.
        out["hbm_logical_ms"] = round(nbytes / hbm * 1e3, 3)
        out["floor_ms"] = out["mxu_floor_ms"]
    return out


def _train_path(preset: str, batch: int | None, chunk: int = 1):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_loss
    from keypoints_tpu.training import build_model, init_state, make_train_step

    cfg = get_config(preset)
    if batch:
        cfg = cfg.override(**{"train.batch_size": batch})
    b = cfg.train.batch_size
    state = init_state(cfg, jax.random.PRNGKey(0))
    base = make_train_step(cfg, build_model(cfg), loss=make_loss(cfg))
    if chunk > 1:
        # the shipped loop's dispatch pattern (train() scans a chunk of
        # steps per host round-trip) — also what the measured ms must use:
        # any host-side per-step work between dispatches breaks async
        # pipelining through the axon tunnel (+~21 ms/step, CLAUDE.md)
        def run(state, images, rng):
            def body(st, _):
                return base(st, images, rng)
            st, ms = jax.lax.scan(body, state, None, length=chunk)
            return st, jax.tree_util.tree_map(lambda x: x[-1], ms)
        step = jax.jit(run, donate_argnums=(0,))
    else:
        step = jax.jit(base, donate_argnums=(0,))
    s, c = cfg.data.image_size, cfg.data.channels
    img = jnp.asarray(np.random.RandomState(0).rand(b, c, s, s), jnp.float32)
    batch_in = img if cfg.data.pair_mode == "warp" else (img, img)
    return step, (state, batch_in, jax.random.PRNGKey(1)), b


def _extract_path(preset: str, batch: int):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import build_model, init_state, make_extract_fn

    cfg = get_config(preset)
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_extract_fn(cfg, model))
    s, c = cfg.data.image_size, cfg.data.channels
    img = jnp.asarray(np.random.RandomState(0).rand(batch, c, s, s),
                      jnp.float32)
    return fn, (state.params, img), batch


def analyze(preset: str, batch: int | None = None) -> dict:
    """Compile the preset's train step; → {flops, bytes, floors}."""
    step, args, b = _train_path(preset, batch)
    compiled = step.lower(*args).compile()
    out = {"preset": preset, "batch": b}
    out.update(_floors(compiled))
    return out


def extract_byte_floor_ms(preset: str, batch: int):
    """Additive HBM byte floor of the extract path — the BINDING resource
    (VERDICT r4 #3; DESIGN.md "Extract-path accounting": the profiled op
    table is conv+GN fusions that write/read the activation chain at
    73-82% of peak BW; the MXU floor is 2.5 ms and not binding). Counts:
    the f32 NCHW input read, its bf16 NHWC boundary write+read, every
    encoder activation write + next-op read, and the KeyNet head output
    write + softmax read. Keypoint output bytes are negligible."""
    peaks = device_peaks()
    if not peaks:
        return None
    from keypoints_tpu.configs import get_config
    cfg = get_config(preset)
    s, c = cfg.data.image_size, cfg.data.channels
    nb = batch * c * s * s * 4             # f32 NCHW input read
    nb += 2 * batch * c * s * s * 2        # bf16 NHWC boundary write+read
    h = s
    for f, st in zip(cfg.model.encoder_filters, cfg.model.encoder_strides):
        h //= st
        nb += 2 * 2 * batch * h * h * f    # block output write + read
    nb += 2 * 2 * batch * h * h * cfg.model.num_keypoints   # head out
    return round(nb / peaks[1] * 1e3, 3)


def _wall_ms(fn, args, donate_state: bool, iters=20) -> float:
    """Loop timing with a real D2H sync at each end (block_until_ready is
    a no-op through the axon tunnel)."""
    out = fn(*args)
    if donate_state:
        probe = lambda o: np.asarray(o[1]["loss"])
        args = (out[0],) + args[1:]
    else:
        probe = lambda o: np.asarray(
            jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1])
    probe(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if donate_state:
            args = (out[0],) + args[1:]
    probe(out)
    return (time.perf_counter() - t0) / iters * 1e3


def record(measure: bool = False, only: str | None = None):
    """Write benchmarks/roofline.json covering the three headline paths.
    ``only`` refreshes a single path, keeping the rest of the artifact."""
    paths = {}
    dst = os.path.join(_HERE, "roofline.json")
    if only and os.path.exists(dst):
        with open(dst) as f:
            paths = json.load(f)["paths"]
    specs = {
        "celeba128_train_b128": ("train", "celeba128", 128),
        "pose256_train_b128": ("train", "pose256", 128),
        "celeba128_extract_b1024": ("extract", "celeba128", 1024),
    }
    if only:
        specs = {only: specs[only]}
    for name, (kind, preset, batch) in specs.items():
        fn, args, b = (_train_path(preset, batch) if kind == "train"
                       else _extract_path(preset, batch))
        row = _floors(fn.lower(*args).compile())
        row.update(kind=kind, preset=preset, batch=b)
        if kind == "extract":
            # the extract path is HBM-bound, not MXU-bound — its floor is
            # the additive activation-chain byte floor (VERDICT r4 #3: the
            # shipped extract_vs_floor used the 2.5 ms MXU denominator
            # DESIGN.md itself disowned)
            bf = extract_byte_floor_ms(preset, b)
            if bf:
                row["byte_floor_ms"] = bf
                row["floor_ms"] = max(row.get("floor_ms", 0.0), bf)
        if measure:
            if kind == "train":      # re-build with the chunked dispatch
                chunk = 10
                cfn, cargs, _ = _train_path(preset, batch, chunk=chunk)
                ms = _wall_ms(cfn, cargs, donate_state=True,
                              iters=30 // chunk + 1) / chunk
            else:
                ms = _wall_ms(fn, args, donate_state=False)
            row["measured_ms"] = round(ms, 2)
            if row.get("floor_ms"):
                row["vs_floor"] = round(ms / row["floor_ms"], 3)
        paths[name] = row
        print(name, json.dumps(row), flush=True)
    dst = os.path.join(_HERE, "roofline.json")
    with open(dst, "w") as f:
        json.dump({"device": getattr(jax.devices()[0], "device_kind", "?"),
                   "peaks": device_peaks(), "paths": paths}, f, indent=1)
    print("wrote", dst)


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("preset", nargs="?", default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--measured-ms", type=float, default=None,
                   help="a measured step time to compare against the floors")
    p.add_argument("--record", action="store_true",
                   help="derive + write roofline.json for the headline paths")
    p.add_argument("--measure", action="store_true",
                   help="with --record: also wall-time each path")
    p.add_argument("--only", default=None,
                   help="with --record: refresh just this path name, "
                        "keeping the others in roofline.json")
    args = p.parse_args()

    if args.record:
        from keypoints_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        record(measure=args.measure, only=args.only)
        return
    if args.preset is None:
        # a bare invocation must not silently overwrite the committed
        # roofline.json (dropping its measured_ms/vs_floor fields)
        p.error("give a preset to analyze, or --record [--measure] to "
                "rewrite roofline.json")

    r = analyze(args.preset, args.batch)
    print(f"{r['preset']} b{r['batch']} on {jax.devices()[0].device_kind}:")
    print(f"  per-step FLOPs          {r['flops'] / 1e9:10.1f} GF")
    print(f"  per-step logical bytes  {r['bytes'] / 1e9:10.2f} GB "
          f"(overcounts fused touches)")
    if r["hbm_peak"]:
        print(f"  HBM peak (buffer asgn)  {r['hbm_peak'] / 2**30:10.2f} GiB")
    if "mxu_floor_ms" in r:
        floor = r["floor_ms"]
        print(f"  MXU floor (binding)     {r['mxu_floor_ms']:10.2f} ms  "
              f"({r['batch'] / floor * 1e3:.0f} fps ceiling)")
        print(f"  HBM logical (info only) {r['hbm_logical_ms']:10.2f} ms  "
              f"(overcounts fused touches — not a bound)")
        if args.measured_ms:
            print(f"  measured                {args.measured_ms:10.2f} ms  "
                  f"= {args.measured_ms / floor:.2f}x the MXU floor")
    else:
        print("  (no peak table for this device kind — floors skipped)")


if __name__ == "__main__":
    main()
