"""Executable roofline accounting: XLA cost analysis vs device peaks.

Formalizes the DESIGN.md "Roofline accounting" method as a tool: compile a
preset's full train step (loss included), ask XLA for per-step FLOPs and
logical bytes, and print the aggregate MXU / HBM floors next to an
optionally supplied measured ms/step. The aggregate floors are LOWER
bounds, looser than DESIGN.md's per-component additive floor (logical
bytes overcount real HBM traffic for fused/VMEM-resident touches, and the
MXU floor assumes perfect overlap) — use this to sanity-check a new config
or batch quickly; use the additive table for the binding [B:5] bar.

    python benchmarks/roofline.py celeba128 --measured-ms 22.48
    python benchmarks/roofline.py pose256 --batch 128
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

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


def analyze(preset: str, batch: int | None = None) -> dict:
    """Compile the preset's train step; → {flops, bytes, peaks, floors}."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_loss
    from keypoints_tpu.training import build_model, init_state, make_train_step

    cfg = get_config(preset)
    if batch:
        cfg = cfg.override(**{"train.batch_size": batch})
    b = cfg.train.batch_size
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, build_model(cfg),
                                   loss=make_loss(cfg)),
                   donate_argnums=(0,))
    s, c = cfg.data.image_size, cfg.data.channels
    img = jax.ShapeDtypeStruct((b, c, s, s), jnp.float32)
    batch_in = img if cfg.data.pair_mode == "warp" else (img, img)
    compiled = step.lower(state, batch_in, jax.random.PRNGKey(1)).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):            # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    ma = compiled.memory_analysis()
    peak = getattr(ma, "peak_memory_in_bytes", 0)

    out = {"preset": preset, "batch": b, "flops": flops, "bytes": nbytes,
           "hbm_peak": int(peak)}
    peaks = device_peaks()
    if peaks:
        mxu, hbm = peaks
        out["mxu_floor_ms"] = flops / mxu * 1e3
        out["hbm_floor_ms"] = nbytes / hbm * 1e3
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("preset")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--measured-ms", type=float, default=None,
                   help="a measured step time to compare against the floors")
    args = p.parse_args()

    r = analyze(args.preset, args.batch)
    print(f"{r['preset']} b{r['batch']} on {jax.devices()[0].device_kind}:")
    print(f"  per-step FLOPs          {r['flops'] / 1e9:10.1f} GF")
    print(f"  per-step logical bytes  {r['bytes'] / 1e9:10.2f} GB "
          f"(overcounts fused touches)")
    if r["hbm_peak"]:
        print(f"  HBM peak (buffer asgn)  {r['hbm_peak'] / 2**30:10.2f} GiB")
    if "mxu_floor_ms" in r:
        floor = max(r["mxu_floor_ms"], r["hbm_floor_ms"])
        print(f"  MXU-only floor          {r['mxu_floor_ms']:10.2f} ms")
        print(f"  HBM-only floor          {r['hbm_floor_ms']:10.2f} ms")
        print(f"  aggregate floor         {floor:10.2f} ms  "
              f"({r['batch'] / floor * 1e3:.0f} fps ceiling)")
        if args.measured_ms:
            print(f"  measured                {args.measured_ms:10.2f} ms  "
                  f"= {args.measured_ms / floor:.2f}x the aggregate floor")
    else:
        print("  (no peak table for this device kind — floors skipped)")


if __name__ == "__main__":
    main()
