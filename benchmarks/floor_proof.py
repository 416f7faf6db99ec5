"""Per-component floor PROOF for the celeba128/b128 step (VERDICT r3 #1).

The [B:5] bar is "within 10% of TPU roofline at 128x128". A roofline is only
meaningful if the denominator is defensible: the old 18.0 ms floor mixed
at-peak conv numbers (2.1 ms) with measured GN/optimizer values, so the
step/floor ratio conflated "scheduler slack" with "shape-bound MXU underfill
that NO schedule can recover". This campaign separates them by MEASURING the
shape floor of every component on-chip:

* Each conv layer of the model (fwd + both bwd convs, the real NHWC/bf16
  shapes incl. the lhs-dilated UpsampleConv) is timed by fori-loop
  DIFFERENCE timing (two loop lengths inside single dispatches — the only
  reliable sub-ms method through the axon tunnel; a dispatch-loop
  microbench books ~1.1 ms/iter of tunnel overhead into every row). The
  loop carries a scalar data dependency through the kernel operand
  (k + s*1e-38) so nothing hoists; outputs are consumed by sums whose HBM
  cost is subtracted analytically (over-subtraction is the safe direction:
  it can only make the claimed floor LOWER than truly achievable).
* The same conv re-timed with output channels PADDED to the 128-lane MXU
  width: padded time == unpadded time proves the MXU burns identical cycles
  either way — the measured time IS that shape's floor (no tiling/layout
  trick recovers channel underfill; only a wider architecture would).
* GroupNorm fwd+bwd at the model's activation shapes: floor = bytes/BW
  (HBM-bound by construction); measured/floor = achieved bandwidth.
* Adam on the real param tree: floor = 7 f32 passes over params.
* The Pallas warp pair: measured optimum across the r2-r4 design space
  (tent-weight y-select, row-pair packing, shared tight windows; negatives
  recorded in kernels/experimental.py + ROADMAP lead #2).
* Non-warp augmentation: 0.65 ms measured in-graph (profile_aug.py
  device-op table minus the two warp custom-calls).

The re-derived defensible floor = sum of PROVEN component floors. Writes
benchmarks/floor_proof.json; DESIGN.md carries the table, bench.py pins the
resulting FLOOR_MS_B128.

Run on the TPU: python benchmarks/floor_proof.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9

_HERE = os.path.dirname(os.path.abspath(__file__))
_DN = ("NHWC", "HWIO", "NHWC")


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def scan_diff_ms(body, carry0, n1=100, reps=3):
    """Per-iteration device ms of ``body`` (carry → carry): fori-loop at
    lengths n1 and 2*n1 inside single dispatches, min-of-reps difference."""
    f1 = jax.jit(lambda c: jax.lax.fori_loop(0, n1, lambda i, cc: body(cc), c))
    f2 = jax.jit(lambda c: jax.lax.fori_loop(0, 2 * n1,
                                             lambda i, cc: body(cc), c))

    def t(f):
        _sync(f(carry0))                      # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(f(carry0))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f2) - t(f1)) / n1 * 1e3


def conv_inventory():
    """Every conv in the celeba128 step: (name, count, Hin, Cin, Cout,
    stride, kind, need_dx). count=2 for the encoder trunk (Φ on src + Ψ
    trunk on tgt). kind 'conv' = 3x3 explicit-pad; 'up' = lhs-dilated 4x4
    (UpsampleConv); 'head1x1' = the KeyNet 1x1. need_dx=False for the
    FIRST layer only: its input is the (stop-gradient) augmented image, so
    the step never computes dL/dx there — the r4 campaign timed fwd+dX+dW
    for enc0 and over-booked an op the step doesn't run (r5 fix)."""
    inv = []
    h = 128
    cin = 3
    for i, (f, s) in enumerate(zip((32, 32, 64, 64, 128), (1, 2, 1, 2, 1))):
        inv.append((f"enc{i}_{cin}>{f}s{s}@{h}", 2, h, cin, f, s, "conv",
                    i > 0))
        h //= s
        cin = f
    inv.append(("keynet_head_128>10@32", 1, 32, 128, 10, 1, "head1x1", True))
    # decoder input: 128 features + 10 gaussian maps
    cin, h = 138, 32
    for i, (f, up) in enumerate(zip((128, 64, 32), (True, True, False))):
        kind = "up" if up else "conv"
        inv.append((f"dec{i}_{cin}>{f}{'up' if up else ''}@{h}", 1, h, cin,
                    f, 1, kind, True))
        if up:
            h *= 2
        cin = f
    inv.append((f"dec_head_{cin}>3@{h}", 1, h, cin, 3, 1, "conv", True))
    return inv


def _conv_fn(kind, stride):
    if kind == "up":
        # The STEP's schedule: models.nets._upconv2x (custom VJP — both
        # grads through ordinary stride-2 convs, no activation reverses).
        # The r4 campaign timed jax.vjp of the plain lhs-dilated conv
        # instead, i.e. XLA's autodiff — a schedule the step never runs
        # (bench_upconv_vjp measured it ~2.3 ms slower across both
        # up-blocks). That plain form is now an ALTERNATIVE row in
        # bench_conv_alts.py.
        from keypoints_tpu.models.nets import _upconv2x
        f = _upconv2x
    elif kind == "head1x1":
        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN)
    else:
        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=_DN)
    return f


def bench_conv(name, count, h, cin, cout, stride, kind, need_dx=True,
               batch=128, pad_to=128):
    """Difference-time fwd+bwd of one conv shape (bf16 NHWC like the step),
    then the same with Cout padded to the MXU lane width."""
    ks = 1 if kind == "head1x1" else (4 if kind == "up" else 3)
    hout = h * 2 if kind == "up" else h // stride
    rng = np.random.RandomState(0)
    f = _conv_fn(kind, stride)

    def run(co):
        x = jnp.asarray(rng.rand(batch, h, h, cin), jnp.float32
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.rand(ks, ks, cin, co) * 0.1, jnp.float32
                        ).astype(jnp.bfloat16)
        dy0 = jnp.asarray(rng.rand(batch, hout, hout, co), jnp.float32
                          ).astype(jnp.bfloat16)

        # Measurement-integrity rules, each one learned the hard way:
        # * x/k/dy ride the carry — closing over them serializes 100s of
        #   MB of constants into the HLO (the axon compile helper 413s).
        # * outputs are consumed through SQUARED reduces with an f32
        #   accumulator — a plain y.sum() lets XLA's algebraic simplifier
        #   collapse reduce∘conv / reduce∘GN analytically (first attempt
        #   measured GN *below* its HBM floor and convs at 250% of MXU
        #   peak — impossible, i.e. the op under test was rewritten away).
        # * the cotangent is a CARRIED random tensor scaled by the
        #   loop-dependent epsilon — dy=ones is constant-foldable and
        #   conv(broadcast(s), k) simplifies to s·sum(k).
        def body(c):
            s, x, k, dy0 = c
            e = (s * 1e-38).astype(k.dtype)
            kk = k + e          # loop-carried dep, kernel-sized add
            if need_dx:
                y, vjp = jax.vjp(f, x, kk)
                dx, dk = vjp(dy0 * (1 + e))
                q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                     + jnp.sum(jnp.square(dx), dtype=jnp.float32)
                     + jnp.sum(jnp.square(dk), dtype=jnp.float32))
            else:
                # First layer: x is the stop-gradient augmented image —
                # the step computes fwd + dW only (r5 fix: the r4 row
                # timed a dX the step never runs).
                y, vjp = jax.vjp(lambda kv: f(x, kv), kk)
                (dk,) = vjp(dy0 * (1 + e))
                q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                     + jnp.sum(jnp.square(dk), dtype=jnp.float32))
            return q * 1e-30, x, k, dy0   # keep s finite across 200 iters

        return scan_diff_ms(body, (jnp.float32(0.0), x, k, dy0))

    ms = run(cout)
    # fwd + dW (+ dX when the step needs it) ≈ 2x/3x fwd MACs (exact for
    # stride-1; dX of stride-2 works on the smaller grid — still an upper
    # bound on the naive floor). The lhs-dilated upconv skips the inserted
    # zeros: 3/4 of its 4x4 taps are dead, so its true MAC count is a
    # quarter of the dense-tap product (measured: dec0 runs at ~113% of
    # THIS corrected floor, i.e. at peak).
    npass = 3 if need_dx else 2
    flops = npass * 2 * batch * hout * hout * ks * ks * cin * cout
    if kind == "up":
        flops //= 4
    naive = flops / MXU_BF16_FLOPS * 1e3
    # Reads-only HBM byte floor: every schedule must fetch its inputs from
    # HBM at least once (x for fwd/dW, dy for the backward) — writes are
    # EXCLUDED because in-step they can fuse into consumers (and do in the
    # harness: the keynet-head row measures 0.065 ms, under a
    # read+write floor of 0.088 — the reduce-consumed y/dx never hit HBM).
    # Like the GN rows, this assumes the additive model's materialization
    # boundary for INPUTS only: x arrives from the previous component via
    # HBM. Conservative direction: a reads-only floor can only be LOWER
    # than the true cost.
    read_bytes = 2 * batch * (h * h * cin + hout * hout * cout)
    read_floor = read_bytes / HBM_BYTES_PER_S * 1e3
    row = {"count": count, "ms": round(ms, 3),
           "ms_total": round(count * ms, 3),
           "naive_floor_ms": round(naive, 3),
           "read_floor_ms": round(read_floor, 3),
           "mxu_pct": round(100 * naive / ms, 1) if ms > 0 else None}
    if cout < pad_to:
        padded = run(pad_to)
        row["padded128_ms"] = round(padded, 3)
        # proof = padded time EQUALS unpadded time (two-sided): the MXU
        # burns the same cycles either way, so the measured time is that
        # shape's floor. padded >> ms disproves nothing about ms but
        # proves nothing either; padded << ms DISPROVES it (a strictly
        # faster schedule exists: compute padded, slice) — both fall back
        # to the naive at-peak floor in the derivation.
        row["quantization_proven"] = bool(ms * 0.85 <= padded <= ms * 1.15)
    return name, row


def bench_groupnorm(batch=128):
    """GN fwd+bwd at every activation shape in the step (encoder x2
    streams + decoder). Floor: 4 HBM activation passes (read x + write y;
    read x + write dx — dy is ones here; in the real step dy adds a 5th)."""
    shapes = [  # (H, C, count)
        (128, 32, 2), (64, 32, 2), (64, 64, 2), (32, 64, 2), (32, 128, 2),
        (64, 128, 1), (128, 64, 1), (128, 32, 1),
    ]
    import flax.linen as nn
    total_ms, total_floor = 0.0, 0.0
    rows = {}
    for h, c, count in shapes:
        gn = nn.GroupNorm(num_groups=min(8, c), epsilon=1e-5,
                          dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).rand(batch, h, h, c),
                        jnp.float32).astype(jnp.bfloat16)
        p = gn.init(jax.random.PRNGKey(0), x)

        dy0 = jnp.asarray(np.random.RandomState(1).rand(batch, h, h, c),
                          jnp.float32).astype(jnp.bfloat16)

        def body(c):
            s, p, x, dy0 = c
            e = s.astype(jnp.bfloat16) * 1e-38
            xx = x + e                      # fused into GN's first read
            y, vjp = jax.vjp(lambda xv: gn.apply(p, xv), xx)
            (dx,) = vjp(dy0 * (1 + e))      # varying cotangent (see convs)
            q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                 + jnp.sum(jnp.square(dx), dtype=jnp.float32))
            return q * 1e-30, p, x, dy0

        ms = scan_diff_ms(body, (jnp.float32(0.0), p, x, dy0))
        nbytes = batch * h * h * c * 2
        # read x, write y, read dy, write dx (+ a bwd x re-read if stats
        # aren't saved): >= 4 passes
        floor = 4 * nbytes / HBM_BYTES_PER_S * 1e3
        name = f"gn_{h}x{c}x{count}"     # count in the key: the step has
        rows[name] = {"count": count,    # both a x2 and a x1 instance of
                      "ms": round(ms, 3),            # the 128x32 shape
                      "floor_ms": round(floor, 3)}
        total_ms += count * ms
        total_floor += count * floor
        print(name, rows[name], flush=True)
    return rows, total_ms, total_floor


def bench_adam():
    """The real optimizer update on the real celeba128 param tree,
    chained state→state through the loop (its natural dataflow)."""
    import optax
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import init_state, make_optimizer

    cfg = get_config("celeba128").override(**{"train.batch_size": 128})
    state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(state.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    def body(c):
        params, opt, grads = c
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, grads

    ms = scan_diff_ms(body, (state.params, opt_state, grads), n1=400)
    nparams = sum(int(np.prod(p.shape))
                  for p in jax.tree_util.tree_leaves(state.params))
    floor = 7 * nparams * 4 / HBM_BYTES_PER_S * 1e3
    return {"ms": round(ms, 3), "floor_ms": round(floor, 3),
            "params": nparams}


def conv_rule(row):
    """Classify one conv row by what its measurements PROVE (r5 rules):

    * ``padding_tie``   — the Cout-padding control tied (two-sided ±15%):
      the MXU burns the same cycles padded or not → measured IS the floor.
    * ``schedule_optimum`` — >= 2 genuinely different formulations
      (bench_conv_alts.py: im2col / NCHW / f32-accum / space-to-depth /
      subpixel / Pallas direct / XLA-autodiff-up) were measured and NONE
      beat the step's schedule by > 5% → measured counts as the floor of
      best-KNOWN schedules (the VERDICT r4 "a loss is a proof too" rule).
    * ``beaten``        — an alternative measured FASTER: the floor is
      that alternative (and the row is an integration work item).
    * ``unproven``      — nothing proved the measured time unavoidable:
      count max(naive at-peak MXU, reads-only byte floor), clamped to the
      measured time (a floor must not exceed an achieved schedule).
    """
    alts = row.get("alternatives") or {}
    best_alt = min(alts.values()) if alts else None
    if row.get("quantization_proven"):
        return "padding_tie", row["ms"]
    if best_alt is not None and best_alt < row["ms"] * 0.95:
        return "beaten", best_alt
    if len(alts) >= 2:
        return "schedule_optimum", row["ms"]
    lower = max(row["naive_floor_ms"], row.get("read_floor_ms", 0.0))
    return "unproven", min(lower, row["ms"])


def conv_floor_ms(row):
    rule, fl = conv_rule(row)
    row["floor_rule"] = rule
    return row["count"] * fl


def conv_strict_floor_ms(row):
    """The HARDWARE-roofline reading of one row, independent of what
    schedules exist: measured when the padding control proved cycle
    quantization, else max(naive at-peak MXU, reads-only byte floor) —
    clamped to the best schedule anyone MEASURED (a floor must not exceed
    an achieved time). The gap between this and conv_floor_ms is exactly
    'shape-bound underfill that every measured alternative failed to
    recover' — quantified, not asserted."""
    best = min([row["ms"]] + list((row.get("alternatives") or {}).values()))
    if row.get("quantization_proven"):
        fl = row["ms"]
    else:
        fl = min(max(row["naive_floor_ms"], row.get("read_floor_ms", 0.0)),
                 best)
    return row["count"] * fl


def derive(out):
    """Recompute the derived totals from per-row measurements (pure; also
    reachable as `--rederive` to fix the derivation over an existing
    floor_proof.json without re-measuring).

    TWO floors, two questions (VERDICT r4 #1 resolution):
    * ``strict_floor_ms`` — the hardware roofline: padding-proven rows at
      their measured time, everything else at max(at-peak MXU, reads-only
      bytes). "How fast could ideal schedules possibly be?"
    * ``derived_floor_ms`` — the best-MEASURED-schedule floor: every row
      proven by a padding tie, by >= 2 lost alternative formulations, or
      replaced by a faster measured alternative. "How fast is the best
      schedule anyone has actually measured?" The [B:5] verdict rests on
      the ratio to THIS floor plus the per-row strict-gap decomposition.
    """
    out["conv_measured_ms"] = round(
        sum(r["ms_total"] for r in out["convs"].values()), 2)
    out["conv_proven_floor_ms"] = round(
        sum(conv_floor_ms(r) for r in out["convs"].values()), 2)
    out["conv_strict_floor_ms"] = round(
        sum(conv_strict_floor_ms(r) for r in out["convs"].values()), 2)
    out["conv_unproven_rows"] = sorted(
        n for n, r in out["convs"].items()
        if r.get("floor_rule") == "unproven")
    common = (out["gn_floor_ms"] + out["adam"]["floor_ms"]
              + out["warp_pair_measured_ms"]
              + out["aug_nonwarp_measured_ms"])
    out["derived_floor_ms"] = round(out["conv_proven_floor_ms"] + common, 2)
    out["strict_floor_ms"] = round(out["conv_strict_floor_ms"] + common, 2)
    return out


def _write(out):
    derive(out)
    print("derived additive floor:", out["derived_floor_ms"], "ms")
    with open(os.path.join(_HERE, "floor_proof.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote floor_proof.json")


def rederive():
    with open(os.path.join(_HERE, "floor_proof.json")) as f:
        out = json.load(f)
    for row in out["convs"].values():        # re-apply the two-sided proof
        if "padded128_ms" in row:            # criterion to old artifacts
            row["quantization_proven"] = bool(
                row["ms"] * 0.85 <= row["padded128_ms"] <= row["ms"] * 1.15)
        else:
            row.pop("quantization_proven", None)
    _write(out)


def main():
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    out = {"device": jax.devices()[0].platform, "batch": 128,
           "method": ("fori-loop difference timing; squared f32 consumes; "
                      "carried operands/cotangents (see module docstring)")}

    convs = {}
    for spec in conv_inventory():
        name, row = bench_conv(*spec)
        convs[name] = row
        print(name, json.dumps(row), flush=True)
    out["convs"] = convs

    gn_rows, gn_ms, gn_floor = bench_groupnorm()
    out["groupnorm"] = gn_rows
    out["gn_measured_ms"] = round(gn_ms, 2)
    out["gn_floor_ms"] = round(gn_floor, 2)

    out["adam"] = bench_adam()
    print("adam", json.dumps(out["adam"]), flush=True)

    # measured in-graph (profile_aug.py op table, this rev): two warp
    # custom-calls + the non-warp remainder of the aug device total
    out["warp_pair_measured_ms"] = 2.95
    out["aug_nonwarp_measured_ms"] = 0.65

    _write(out)


if __name__ == "__main__":
    if "--rederive" in sys.argv:
        rederive()
    else:
        main()
