"""Per-component floor PROOF for the pose256/b128 step (VERDICT r4 #2).

celeba128 got the honest floor treatment in r4; pose256's
``pose_step_vs_floor 2.99`` was still reported against an aggregate
MXU-only denominator (roofline.json: 74.4 ms) with the "architecture-bound
VGG" explanation asserted from one profile. This campaign measures every
component of the pose256 step at its REAL b128 shapes on-chip, with the
same integrity rules as floor_proof.py (fori-difference timing, squared
f32 consumes, carried operands/cotangents), and derives an additive
per-component floor the ratio can be defended against.

What the step actually computes, and what each row times:

* pose model convs — fwd+dX+dW (first layer: fwd+dW only; its input is the
  stop-gradient augmented image). Up-blocks time the model's custom-VJP
  schedule (models.nets._upconv2x), like floor_proof r5.
* VGG trunk convs — the perceptual loss runs VGG TWICE: on the recon
  (fwd + dX only — the weights are FROZEN, so the step never computes
  their dW) and on the target (fwd only, gradient-free). Two rows per
  conv, each timing exactly those passes.
* max_pool_2x2 — whatever models/vgg.py ships (r5: plain reduce-window
  autodiff, the honest design-space optimum per
  benchmarks/bench_pool_alts.py — the r4 masked VJP measured 2.2x slower
  once the bench consumed every output byte) on the recon branch
  (fwd+bwd) and target branch (fwd).
* GroupNorm at every pose activation shape — byte floors (4 HBM passes).
* The perceptual layer-difference reduces — byte floors (read both
  feature maps once).
* Bottleneck (spatial softmax 16kp@32² + gaussian render) — measured
  (the Pallas kernels are the r2–r4 design-space optimum).
* The 256² field-warp pair — measured optimum from the r4 profile
  (2 × 1.90 ms; benchmarks/bench_warp_field.py design space).
* Adam on the real pose256 param tree.

Conv rows with Cout < 128 get the padding-tie control; rows are classified
by floor_proof.conv_rule (padding_tie / schedule_optimum / unproven →
max(naive MXU at-peak, reads-only byte floor)).

Writes benchmarks/floor_proof_pose.json. bench.py reports
``pose_step_vs_floor`` against the derived floor; DESIGN.md carries the
table.

Run on the TPU: python benchmarks/floor_proof_pose.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.floor_proof import (  # noqa: E402
    _DN, _HERE, HBM_BYTES_PER_S, MXU_BF16_FLOPS, conv_rule, scan_diff_ms)

BATCH = 128

#: gradient passes per mode: fwd always; dX unless the input needs no
#: gradient; dW unless the weights are frozen (VGG)
_NPASS = {"xw": 3, "w": 2, "x": 2, "none": 1}


def _conv_f(kind, stride):
    if kind == "up":
        from keypoints_tpu.models.nets import _upconv2x
        return _upconv2x
    pad = 0 if kind == "head1x1" else 1

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=_DN)
    return f


def time_conv(name, count, h, cin, cout, stride, kind, mode,
              batch=BATCH, pad_to=128):
    ks = 1 if kind == "head1x1" else (4 if kind == "up" else 3)
    hout = h * 2 if kind == "up" else h // stride
    rng = np.random.RandomState(0)
    f = _conv_f(kind, stride)
    n1 = 30 if h >= 256 else (60 if h >= 128 else 150)

    def run(co):
        x = jnp.asarray(rng.rand(batch, h, h, cin), jnp.float32
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.rand(ks, ks, cin, co) * 0.1, jnp.float32
                        ).astype(jnp.bfloat16)
        dy0 = jnp.asarray(rng.rand(batch, hout, hout, co), jnp.float32
                          ).astype(jnp.bfloat16)

        def body(c):
            s, x, k, dy0 = c
            e = (s * 1e-38).astype(k.dtype)
            kk = k + e
            q = jnp.float32(0.0)
            if mode == "xw":
                y, vjp = jax.vjp(f, x, kk)
                dx, dk = vjp(dy0 * (1 + e))
                q += (jnp.sum(jnp.square(dx), dtype=jnp.float32)
                      + jnp.sum(jnp.square(dk), dtype=jnp.float32))
            elif mode == "w":
                y, vjp = jax.vjp(lambda kv: f(x, kv), kk)
                (dk,) = vjp(dy0 * (1 + e))
                q += jnp.sum(jnp.square(dk), dtype=jnp.float32)
            elif mode == "x":
                y, vjp = jax.vjp(lambda xv: f(xv, kk), x)
                (dx,) = vjp(dy0 * (1 + e))
                q += jnp.sum(jnp.square(dx), dtype=jnp.float32)
            else:
                y = f(x, kk)
            q += jnp.sum(jnp.square(y), dtype=jnp.float32)
            return q * 1e-30, x, k, dy0

        return scan_diff_ms(body, (jnp.float32(0.0), x, k, dy0), n1=n1,
                            reps=2)

    ms = run(cout)
    flops = _NPASS[mode] * 2 * batch * hout * hout * ks * ks * cin * cout
    if kind == "up":
        flops //= 4                 # lhs-dilation skips the inserted zeros
    naive = flops / MXU_BF16_FLOPS * 1e3
    read_bytes = 2 * batch * h * h * cin
    if mode != "none":
        read_bytes += 2 * batch * hout * hout * cout       # dy
    read_floor = read_bytes / HBM_BYTES_PER_S * 1e3
    row = {"count": count, "mode": mode, "ms": round(ms, 3),
           "ms_total": round(count * ms, 3),
           "naive_floor_ms": round(naive, 3),
           "read_floor_ms": round(read_floor, 3),
           "mxu_pct": round(100 * naive / ms, 1) if ms > 0 else None}
    if cout < pad_to:
        padded = run(pad_to)
        row["padded128_ms"] = round(padded, 3)
        row["quantization_proven"] = bool(ms * 0.85 <= padded <= ms * 1.15)
    return name, row


def time_pool(name, count, h, c, mode, batch=BATCH):
    """max_pool_2x2 (the shipped pool) fwd(+bwd)."""
    from keypoints_tpu.models.vgg import max_pool_2x2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, h, c), jnp.float32
                    ).astype(jnp.bfloat16)
    dy0 = jnp.asarray(rng.rand(batch, h // 2, h // 2, c), jnp.float32
                      ).astype(jnp.bfloat16)

    def body(carry):
        s, x, dy0 = carry
        e = (s * 1e-38).astype(x.dtype)
        xx = x + e
        if mode == "x":
            y, vjp = jax.vjp(max_pool_2x2, xx)
            (dx,) = vjp(dy0 * (1 + e))
            q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                 + jnp.sum(jnp.square(dx), dtype=jnp.float32))
        else:
            q = jnp.sum(jnp.square(max_pool_2x2(xx)), dtype=jnp.float32)
        return q * 1e-30, x, dy0

    ms = scan_diff_ms(body, (jnp.float32(0.0), x, dy0),
                      n1=30 if h >= 256 else 100, reps=2)
    nb = 2 * batch * h * h * c                       # read x (bf16)
    if mode == "x":
        # reads-only convention (floor_proof.py): the dx write fuses into
        # the harness's reduce consumer, so the backward adds only the dy
        # read — (h/2)² * c elements = 1/4 of the base
        nb += 2 * batch * h * h * c // 4
    return name, {"count": count, "mode": mode, "ms": round(ms, 3),
                  "ms_total": round(count * ms, 3),
                  "read_floor_ms": round(nb / HBM_BYTES_PER_S * 1e3, 3)}


def time_groupnorm(shapes, batch=BATCH):
    """GN fwd+bwd at the pose activation shapes; floor = 4 HBM passes."""
    import flax.linen as nn
    rows, total_ms, total_floor = {}, 0.0, 0.0
    for h, c, count in shapes:
        gn = nn.GroupNorm(num_groups=min(8, c), epsilon=1e-5,
                          dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).rand(batch, h, h, c),
                        jnp.float32).astype(jnp.bfloat16)
        p = gn.init(jax.random.PRNGKey(0), x)
        dy0 = jnp.asarray(np.random.RandomState(1).rand(batch, h, h, c),
                          jnp.float32).astype(jnp.bfloat16)

        def body(carry):
            s, p, x, dy0 = carry
            e = s.astype(jnp.bfloat16) * 1e-38
            y, vjp = jax.vjp(lambda xv: gn.apply(p, xv), x + e)
            (dx,) = vjp(dy0 * (1 + e))
            q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                 + jnp.sum(jnp.square(dx), dtype=jnp.float32))
            return q * 1e-30, p, x, dy0

        ms = scan_diff_ms(body, (jnp.float32(0.0), p, x, dy0),
                          n1=30 if h >= 256 else 100, reps=2)
        floor = 4 * batch * h * h * c * 2 / HBM_BYTES_PER_S * 1e3
        name = f"gn_{h}x{c}x{count}"
        rows[name] = {"count": count, "ms": round(ms, 3),
                      "floor_ms": round(floor, 3)}
        total_ms += count * ms
        total_floor += count * floor
        print(name, rows[name], flush=True)
    return rows, total_ms, total_floor


def time_loss_reduces(batch=BATCH):
    """Σ_l mean((fr_l - ft_l)²) at the three perceptual tap shapes —
    pure-bandwidth; floor = read both feature maps once."""
    shapes = [(256, 64), (128, 128), (64, 256)]
    rng = np.random.RandomState(0)
    frs = [jnp.asarray(rng.rand(batch, h, h, c), jnp.float32
                       ).astype(jnp.bfloat16) for h, c in shapes]
    fts = [jnp.asarray(rng.rand(batch, h, h, c), jnp.float32
                       ).astype(jnp.bfloat16) for h, c in shapes]

    def body(carry):
        s, frs, fts = carry
        e = (s * 1e-38).astype(jnp.bfloat16)
        q = jnp.float32(0.0)
        for fr, ft in zip(frs, fts):
            q += jnp.mean(jnp.square((fr + e) - ft), dtype=jnp.float32)
        return q * 1e-30, frs, fts

    ms = scan_diff_ms(body, (jnp.float32(0.0), tuple(frs), tuple(fts)),
                      n1=30, reps=2)
    nb = sum(2 * 2 * batch * h * h * c for h, c in shapes)
    return {"ms": round(ms, 3),
            "floor_ms": round(nb / HBM_BYTES_PER_S * 1e3, 3)}


def time_bottleneck(batch=BATCH):
    """KeyNet-out → spatial softmax (16kp) → gaussian render @32², fwd+bwd
    — the step's Pallas bottleneck (r2–r4 design-space optimum)."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.ops import gaussian_maps, spatial_softmax2d
    cfg = get_config("pose256")
    k = cfg.model.num_keypoints
    rng = np.random.RandomState(0)
    maps = jnp.asarray(rng.rand(batch, k, 32, 32), jnp.float32)

    def fw(m):
        kp = spatial_softmax2d(m, cfg.model.temperature)
        return gaussian_maps(kp, 32, 32, cfg.model.sigma)

    dy0 = jnp.asarray(rng.rand(batch, k, 32, 32), jnp.float32)

    def body(carry):
        s, maps, dy0 = carry
        e = s * 1e-38
        y, vjp = jax.vjp(fw, maps + e)
        (dm,) = vjp(dy0 * (1 + e))
        q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
             + jnp.sum(jnp.square(dm), dtype=jnp.float32))
        return q * 1e-30, maps, dy0

    ms = scan_diff_ms(body, (jnp.float32(0.0), maps, dy0), n1=150, reps=2)
    return {"ms": round(ms, 3)}


def bench_adam_pose():
    import optax
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import init_state, make_optimizer
    cfg = get_config("pose256").override(**{"train.batch_size": BATCH})
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


def conv_inventory_pose():
    """(name, count, Hin, Cin, Cout, stride, kind, mode).

    Pose model (configs.pose256: encoder (32,32,64,64,128,128) strides
    (1,2,1,2,1,2) @256², decoder (128,128,64,32) upsample (T,T,T,F),
    16 keypoints) ×2 encoder streams; VGG16 trunk through relu3_3
    (models/vgg.py:_CFG) twice — recon branch mode 'x' (frozen weights),
    target branch mode 'none'.
    """
    inv = []
    h, cin = 256, 3
    for i, (f, s) in enumerate(zip((32, 32, 64, 64, 128, 128),
                                   (1, 2, 1, 2, 1, 2))):
        inv.append((f"penc{i}_{cin}>{f}s{s}@{h}", 2, h, cin, f, s, "conv",
                    "w" if i == 0 else "xw"))
        h //= s
        cin = f
    inv.append(("pkeynet_head_128>16@32", 1, 32, 128, 16, 1, "head1x1",
                "xw"))
    cin, h = 144, 32                      # 128 features + 16 gaussian maps
    for i, (f, up) in enumerate(zip((128, 128, 64, 32),
                                    (True, True, True, False))):
        kind = "up" if up else "conv"
        inv.append((f"pdec{i}_{cin}>{f}{'up' if up else ''}@{h}", 1, h, cin,
                    f, 1, kind, "xw"))
        if up:
            h *= 2
        cin = f
    inv.append((f"pdec_head_{cin}>3@{h}", 1, h, cin, 3, 1, "conv", "xw"))

    vgg = [("vgg1_1", 256, 3, 64), ("vgg1_2", 256, 64, 64),
           ("vgg2_1", 128, 64, 128), ("vgg2_2", 128, 128, 128),
           ("vgg3_1", 64, 128, 256), ("vgg3_2", 64, 256, 256),
           ("vgg3_3", 64, 256, 256)]
    for nm, h, ci, co in vgg:
        inv.append((f"{nm}_recon_{ci}>{co}@{h}", 1, h, ci, co, 1, "conv",
                    "x"))
        inv.append((f"{nm}_tgt_{ci}>{co}@{h}", 1, h, ci, co, 1, "conv",
                    "none"))
    return inv


GN_SHAPES = [  # (H, C, count): encoder ×2 streams + decoder blocks
    (256, 32, 2), (128, 32, 2), (128, 64, 2), (64, 64, 2), (64, 128, 2),
    (32, 128, 2), (64, 128, 1), (128, 128, 1), (256, 64, 1), (256, 32, 1),
]

POOLS = [  # (name, h_in, c, mode, count)
    ("pool1_recon", 256, 64, "x", 1), ("pool1_tgt", 256, 64, "none", 1),
    ("pool2_recon", 128, 128, "x", 1), ("pool2_tgt", 128, 128, "none", 1),
]

#: r4 pose profile: two 256² coarse-field warps at 1.90 ms each — the
#: bench_warp_field.py design-space optimum (docs/DESIGN.md pose re-profile)
WARP_PAIR_MS = 3.80


def derive(out):
    conv_meas = conv_floor = 0.0
    for r in out["convs"].values():
        rule, fl = conv_rule(r)
        r["floor_rule"] = rule
        conv_meas += r["ms_total"]
        conv_floor += r["count"] * fl
    out["conv_measured_ms"] = round(conv_meas, 2)
    out["conv_proven_floor_ms"] = round(conv_floor, 2)
    pool_ms = sum(r["ms_total"] for r in out["pools"].values())
    out["pool_measured_ms"] = round(pool_ms, 2)
    floor = (out["conv_proven_floor_ms"]
             + out["gn_floor_ms"]
             + out["pool_measured_ms"]      # pool_alts design-space optimum
             + out["loss_reduces"]["floor_ms"]
             + out["bottleneck"]["ms"]      # Pallas design-space optimum
             + out["warp_pair_measured_ms"]
             + out["adam"]["floor_ms"])
    out["derived_floor_ms"] = round(floor, 2)
    out["component_sum_ms"] = round(
        conv_meas + out["gn_measured_ms"] + pool_ms
        + out["loss_reduces"]["ms"] + out["bottleneck"]["ms"]
        + out["warp_pair_measured_ms"] + out["adam"]["ms"], 2)
    return out


def main():
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    path = os.path.join(_HERE, "floor_proof_pose.json")
    out = {"device": jax.devices()[0].platform, "batch": BATCH,
           "method": "floor_proof.py harness at pose256 shapes "
                     "(see module docstring)",
           "warp_pair_measured_ms": WARP_PAIR_MS}
    if os.path.exists(path) and "--resume" in sys.argv:
        with open(path) as fh:
            out.update(json.load(fh))
    out.setdefault("convs", {})
    out.setdefault("pools", {})

    def ckpt():
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)

    for spec in conv_inventory_pose():
        if spec[0] in out["convs"]:
            continue
        name, row = time_conv(*spec)
        out["convs"][name] = row
        print(name, json.dumps(row), flush=True)
        ckpt()

    for name, h, c, mode, count in POOLS:
        if name in out["pools"]:
            continue
        _, row = time_pool(name, count, h, c, mode)
        out["pools"][name] = row
        print(name, json.dumps(row), flush=True)
        ckpt()

    if "gn_measured_ms" not in out:
        rows, ms, floor = time_groupnorm(GN_SHAPES)
        out["groupnorm"] = rows
        out["gn_measured_ms"] = round(ms, 2)
        out["gn_floor_ms"] = round(floor, 2)
        ckpt()

    if "loss_reduces" not in out:
        out["loss_reduces"] = time_loss_reduces()
        print("loss_reduces", out["loss_reduces"], flush=True)
        ckpt()

    if "bottleneck" not in out:
        out["bottleneck"] = time_bottleneck()
        print("bottleneck", out["bottleneck"], flush=True)
        ckpt()

    if "adam" not in out:
        out["adam"] = bench_adam_pose()
        print("adam", out["adam"], flush=True)

    derive(out)
    ckpt()
    print("pose derived additive floor:", out["derived_floor_ms"], "ms;",
          "component sum:", out["component_sum_ms"], "ms")


if __name__ == "__main__":
    main()
