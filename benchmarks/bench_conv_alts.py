"""Alternative-schedule measurements for the unproven conv rows (VERDICT r4 #1).

The r4 floor campaign left 7 of 11 conv rows "unproven": nothing had shown
their measured time unavoidable, so they counted naive at-peak floors and the
entire 5.9 ms "conv underfill" gap lived in unexplored territory. This script
measures REAL alternative formulations of each such shape, with the same
fori-difference harness and integrity rules as floor_proof.py:

* ``im2col``    — 9 shifted slices concatenated on channels, then one
  dot_general (K = ks²·Cin): the conv as an explicit MXU matmul.
* ``nchw``      — the identical conv with NCHW/OIHW dimension numbers
  (operands pre-transposed: measures the layout-native schedule).
* ``f32accum``  — preferred_element_type=f32, cast back to bf16.
* ``s2d``       — space-to-depth for the stride-2 3×3: x repacked to
  half-res × 4C, kernel scattered into a 2×2×4C form (16C taps ≥ 9C live
  MACs, but 100% dense lanes on the repacked channels).
* ``subpixel``  — the ×2-upsample conv as 4 phase convs (2×2 sub-kernels
  of the 4×4) + an interleave, instead of one lhs-dilated conv.
* ``plain_up``  — XLA autodiff of the plain lhs-dilated conv: the schedule
  the r4 campaign timed; the step actually runs models.nets._upconv2x's
  custom VJP (floor_proof r5 times THAT), so this records the loser.
* ``dot1x1``    — the KeyNet head as an explicit reshape → matmul.

Outcome per row (floor_proof.conv_rule): an alternative that LOSES upgrades
the row from "unproven → naive" to "schedule_optimum" (measured counts as
the floor of best-known schedules — VERDICT r4: "a loss is a proof too");
one that WINS becomes the row's floor and an integration work item.

Every formulation is checked for numeric equivalence against the base conv
(f32, small shapes) before anything is timed. Results merge into
benchmarks/floor_proof.json as row["alternatives"] and the floor re-derives.

Run on the TPU (after floor_proof.py): python benchmarks/bench_conv_alts.py
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
    _DN, _HERE, conv_inventory, derive, scan_diff_ms)

# ---------------------------------------------------------------- schedules


def base_conv(stride, ks=3, pad=1):
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=_DN)
    return f


# NOTE an earlier "f32accum" variant (preferred_element_type=f32, cast
# back) is unmeasurable through jax.vjp — the cast's f32 cotangent hits
# XLA's conv transpose next to bf16 operands and conv_general_dilated
# rejects the dtype mix. It was also redundant: XLA already accumulates
# bf16 convs in f32 on the MXU. The distinct schedule worth measuring is
# full-f32 operands ("f32" rows, via time_alt's dtype).


def nchw_conv(stride, pad=1):
    """Layout-native NCHW/OIHW schedule — operands arrive pre-transposed."""
    def f(x, k):          # x (B,C,H,W), k (O,I,kh,kw)
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return f


def im2col_conv(stride, ks=3, pad=1):
    def f(x, k):
        b, h, w, c = x.shape
        ho = (h + 2 * pad - ks) // stride + 1
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        cols = [jax.lax.slice(
                    xp, (0, u, v, 0),
                    (b, u + (ho - 1) * stride + 1, v + (ho - 1) * stride + 1,
                     c), (1, stride, stride, 1))
                for u in range(ks) for v in range(ks)]
        p = jnp.concatenate(cols, axis=-1)            # (B,Ho,Wo,ks²C)
        return jax.lax.dot_general(
            p, k.reshape(ks * ks * c, -1), (((3,), (0,)), ((), ())),
            preferred_element_type=x.dtype)
    return f


# u ∈ {0,1,2} of a pad-1 stride-2 3×3 tap → (block row a, phase p) of the
# space-to-depth repack: input row 2i-1+u = 2·(i-1)+1 / 2i / 2i+1.
_S2D_MAP = {0: (0, 1), 1: (1, 0), 2: (1, 1)}


def s2d_conv():
    """Stride-2 3×3 pad-1 conv on the 2×2 space-to-depth repack."""
    def f(x, k):
        b, h, w, c = x.shape
        fo = k.shape[-1]
        xs = (x.reshape(b, h // 2, 2, w // 2, 2, c)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(b, h // 2, w // 2, 4 * c))
        k2 = jnp.zeros((2, 2, 2, 2, c, fo), k.dtype)   # [a,b,pr,pc,c,f]
        for u in range(3):
            a, pr = _S2D_MAP[u]
            for v in range(3):
                bb, pc = _S2D_MAP[v]
                k2 = k2.at[a, bb, pr, pc].set(k[u, v])
        k2 = k2.reshape(2, 2, 4 * c, fo)
        return jax.lax.conv_general_dilated(
            xs, k2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=_DN)
    return f


def subpixel_up(x, k2):
    """×2-upsample conv as 4 phase convs (2×2 parity sub-kernels of the
    4×4) + interleave — vs the one lhs-dilated conv of _upconv2x."""
    b, h, w, c = x.shape
    fo = k2.shape[-1]
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            ksub = k2[py::2, px::2]                     # (2,2,C,F)
            pads = (((1, 0) if py == 0 else (0, 1)),
                    ((1, 0) if px == 0 else (0, 1)))
            phases.append(jax.lax.conv_general_dilated(
                x, ksub, (1, 1), pads, dimension_numbers=_DN))
    y = jnp.stack(phases)                               # (4,B,H,W,F)
    return (y.reshape(2, 2, b, h, w, fo)
             .transpose(2, 3, 0, 4, 1, 5)
             .reshape(b, 2 * h, 2 * w, fo))


def plain_up(x, k2):
    """The r4 row's formulation: plain lhs-dilated conv, XLA autodiff."""
    return jax.lax.conv_general_dilated(
        x, k2, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DN)


def dot1x1(x, k):
    b, h, w, c = x.shape
    y = jax.lax.dot_general(
        x.reshape(b * h * w, c), k.reshape(c, -1),
        (((1,), (0,)), ((), ())), preferred_element_type=x.dtype)
    return y.reshape(b, h, w, -1)


# ------------------------------------------------------------------ harness


def time_alt(f, h, cin, cout, hout, ks, need_dx, layout="nhwc", batch=128,
             dtype=jnp.bfloat16):
    """floor_proof.bench_conv's timing body for an arbitrary formulation."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, h, cin), jnp.float32).astype(dtype)
    k = jnp.asarray(rng.rand(ks, ks, cin, cout) * 0.1, jnp.float32
                    ).astype(dtype)
    dy0 = jnp.asarray(rng.rand(batch, hout, hout, cout), jnp.float32
                      ).astype(dtype)
    if layout == "nchw":
        x = jnp.transpose(x, (0, 3, 1, 2))
        k = jnp.transpose(k, (3, 2, 0, 1))
        dy0 = jnp.transpose(dy0, (0, 3, 1, 2))

    def body(c):
        s, x, k, dy0 = c
        e = (s * 1e-38).astype(k.dtype)
        kk = k + e
        if need_dx:
            y, vjp = jax.vjp(f, x, kk)
            dx, dk = vjp(dy0 * (1 + e))
            q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                 + jnp.sum(jnp.square(dx), dtype=jnp.float32)
                 + jnp.sum(jnp.square(dk), dtype=jnp.float32))
        else:
            y, vjp = jax.vjp(lambda kv: f(x, kv), kk)
            (dk,) = vjp(dy0 * (1 + e))
            q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
                 + jnp.sum(jnp.square(dk), dtype=jnp.float32))
        return q * 1e-30, x, k, dy0

    return scan_diff_ms(body, (jnp.float32(0.0), x, k, dy0))


def _alts_for(name, stride, kind):
    """The formulation menu per row kind.
    Each entry: (f, ks, layout, dtype)."""
    bf, f32 = jnp.bfloat16, jnp.float32
    if kind == "up":
        return {"plain_up": (plain_up, 4, "nhwc", bf),
                "subpixel": (subpixel_up, 4, "nhwc", bf)}
    if kind == "head1x1":
        return {"dot1x1": (dot1x1, 1, "nhwc", bf),
                "f32": (base_conv(1, ks=1, pad=0), 1, "nhwc", f32)}
    alts = {"im2col": (im2col_conv(stride), 3, "nhwc", bf),
            "nchw": (nchw_conv(stride), 3, "nchw", bf),
            "f32": (base_conv(stride), 3, "nhwc", f32)}
    if stride == 2:
        alts["s2d"] = (s2d_conv(), 3, "nhwc", bf)
    return alts


def check_equivalence():
    """Every formulation vs the base conv, f32, small shapes, on CPU-style
    tolerances — run before ANY timing so a wrong schedule can't 'win'."""
    rng = np.random.RandomState(7)
    for stride in (1, 2):
        x = jnp.asarray(rng.randn(2, 16, 16, 5), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, 5, 6) * 0.2, jnp.float32)
        ref = base_conv(stride)(x, k)
        d = float(jnp.max(jnp.abs(im2col_conv(stride)(x, k) - ref)))
        assert d < 1e-4, ("im2col", stride, d)
        xn = jnp.transpose(x, (0, 3, 1, 2))
        kn = jnp.transpose(k, (3, 2, 0, 1))
        d = float(jnp.max(jnp.abs(
            jnp.transpose(nchw_conv(stride)(xn, kn), (0, 2, 3, 1)) - ref)))
        assert d < 1e-4, ("nchw", stride, d)
        if stride == 2:
            d = float(jnp.max(jnp.abs(s2d_conv()(x, k) - ref)))
            assert d < 1e-4, ("s2d", d)
    k2 = jnp.asarray(rng.randn(4, 4, 5, 6) * 0.2, jnp.float32)
    ref = plain_up(x, k2)
    d = float(jnp.max(jnp.abs(subpixel_up(x, k2) - ref)))
    assert d < 1e-4, ("subpixel", d)
    x1 = jnp.asarray(rng.randn(2, 8, 8, 12), jnp.float32)
    k1 = jnp.asarray(rng.randn(1, 1, 12, 4) * 0.2, jnp.float32)
    ref = base_conv(1, ks=1, pad=0)(x1, k1)
    d = float(jnp.max(jnp.abs(dot1x1(x1, k1) - ref)))
    assert d < 1e-4, ("dot1x1", d)
    print("equivalence checks passed", flush=True)


def main():
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    check_equivalence()

    path = os.path.join(_HERE, "floor_proof.json")
    with open(path) as fh:
        out = json.load(fh)

    for name, count, h, cin, cout, stride, kind, need_dx in conv_inventory():
        row = out["convs"].get(name)
        if row is None:
            print("skip (no base row):", name, flush=True)
            continue
        if row.get("quantization_proven"):
            continue                       # already proven by the padding tie
        hout = h * 2 if kind == "up" else h // stride
        alts = row.setdefault("alternatives", {})
        for alt_name, (f, ks, layout, dt) in _alts_for(name, stride,
                                                       kind).items():
            if alt_name in alts:
                continue                     # resume: keep measured rows
            ms = time_alt(f, h, cin, cout, hout, ks, need_dx, layout,
                          dtype=dt)
            alts[alt_name] = round(ms, 3)
            print(f"{name} {alt_name}: {ms:.3f} ms (base {row['ms']})",
                  flush=True)
            with open(path, "w") as fh:    # checkpoint after every timing
                json.dump(derive(out), fh, indent=1)

    derive(out)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("conv floor:", out["conv_proven_floor_ms"],
          "derived:", out["derived_floor_ms"],
          "unproven:", out["conv_unproven_rows"])


if __name__ == "__main__":
    main()
