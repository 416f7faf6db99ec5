"""TPU micro-bench: nearest-up(2x) + conv3x3 implementations, fwd+bwd.

The profiled celeba128 step spends ~3.7 ms/step in the decoder's
``jnp.repeat`` upsample (XLA materializes a 5-D broadcast whose size-2 dim
lands on sublanes → 4x tile padding, plus a mirror reduce in the backward).
Candidates:

  A. repeat:        jnp.repeat x2 then nn-style conv3x3 (round-1 baseline)
  B. broadcast:     one 6-D broadcast + reshape then conv3x3
  C. fused-dilated: EXACT algebraic fusion — conv3x3(nearest_up(x)) is a
     stride-2 transposed conv whose 4x4 kernel is a fixed linear transform
     of the 3x3 kernel (k2 = A w Aᵀ per channel, A = [[0,0,1],[0,1,1],
     [1,1,0],[1,0,0]]); implemented as conv_general_dilated with
     lhs_dilation=2. No upsampled intermediate exists at all.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_aug import _t  # noqa: E402

_A = jnp.asarray([[0., 0., 1.], [0., 1., 1.], [1., 1., 0.], [1., 0., 0.]])


def conv3(x, w):
    w = w.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def up_repeat(x, w):
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv3(x, w)


def up_broadcast(x, w):
    b, h, ww, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, ww, 2, c))
    x = x.reshape(b, 2 * h, 2 * ww, c)
    return conv3(x, w)


def up_fused(x, w):
    k2 = jnp.einsum("ui,vj,ijcd->uvcd", _A, _A, w)     # (4, 4, Cin, Cout)
    k2 = k2[::-1, ::-1].astype(x.dtype)                # spatial reverse
    return jax.lax.conv_general_dilated(
        x, k2, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


_A0 = jnp.asarray([[1., 0., 0.], [0., 1., 1.]])   # output parity 0: taps -1, 0
_A1 = jnp.asarray([[1., 1., 0.], [0., 0., 1.]])   # output parity 1: taps 0, +1


def up_parity(x, w):
    """Same math as up_fused, decomposed into FOUR stride-1 2x2 convs (one
    per 2x2 output parity) + interleave — no lhs_dilation, so the backward
    has no activation reverses."""
    w = w.astype(x.dtype)
    outs = []
    for ar, pr in ((_A0, (1, 0)), (_A1, (0, 1))):
        row = []
        for ac, pc in ((_A0, (1, 0)), (_A1, (0, 1))):
            k = jnp.einsum("ui,vj,ijcd->uvcd", ar.astype(x.dtype),
                           ac.astype(x.dtype), w)
            row.append(jax.lax.conv_general_dilated(
                x, k, (1, 1), (pr, pc),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        outs.append(row)
    b, h, ww, co = outs[0][0].shape
    inner0 = jnp.stack(outs[0], axis=3)          # (B, H, W, 2, C) parity r=0
    inner1 = jnp.stack(outs[1], axis=3)
    arr = jnp.stack([inner0, inner1], axis=2)    # (B, H, 2, W, 2, C)
    return arr.reshape(b, 2 * h, 2 * ww, co)


def bench(fn, x, w, iters=40):
    def many(args, n):
        x0, w0 = args

        def body(i, c):
            d = (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            out = fn(x0 + d, w0)
            g = jax.grad(lambda ww: jnp.sum(fn(x0 + d, ww) ** 2))(w0)
            return c + out.ravel()[0].astype(jnp.float32) \
                + g.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f1 = jax.jit(functools.partial(many, n=iters))
    f2 = jax.jit(functools.partial(many, n=2 * iters))

    def run(f):
        np.asarray(f((x, w)))

    run(f1); run(f2)
    t1 = min(_t(run, f1) for _ in range(3))
    t2 = min(_t(run, f2) for _ in range(3))
    return (t2 - t1) / iters


def main():
    print(jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    for (b, h, c_in, c_out) in [(128, 64, 128, 64), (128, 32, 138, 128)]:
        x = jnp.asarray(rs.rand(b, h, h, c_in), jnp.bfloat16)
        w = jnp.asarray(rs.rand(3, 3, c_in, c_out) * 0.1, jnp.bfloat16)
        # correctness first
        ya = np.asarray(up_repeat(x, w), np.float32)
        yb = np.asarray(up_broadcast(x, w), np.float32)
        yc = np.asarray(up_fused(x, w), np.float32)
        print(f"shape {x.shape}: |A-B|={np.abs(ya-yb).max():.2e} "
              f"|A-C|={np.abs(ya-yc).max():.2e}", flush=True)
        for name, fn in [("repeat", up_repeat), ("broadcast", up_broadcast),
                         ("fused", up_fused), ("parity4", up_parity)]:
            dt = bench(fn, x, w)
            print(f"  {name:10s} {dt*1e3:8.3f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
