"""TPU micro-bench: UpsampleConv backward — XLA autodiff vs custom VJP.

XLA's transpose of the lhs-dilated (transposed) conv reverses the big dy
activation spatially before the weight grad (profiled ~2.3 ms/step at
celeba128/b128 across both decoder up-blocks). models/nets.py::_upconv2x
re-expresses both grads through an ordinary stride-2 conv (no reverses).
This bench times value+grad wrt (x, w) for both formulations.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_aug import _t  # noqa: E402
from keypoints_tpu.models.nets import _UP_A, _upconv2x  # noqa: E402

_A = jnp.asarray(_UP_A)


def _k2(w):
    return jnp.einsum("ui,vj,ijcd->uvcd", _A.astype(w.dtype),
                      _A.astype(w.dtype), w)[::-1, ::-1]


def up_autodiff(x, w):
    return jax.lax.conv_general_dilated(
        x, _k2(w).astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def up_custom(x, w):
    return _upconv2x(x, _k2(w).astype(x.dtype))


def bench(fn, x, w, iters=40):
    def many(args, n):
        x0, w0 = args

        def body(i, c):
            d = (i.astype(x0.dtype) * jnp.asarray(1e-3, x0.dtype))
            val, grads = jax.value_and_grad(
                lambda xx, ww: jnp.sum(fn(xx, ww) ** 2), argnums=(0, 1))(
                    x0 + d, w0)
            return (c + val.astype(jnp.float32)
                    + grads[0].ravel()[0].astype(jnp.float32)
                    + grads[1].ravel()[0].astype(jnp.float32))
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
    for (b, h, c_in, c_out) in [(128, 32, 138, 128), (128, 64, 128, 64)]:
        xf = jnp.asarray(rs.rand(b, h, h, c_in), jnp.float32)
        wf = jnp.asarray(rs.rand(3, 3, c_in, c_out) * 0.1, jnp.float32)
        # correctness: grads must agree (f32)
        ga = jax.jit(jax.grad(lambda xx, ww: jnp.sum(up_autodiff(xx, ww) ** 2),
                              argnums=(0, 1)))(xf, wf)
        gc = jax.jit(jax.grad(lambda xx, ww: jnp.sum(up_custom(xx, ww) ** 2),
                              argnums=(0, 1)))(xf, wf)
        dx_err = np.abs(np.asarray(ga[0]) - np.asarray(gc[0])).max()
        rel = dx_err / max(1e-9, np.abs(np.asarray(ga[0])).max())
        dw_err = np.abs(np.asarray(ga[1]) - np.asarray(gc[1])).max()
        relw = dw_err / max(1e-9, np.abs(np.asarray(ga[1])).max())
        print(f"shape {xf.shape}: dx rel {rel:.2e}  dw rel {relw:.2e}",
              flush=True)
        x = xf.astype(jnp.bfloat16)
        w = wf  # params stay f32, cast happens in k2 path like the model
        for name, fn in [("autodiff", up_autodiff), ("custom", up_custom)]:
            dt = bench(fn, x, w)
            print(f"  {name:10s} {dt*1e3:8.3f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
