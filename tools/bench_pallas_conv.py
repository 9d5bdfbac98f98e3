"""On-chip A/B of the pixel-pair conv kernels vs XLA's conv emitters at the
flagship shapes (marginal-scan method; see bench.py docstring)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from virnet_tpu.ops import pallas_conv as pc


def marginal(make, n1=8, n2=72, reps=5, work=1.0):
    f1, f2 = make(n1), make(n2)
    np.asarray(f1())
    np.asarray(f2())

    def timed(f):
        best = float("inf")
        for _ in range(reps):
            tic = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - tic)
        return best

    t1, t2 = timed(f1), timed(f2)
    dt = (t2 - t1) / (n2 - n1)
    return dt


def bench_mid(n=32, h=256, w=256, c=64, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, c), dtype)
    k = (jax.random.normal(key, (3, 3, c, c), dtype) * 0.1)
    b = jnp.zeros((c,), dtype)

    def make_pallas(length):
        @jax.jit
        def g(x, k, b):
            def body(y, _):
                y2 = pc.conv3x3_mid_pair(pc.pair(y), k, b, slope=0.25)
                return pc.unpair(y2), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return lambda: g(x, k, b)

    def make_xla(length):
        @jax.jit
        def g(x, k, b):
            def body(y, _):
                z = jax.lax.conv_general_dilated(
                    y, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                return jnp.where(z >= 0, z, 0.25 * z), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return lambda: g(x, k, b)

    tp = marginal(make_pallas)
    tx = marginal(make_xla)
    ideal = 2 * 9 * c * c * n * h * w / 197e12
    print(f"mid {n}x{h}x{w}x{c} {jnp.dtype(dtype).name}: "
          f"pallas {tp*1e3:.3f} ms ({ideal/tp*100:.0f}% ideal)  "
          f"xla {tx*1e3:.3f} ms ({ideal/tx*100:.0f}% ideal)")
    return tp, tx


def bench_out(n=32, h=256, w=256, c=96, co=3, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, c), dtype)
    k = jax.random.normal(key, (3, 3, c, co), dtype) * 0.1
    b = jnp.zeros((co,), dtype)
    res = jax.random.normal(key, (n, h, w, co), dtype)

    def make_pallas(length):
        @jax.jit
        def g(x, k, b, res):
            def body(y, _):
                t = pc.conv3x3_out_pair(pc.pair(x), k, b) + y
                return t, 0.0
            y, _ = jax.lax.scan(body, res, None, length=length)
            return y
        return lambda: g(x, k, b, res)

    def make_xla(length):
        @jax.jit
        def g(x, k, b, res):
            def body(y, _):
                t = jax.lax.conv_general_dilated(
                    x, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b + y
                return t, 0.0
            y, _ = jax.lax.scan(body, res, None, length=length)
            return y
        return lambda: g(x, k, b, res)

    tp = marginal(make_pallas)
    tx = marginal(make_xla)
    print(f"out {n}x{h}x{w}x{c}->{co}: pallas {tp*1e3:.3f} ms  "
          f"xla {tx*1e3:.3f} ms")
    return tp, tx


def bench_in(n=32, h=256, w=256, ci=3, co=64, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, ci), dtype)
    k = jax.random.normal(key, (3, 3, ci, co), dtype) * 0.1
    b = jnp.zeros((co,), dtype)

    def make_pallas(length):
        @jax.jit
        def g(x, k, b):
            def body(y, _):
                t = pc.unpair(pc.conv3x3_in_pair(x, k, b, slope=0.25))
                return y + t[..., :ci], 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return lambda: g(x, k, b)

    def make_xla(length):
        @jax.jit
        def g(x, k, b):
            def body(y, _):
                z = jax.lax.conv_general_dilated(
                    x, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                z = jnp.where(z >= 0, z, 0.25 * z)
                return y + z[..., :ci], 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return lambda: g(x, k, b)

    tp = marginal(make_pallas)
    tx = marginal(make_xla)
    print(f"in {n}x{h}x{w}x{ci}->{co}: pallas {tp*1e3:.3f} ms  "
          f"xla {tx*1e3:.3f} ms")
    return tp, tx


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "mid"
    if which == "mid":
        bench_mid()
    elif which == "out":
        bench_out()
    elif which == "in":
        bench_in()
