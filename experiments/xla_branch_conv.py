"""How fast does XLA:TPU run the CAM branch conv it compiles itself?

The pallas strategy isolation (cam_conv_strategies.py) measured a
(2048,9C)@(9C,40) Mosaic matmul at 23.2 TFLOP/s useful (N=40 lane
padding).  The train-step profile shows XLA's own dilated 163->40
convs each under ~0.39 ms/step — faster than that ceiling would allow.
This times the lone XLA conv (fwd and the two backward forms) at the
step shapes to pin the real rate, scan-chained (relay-cache-proof).

Run: python experiments/xla_branch_conv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 16, 113, 113
ITERS = 16


def timed(fn, x, *args):
    def body(c, _):
        out = fn(c, *args)
        s = jnp.sum(out).astype(jnp.float32)
        return (c + (s * 1e-20).astype(c.dtype)).astype(c.dtype), ()

    @jax.jit
    def loop(x0):
        xn, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(xn.astype(jnp.float32))

    jax.device_get(loop(x))
    t0 = time.perf_counter()
    jax.device_get(loop(x))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.RandomState(0)
    for cin, cout, dil in ((163, 40, 2), (163, 40, 1), (83, 20, 3),
                           (120, 163, 1), (163, 163, 1)):
        x = jnp.asarray(rng.rand(B, H, W, cin), jnp.bfloat16)
        k = 1 if (cin, cout) in ((120, 163), (163, 163)) else 3
        w = jnp.asarray(rng.rand(k, k, cin, cout) - 0.5,
                        jnp.bfloat16) * 0.1
        pad = dil * (k // 2)

        def conv(xx, ww):
            # pure bf16 (the step's convs run with bf16 in/out; the f32
            # accumulate stays inside the MXU either way)
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1), ((pad, pad), (pad, pad)),
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        fl = 2 * B * H * W * k * k * cin * cout
        t = timed(conv, x, w)
        print(f"fwd  {k}x{k} d{dil} {cin:3d}->{cout:3d}: "
              f"{t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TFLOP/s", flush=True)

        # input-grad (transposed) and weight-grad forms via jax.vjp
        y, vjp = jax.vjp(lambda xx: conv(xx, w), x)
        g = jnp.asarray(rng.rand(*y.shape), jnp.bfloat16)
        t = timed(lambda gg: vjp(gg)[0], g)
        print(f"dgrad{k}x{k} d{dil} {cin:3d}->{cout:3d}: "
              f"{t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TFLOP/s", flush=True)

        y2, vjp2 = jax.vjp(lambda ww: conv(x, ww), w)
        t = timed(lambda gg: vjp2(gg)[0], g)
        print(f"wgrad{k}x{k} d{dil} {cin:3d}->{cout:3d}: "
              f"{t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
