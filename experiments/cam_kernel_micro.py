"""Per-kernel microbench of the fused-CAM Pallas ops on the TPU chip.

Times F1/F2/F3 and their backwards separately on the two production
shapes (step CAM 113x113x163/hc40, att-hi CAM 113x113x83/hc20) to
attribute the measured 78 vs 337 img/s train-step regression: is each
kernel near its matmul speed-of-light (structural N=hc MXU ceiling x
recompute tax -> dead end) or far below it (fixable pathology)?

The axon relay CACHES executions with identical inputs, so each timing
chains ITERS calls inside one jitted ``lax.scan`` with a data
dependency (x perturbed by the previous output) and stops the clock on
a device_get of a dependent scalar — the bench.py pattern.

Run: python experiments/cam_kernel_micro.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 16


def _time(fn, x, *args):
    """fn(x, *args) -> pytree; returns s/call via a scan-chained loop."""

    def body(xc, _):
        out = fn(xc, *args)
        # fold a scalar of the output back into x: forces real
        # execution of every iteration through the relay
        s = sum(jnp.sum(l).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(out))
        xc = (xc + (s * 1e-20).astype(xc.dtype)).astype(xc.dtype)
        return xc, ()

    @jax.jit
    def loop(x0):
        xn, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(xn.astype(jnp.float32))

    jax.device_get(loop(x))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(loop(x))
    return (time.perf_counter() - t0) / ITERS


def main():
    from rtpe_tpu.ops import pallas_cam as pc

    rng = np.random.RandomState(0)
    b, h, w = 16, 113, 113
    for c, hc, dils in ((163, 40, (1, 2, 3)), (83, 20, (1, 2, 3, 4))):
        nb = len(dils)
        x = jnp.asarray(rng.rand(b, h, w, c), jnp.bfloat16)
        kr = jnp.asarray(rng.rand(c, c) - 0.5, jnp.bfloat16) * 0.1
        kh = jnp.asarray(rng.rand(nb, 3, 3, c, hc) - 0.5,
                         jnp.bfloat16) * 0.1
        kt = jnp.asarray(rng.rand(nb, hc, c) - 0.5, jnp.bfloat16) * 0.1
        bnr = jnp.asarray(rng.rand(4, c), jnp.float32)
        bnh = jnp.asarray(rng.rand(4 * nb, hc), jnp.float32)
        bnt = jnp.asarray(rng.rand(4, c), jnp.float32)
        gate = jnp.asarray(rng.rand(b, c), jnp.float32)
        g = jnp.asarray(rng.rand(b, h, w, c), jnp.bfloat16)
        dsr = jnp.ones((2, c), jnp.float32)
        dsh = jnp.ones((2 * nb, hc), jnp.float32)
        dgap = jnp.ones((b, c), jnp.float32)
        dst = jnp.ones((2, c), jnp.float32)

        # logical conv MACs per pixel for SOL reference
        macs_branch = nb * 9 * c * hc
        macs_res = c * c
        macs_top = nb * hc * c
        px = b * h * w

        print(f"== c={c} hc={hc} dils={dils} "
              f"(branch {macs_branch/1e3:.0f}k, res {macs_res/1e3:.0f}k, "
              f"top {macs_top/1e3:.0f}k MACs/px)", flush=True)

        def rep(name, t, fl):
            print(f"  {name:4s}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} "
                  f"TFLOP/s", flush=True)

        t = _time(lambda xx: pc._f1_call(xx, kr, kh, dils), x)
        rep("F1", t, 2 * px * (macs_branch + macs_res))

        t = _time(lambda xx: pc._f2_call(xx, kh, kt, bnh, dils), x)
        rep("F2", t, 2 * px * (macs_branch + macs_top))

        t = _time(lambda xx: pc._f3_call(
            xx, kr, kh, kt, bnr, bnh, bnt, gate, dils), x)
        rep("F3", t, 2 * px * (macs_branch + macs_res + macs_top))

        t = _time(lambda xx: pc._f1b_call(
            xx, kr, kh, dsr, dsh, dgap, dils), x)
        rep("F1b", t, 2 * px * (3 * macs_branch + 2 * macs_res))

        t = _time(lambda xx: pc._f2b_call(xx, kh, kt, bnh, dst, dils), x)
        rep("F2b", t, 2 * px * (3 * macs_branch + 3 * macs_top))

        t = _time(lambda xx: pc._f3b_call(
            xx, kr, kh, kt, bnr, bnh, bnt, gate, g, dils), x)
        rep("F3b", t, 2 * px * (4 * macs_branch + 3 * macs_res
                                + 4 * macs_top))


if __name__ == "__main__":
    main()
