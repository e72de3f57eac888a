"""Isolate the fused-CAM branch-conv matmul strategy on the TPU chip.

The v1 kernels (ops/pallas_cam.py) compute each dilated 3x3 branch as
9 shifted (2048,C)@(C,hc) matmuls and measure ~18 TFLOP/s useful —
far below the ~60 TFLOP/s N=hc-padding ceiling.  Candidate fixes:

  loop9   : v1's per-tap loop (baseline)
  im2col  : build A=(2048, 9C) in VMEM scratch (9 shifted copies),
            then ONE (2048,9C)@(9C,hc) matmul per dilation
  immm    : the im2col matmul alone on a prebuilt A (copy-cost-free
            upper bound)
  bigmm   : (2048, 9C)@(9C, 128) — the full-lane upper bound

Times are scan-chained with perturbed inputs (relay-cache-proof).
Run: python experiments/cam_conv_strategies.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, HC = 16, 113, 113, 163, 40
BAND = 16
WP = 128  # padded width
NB = 8    # bands
M = 1     # halo (dil 1 for simplicity)
DILS = (1, 2, 3)
ITERS = 16


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _loop9_kernel(x_ref, kh_ref, o_ref, xp, *, dils):
    b, band = pl.program_id(0), pl.program_id(1)

    @pl.when(band == 0)
    def _():
        xp[:] = jnp.zeros(xp.shape, xp.dtype)
        xp[pl.ds(3, H), pl.ds(3, W), :] = x_ref[0]

    r0 = band * BAND
    acc = None
    for i, d in enumerate(dils):
        for ti in range(3):
            for tj in range(3):
                di, dj = (ti - 1) * d, (tj - 1) * d
                sl = xp[pl.ds(r0 + 3 + di, BAND), pl.ds(3 + dj, WP), :]
                a2 = sl.reshape(BAND * WP, C)
                p = _mm(a2, kh_ref[i, ti, tj])
                acc = p if acc is None else acc + p
    o_ref[0:1, :] = jnp.sum(acc, axis=0, keepdims=True)


def _im2col_kernel(x_ref, kh_ref, o_ref, xp, a_s, *, dils):
    # kh_ref: (nb, 9*C, HC) — pre-reshaped outside (Mosaic rejects the
    # in-kernel (3,3,C,HC)->(9C,HC) shape cast)
    b, band = pl.program_id(0), pl.program_id(1)

    @pl.when(band == 0)
    def _():
        xp[:] = jnp.zeros(xp.shape, xp.dtype)
        xp[pl.ds(3, H), pl.ds(3, W), :] = x_ref[0]

    r0 = band * BAND
    acc = None
    for i, d in enumerate(dils):
        for ti in range(3):
            for tj in range(3):
                di, dj = (ti - 1) * d, (tj - 1) * d
                sl = xp[pl.ds(r0 + 3 + di, BAND), pl.ds(3 + dj, WP), :]
                a_s[:, pl.ds((3 * ti + tj) * C, C)] = sl.reshape(
                    BAND * WP, C)
        p = _mm(a_s[:], kh_ref[i])
        acc = p if acc is None else acc + p
    o_ref[0:1, :] = jnp.sum(acc, axis=0, keepdims=True)


def _immm_kernel(a_ref, k_ref, o_ref, *, n_mm):
    acc = None
    for i in range(n_mm):
        p = _mm(a_ref[:], k_ref[i])
        acc = p if acc is None else acc + p
    o_ref[0:1, :] = jnp.sum(acc, axis=0, keepdims=True)


def run(name, fn, args, useful_flops):
    def body(c, _):
        out = fn(c, *args[1:])
        s = jnp.sum(out).astype(jnp.float32)
        c = (c + (s * 1e-20).astype(c.dtype)).astype(c.dtype)
        return c, ()

    @jax.jit
    def loop(x0):
        xn, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(xn.astype(jnp.float32))

    x0 = args[0]
    jax.device_get(loop(x0))
    # time on a PERTURBED input: the relay caches whole executions
    # with identical inputs (verify notes), and the in-scan data
    # dependency does not protect the outer repeated call
    ts = []
    for r in range(3):
        xr = (x0 + jnp.asarray(1e-3 * (r + 1), x0.dtype)
              ).astype(x0.dtype)
        jax.device_get(jnp.sum(xr))
        t0 = time.perf_counter()
        jax.device_get(loop(xr))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) / ITERS
    print(f"  {name:7s}: {t*1e3:7.2f} ms  {useful_flops/t/1e12:6.1f} "
          f"TFLOP/s useful", flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    kh = jnp.asarray(rng.rand(len(DILS), 3, 3, C, HC) - 0.5,
                     jnp.bfloat16) * 0.1
    useful = 2 * B * H * W * len(DILS) * 9 * C * HC

    xpad = pltpu.VMEM((NB * BAND + 6, WP + 6, C), jnp.bfloat16)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    f = pl.pallas_call(
        functools.partial(_loop9_kernel, dils=DILS),
        grid=(B, NB),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b, n: (b, 0, 0, 0)),
                  pl.BlockSpec(kh.shape, lambda b, n: (0,) * 5)],
        out_specs=pl.BlockSpec((1, HC), lambda b, n: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, HC), jnp.float32),
        scratch_shapes=[xpad], compiler_params=cp)
    run("loop9", f, (x, kh), useful)

    kh2 = jnp.asarray(np.asarray(kh, np.float32).reshape(
        len(DILS), 9 * C, HC), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(_im2col_kernel, dils=DILS),
        grid=(B, NB),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b, n: (b, 0, 0, 0)),
                  pl.BlockSpec(kh2.shape, lambda b, n: (0,) * 3)],
        out_specs=pl.BlockSpec((1, HC), lambda b, n: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, HC), jnp.float32),
        scratch_shapes=[xpad,
                        pltpu.VMEM((BAND * WP, 9 * C), jnp.bfloat16)],
        compiler_params=cp)
    run("im2col", f, (x, kh2), useful)

    # copy-free matmul rate on the same shapes: grid emulates the same
    # number of matmul launches (B*NB*len(DILS) of (2048,9C)@(9C,HC))
    a = jnp.asarray(rng.rand(BAND * WP, 9 * C), jnp.bfloat16)
    k2 = jnp.asarray(rng.rand(len(DILS), 9 * C, HC) - 0.5,
                     jnp.bfloat16) * 0.1
    f = pl.pallas_call(
        functools.partial(_immm_kernel, n_mm=len(DILS)),
        grid=(B, NB),
        in_specs=[pl.BlockSpec(a.shape, lambda b, n: (0, 0)),
                  pl.BlockSpec(k2.shape, lambda b, n: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, HC), lambda b, n: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, HC), jnp.float32),
        compiler_params=cp)
    run("immm", f, (a, k2), useful)

    # full-lane upper bound: same issued MACs, N=128
    k3 = jnp.asarray(rng.rand(len(DILS), 9 * C, 128) - 0.5,
                     jnp.bfloat16) * 0.1
    f = pl.pallas_call(
        functools.partial(_immm_kernel, n_mm=len(DILS)),
        grid=(B, NB),
        in_specs=[pl.BlockSpec(a.shape, lambda b, n: (0, 0)),
                  pl.BlockSpec(k3.shape, lambda b, n: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda b, n: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=cp)
    run("bigmm", f, (a, k3),
        2 * B * NB * len(DILS) * BAND * WP * 9 * C * 128)


if __name__ == "__main__":
    main()
