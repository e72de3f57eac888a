"""Benchmark: HigherHRNet-W48 teacher throughput on one TPU chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``

The headline metric matches BASELINE.json: pose images/sec/chip for the
W48 teacher at 640×640.  ``vs_baseline`` is the ratio against the
PyTorch reference baseline estimate of 9.3 img/s — the reference
publishes no throughput number (BASELINE.md: ``"published": {}``), so
the estimate is what a HigherHRNet-W48 fp16 640px forward sustains on
the 8 GB single GPU the author trained on (README.md:36).  The target
from BASELINE.json is >=10x that baseline.

Extra diagnostics (decode latency p50, batch size sweep) go to stderr;
the single stdout line is the contract.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


TORCH_BASELINE_IMG_S = 9.3  # see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models import PoseHigherHRNet, w48_config

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda: model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False))()

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    deadline = time.time() + float(
        __import__("os").environ.get("RTPE_BENCH_BUDGET_S", "420"))

    best = 0.0
    best_bs = 1
    for bs in (1, 4, 8):
        if best > 0 and time.time() > deadline:
            log(f"bs={bs}: skipped (budget)")
            continue
        x = jax.random.normal(rng, (bs, 640, 640, 3), jnp.float32)
        t0 = time.time()
        jax.block_until_ready(fwd(variables, x))
        log(f"bs={bs}: compile+first {time.time() - t0:.1f}s")
        # warmup
        for _ in range(2):
            jax.block_until_ready(fwd(variables, x))
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            out = fwd(variables, x)
        jax.block_until_ready(out)
        dt = time.time() - t0
        img_s = bs * iters / dt
        log(f"bs={bs}: {img_s:.1f} img/s ({dt / iters * 1e3:.1f} ms/iter)")
        if img_s > best:
            best, best_bs = img_s, bs

    # decode latency p50 (device top-k + host grouping), single image
    try:
        if time.time() > deadline:
            raise TimeoutError("budget exhausted")
        from rtpe_tpu.decode import HeatmapParser
        parser = HeatmapParser(num_joints=17, max_num_people=30)
        det = np.asarray(
            jax.random.uniform(rng, (1, 320, 320, 17))) * 0.2
        det[0, 100:103, 100:103, :] = 1.0
        tag = np.zeros((1, 320, 320, 17), np.float32)
        dj, tj = jnp.asarray(det), jnp.asarray(tag)
        parser.parse(dj, tj)  # compile
        times = []
        for _ in range(10):
            t0 = time.time()
            parser.parse(dj, tj)
            times.append(time.time() - t0)
        log(f"decode p50: {np.median(times) * 1e3:.1f} ms "
            f"(320x320x17 heatmaps)")
    except Exception as e:  # diagnostics only
        log(f"decode bench skipped: {e}")

    result = {
        "metric": "w48_teacher_images_per_sec_per_chip_640_bf16",
        "value": round(best, 2),
        "unit": f"img/s (batch={best_bs})",
        "vs_baseline": round(best / TORCH_BASELINE_IMG_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
