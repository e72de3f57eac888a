"""Census of materialized activations on the int8-act serving path.

VERDICT r3 item 5: int8-act runs 530 img/s at 0.856 GB/img accessed —
~40% of the bf16 path's bytes remain.  This enumerates every tensor
``packed_forward`` explicitly materializes (via the ``STORE_TAP``
trace hook) and sums bytes by dtype, separating:

* int8-stored inter-layer activations (the quantized majority),
* bf16 fallbacks (stores whose consumer is not a quantized conv),
* conv outputs that never pass through ``_store`` (fuse-layer
  accumulation operands, head outputs) — the remainder between this
  census and the XLA cost analysis, i.e. fusion temporaries and
  relayout copies.

Run on CPU (trace only; nothing executes):
    JAX_PLATFORMS=cpu python experiments/int8act_bytes.py
"""
import sys
from collections import defaultdict

import numpy as np

import jax

# trace-only: force CPU via the config API (env vars are clobbered by
# this environment's sitecustomize, which pins the tunneled TPU)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import hrnet_packed as hp
from rtpe_tpu.models import w48_config
from rtpe_tpu.models.hrnet import PoseHigherHRNet

BS, HW = 1, 640  # per-image accounting; bench runs bs128@640


def main():
    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pk = hp.pack_w48_params(variables, cfg)
    # synthetic calibration is fine here: only QConv-vs-not and SHAPES
    # matter for the census, not the scale values
    calib = [np.random.RandomState(0).rand(1, 64, 64, 3)
             .astype(np.float32)]
    scales = hp.calibrate_act_scales(pk, calib, cfg)
    pk = hp.quantize_packed(pk, scales)

    hp.STORE_TAP = tap = []
    x = jnp.zeros((BS, HW, HW, 3), jnp.float32)
    jax.eval_shape(lambda x: hp.packed_forward(pk, x, cfg,
                                               int8_act=True), x)
    hp.STORE_TAP = None

    by_dtype = defaultdict(int)
    rows = []
    for consumer, shape, dtype in tap:
        n = int(np.prod(shape))
        width = {"int8": 1, "bfloat16": 2, "float32": 4}[dtype]
        by_dtype[dtype] += n * width
        rows.append((n * width, consumer, shape, dtype))

    print(f"{len(tap)} stored tensors at bs={BS}@{HW}")
    for dt, b in sorted(by_dtype.items()):
        print(f"  {dt:>9}: {b / 1e6:8.1f} MB/img stored "
              f"(~{2 * b / 1e6:.1f} MB/img write+read)")
    print("\nlargest 20 stores:")
    for b, consumer, shape, dtype in sorted(rows, reverse=True)[:20]:
        print(f"  {b / 1e6:7.2f} MB  {dtype:>9}  {shape}  -> {consumer}")

    total = sum(by_dtype.values())
    print(f"\nstored total: {total / 1e6:.1f} MB/img; "
          f"2x (write+read) = {2 * total / 1e6:.1f} MB/img vs "
          f"BENCH_r03 int8act_gb_img = 856 MB/img accessed")


if __name__ == "__main__":
    main()
