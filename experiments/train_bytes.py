"""Relative HBM-byte accounting of the distillation train step.

The r3 step measured 2.247 GB/img accessed (TPU cost analysis) at
91.7% of HBM peak — bandwidth-bound.  This compiles the step in three
configurations at a reduced shape and compares XLA "bytes accessed"
per image: fp32 BN (the r3 baseline policy), bf16 BN, and
bf16 BN + CAM-block remat (the r4 production default).  CPU fusion
differs from TPU in detail, so the RATIOS are the signal, not the
absolute GB.

    python experiments/train_bytes.py [hw] [bs]
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import AttentionStudentSteps
from rtpe_tpu.train import (DistillConfig, DistillTrainState,
                            make_distill_train_step)

HW = int(sys.argv[1]) if len(sys.argv) > 1 else 192
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main():
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(BS, HW, HW, 3).astype(np.float32),
        "img_alt": rng.rand(BS, HW, HW, 3).astype(np.float32),
        "segm_mask": np.ones((BS, HW, HW, 1), np.float32),
        "gt_hms": np.zeros((BS, HW, HW, 17), np.float32),
        "teacher_hms": rng.rand(BS, HW, HW, 17).astype(np.float32),
        "mask": np.ones((BS, HW, HW, 1), np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    cfg = DistillConfig()

    results = {}
    for label, bn, remat in (("f32bn", None, False),
                             ("bf16bn", jnp.bfloat16, False),
                             ("bf16bn+remat", jnp.bfloat16, True)):
        model = AttentionStudentSteps(
            inplanes=80, num_heatmaps=17, ae_dims=0,
            detach_att_for_det=True, dtype=jnp.bfloat16, remat=remat)
        x0 = jnp.zeros((1, HW, HW, 3))
        sv = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
        state = DistillTrainState.create(sv, cfg)
        step = make_distill_train_step(model, cfg, bn_dtype=bn)
        comp = jax.jit(step).lower(state, batch).compile()
        ca = comp.cost_analysis()
        gb = float(ca.get("bytes accessed", 0.0)) / BS / 1e9
        gf = float(ca.get("flops", 0.0)) / BS / 1e9
        results[label] = (gb, gf)
        print(f"{label:>14}: {gb:7.3f} GB/img accessed, "
              f"{gf:7.1f} GFLOP/img", flush=True)

    base = results["f32bn"][0]
    for label, (gb, gf) in results.items():
        print(f"{label:>14}: {gb / base:5.2f}x bytes vs f32bn")


if __name__ == "__main__":
    main()
