"""Trace one distillation train step at the bench config (bs16@450).

VERDICT r3 item 2: the step is HBM-bound (15.4% of peak TFLOPs at
91.7% of HBM); this captures where the bytes actually go before
touching any lever.  Parse the trace with ``top_events.py /tmp/...``.
"""
import shutil
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import AttentionStudentSteps
from rtpe_tpu.train import (DistillConfig, DistillTrainState,
                            make_distill_train_step)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtpe_prof_train"
shutil.rmtree(OUT, ignore_errors=True)

student = AttentionStudentSteps(
    inplanes=80, num_heatmaps=17, ae_dims=0,
    detach_att_for_det=True, dtype=jnp.bfloat16)
bs, hw = 16, 450
x0 = jnp.zeros((1, hw, hw, 3))
sv = jax.jit(lambda: student.init(
    jax.random.PRNGKey(0), x0, x0, train=False))()
dcfg = DistillConfig()
state = DistillTrainState.create(sv, dcfg)
step_fn = make_distill_train_step(student, dcfg)
rng = np.random.RandomState(0)
batch = {
    "img": rng.rand(bs, hw, hw, 3).astype(np.float32),
    "img_alt": rng.rand(bs, hw, hw, 3).astype(np.float32),
    "segm_mask": np.ones((bs, hw, hw, 1), np.float32),
    "gt_hms": np.zeros((bs, hw, hw, 17), np.float32),
    "teacher_hms": rng.rand(bs, hw, hw, 17).astype(np.float32),
    "mask": np.ones((bs, hw, hw, 1), np.float32),
}
batch = {k: jnp.asarray(v) for k, v in batch.items()}
state, m = step_fn(state, batch)
jax.block_until_ready(m["keypoints_loss"])
print("compiled", flush=True)
jax.profiler.start_trace(OUT)
for t in range(3):
    state, m = step_fn(state, batch)
    jax.block_until_ready(m["keypoints_loss"])
jax.profiler.stop_trace()
print("traced ->", OUT, flush=True)
