"""Benchmark: HigherHRNet-W48 teacher throughput on one TPU chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}``

The headline metric matches BASELINE.json: pose images/sec/chip for the
W48 teacher at 640x640 bf16, measured on the row-packed serving path
(``models/hrnet_packed.py`` — BN folded, high-res branch and head in the
half-HBM row-packed layout; parity vs the canonical model is asserted in
``tests/test_rowpack.py``).  ``vs_baseline`` is the ratio against the
PyTorch reference baseline estimate of 9.3 img/s — the reference
publishes no throughput number (BASELINE.md: ``"published": {}``), so
the estimate is what a HigherHRNet-W48 fp16 640px forward sustains on
the 8 GB single GPU the author trained on (README.md:36).  The target
from BASELINE.json is >=10x that baseline.

``extra`` records the other driver-captured numbers (VERDICT.md r1
items 3-4): the int8 serving path, the canonical (un-packed) forward,
the full dual-optimizer distillation train step at the reference's
config (bs16 @450, ``scripts/distillation.py`` defaults), and decode
latency/throughput.

Reliability: each section runs in its OWN SUBPROCESS with a timeout and
one retry.  The remote-compile service of this environment's tunneled
TPU backend wedges a process's compilation indefinitely in ~half of
launches on bad days — and occasionally outright (r4: EVERY compile
wedged for hours while ``jax.devices()`` answered fine, and the old
headline-first retry policy burned the whole driver window on four
420 s attempts).  The orchestrator therefore (a) probes the COMPILE
service with a cheap bounded trivial-jit subprocess before the
headline and after failures, (b) runs the compile-free host metrics
first while the service is sick and re-probes on a backoff, (c) caps
the up-front headline attempts at two and returns to it with whatever
budget remains, and (d) bounds every launch by the battery deadline so
total spend stays inside the driver window (default budget 1500 s —
the r4 driver killed at ~1680 s).  A wedged section costs its timeout,
never the whole bench; sections flush each metric as it lands.

Measurement notes: some execution backends cache identical dispatches,
so each timed run chains N forwards inside one jitted ``lax.scan`` with
a data dependency between iterations and fresh random inputs, and the
clock stops on ``device_get`` of the result — there is nothing left to
fake.
"""

import json
import os
import subprocess
import sys
import time

# The persistent XLA compile cache hangs indefinitely on this tunneled
# TPU backend when it *loads* large (~25 MB) serialized executables —
# a fresh bs-128 W48 compile takes ~80 s, but replaying its cache entry
# never returns (measured).  The bench must never wedge the driver, so
# it opts out of the cache before rtpe_tpu configures it.
os.environ.setdefault("RTPE_NO_XLA_CACHE", "1")
# the bench measures each lap rung explicitly (and falls back through
# the ladder on wedges); the production auto->kernel parity self-check
# would only add two compiles inside the timed sections' deadline
os.environ.setdefault("RTPE_LAP_SELFCHECK", "0")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


TORCH_BASELINE_IMG_S = 9.3  # see module docstring
SCAN_LEN = 10
_FILE = os.path.abspath(__file__)

# per-section subprocess timeouts.  The remote-compile service's speed
# varies by an order of magnitude (the same train-step compile measured
# 36 s and 309 s hours apart), so these bound the slow-service case; a
# WEDGE never returns at all, and then the timeout is the only bound.
SECTION_TIMEOUT = {
    "headline": 420,
    "int8": 420,
    "int8act": 420,
    "train": 460,
    # healthy fused-decode sections finish in <40 s; the timeout only
    # bounds a wedged compile service, and the orchestrator's fresh-
    # process retry is the actual cure — keep the wasted slot small
    "decode_fused1": 320,
    "decode_fused32": 320,
    "decode_host": 300,
    "canonical": 360,
    "tta": 420,
    # two-rung sections (bs64 flushed + bounded bs128 upside): worst
    # case ~150 s bs64 compile + run + a full 380 s upside deadline
    "pipeline": 620,
    "pipeline_int8act": 620,
    # three rungs (bf16 flushed, int8, int8act), each compile bounded
    # at 180 s; the per-rung flush salvages whatever lands
    "pipeline_lat1": 560,
}

# Where the running section flushes each metric as it lands (set in
# --section mode).  A section that wedges mid-way thus still delivers
# every metric measured before the wedge — VERDICT r3 item 1(b): one
# wedged compile must cost ONE metric, not all of a section's.
_OUT_PATH = None
_PARTIAL = {}


def flush_metric(d):
    """Record ``d`` into the section result and flush it to --out."""
    _PARTIAL.update(d)
    if _OUT_PATH is not None:
        tmp = _OUT_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_PARTIAL, f)
        os.replace(tmp, _OUT_PATH)


class _CompileTimeout(Exception):
    pass


class compile_deadline:
    """SIGALRM-bounded region for a possibly-wedging remote compile.

    The tunneled compile service blocks on an RPC (GIL released), so
    the alarm fires even mid-wedge; raising converts a >600 s process
    kill into an in-process fallback to the next rung of the lap
    ladder (VERDICT r3 item 1(c))."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        import signal

        def handler(signum, frame):
            raise _CompileTimeout(f"compile exceeded {self.seconds}s")

        self._old = signal.signal(signal.SIGALRM, handler)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        import signal
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


# chip peaks (TPU v5 lite) for the driver-captured efficiency extras
PEAK_TFLOPS_BF16 = 197.0
PEAK_TOPS_INT8 = 394.0
PEAK_HBM_GBS = 819.0


def _scan_throughput(fwd, args0, bs, hw, reps=3, in_ch=3,
                     cost_out=None):
    """Scan-chained, cache-proof img/s for ``fwd(args0, x)``.

    ``cost_out`` (a dict) receives the compiled program's XLA cost
    analysis normalized per image: a ``lax.scan`` body is counted ONCE
    by cost analysis (measured ratio 1.002 vs the plain program), so
    the loop program's flops/bytes ≈ one dispatch's — the efficiency
    numbers come from the very executable being timed, at zero extra
    compile cost (VERDICT r2 item 2).
    """
    import jax
    import jax.numpy as jnp

    def loop(a, x):
        def body(c, _):
            outs = fwd(a, c)
            y = outs[-1] if isinstance(outs, (tuple, list)) else outs
            c = c + (jnp.mean(y.astype(jnp.float32)) * 1e-9).astype(c.dtype)
            return c, jnp.sum(y.astype(jnp.float32))
        _, sums = jax.lax.scan(body, x, None, length=SCAN_LEN)
        return sums

    x = jax.random.normal(jax.random.PRNGKey(1), (bs, hw, hw, in_ch),
                          jnp.float32)
    # Serving sections default to a 64 MB scoped-VMEM budget: measured
    # +4.7% on the bf16 packed headline (332.6 -> 348.3 img/s, compile
    # 269 -> 119 s; 128 MB gives +6% but risks the section timeout on a
    # cold compile service).  RTPE_SCOPED_VMEM_KIB overrides; empty
    # disables.  TPU-only: the option is rejected elsewhere.
    from rtpe_tpu.utils.compile import serving_compiler_options
    copts = serving_compiler_options()
    t0 = time.time()
    loop_c = jax.jit(loop, compiler_options=copts
                     ).lower(args0, x).compile()
    jax.device_get(loop_c(args0, x))
    log(f"  compile+first {time.time() - t0:.1f}s")
    if cost_out is not None:
        try:
            ca = loop_c.cost_analysis()
            cost_out["gflops_img"] = float(ca.get("flops", 0.0)) / bs / 1e9
            cost_out["gb_img"] = (float(ca.get("bytes accessed", 0.0))
                                  / bs / 1e9)
        except Exception as e:  # cost analysis is best-effort
            log(f"  cost analysis unavailable: {e}")
    times = []
    for t in range(reps):
        x2 = jax.random.normal(jax.random.PRNGKey(61 + t),
                               (bs, hw, hw, in_ch), jnp.float32)
        # force x2 to finish WITHOUT pulling it to the host: fetching a
        # dependent scalar syncs on the relay (block_until_ready does
        # not), while device_get of the full 600+ MB input would take
        # tens of seconds through the tunnel
        jax.device_get(jnp.sum(x2))
        t0 = time.time()
        jax.device_get(loop_c(args0, x2))
        times.append(time.time() - t0)
    dt = min(times)
    return bs * SCAN_LEN / dt


def _efficiency_extras(img_s, cost, prefix, peak_tflops=PEAK_TFLOPS_BF16):
    """Derived %-of-peak numbers for the bench JSON ``extra`` block."""
    if not cost or not img_s:
        return {}
    gf, gb = cost["gflops_img"], cost["gb_img"]
    tflops = img_s * gf / 1e3
    gbs = img_s * gb
    return {
        f"{prefix}_gflops_img": round(gf, 1),
        f"{prefix}_gb_img": round(gb, 3),
        f"{prefix}_tflops": round(tflops, 1),
        f"{prefix}_tflops_pct_peak": round(100 * tflops / peak_tflops, 1),
        f"{prefix}_hbm_gbs": round(gbs, 1),
        f"{prefix}_hbm_pct_peak": round(100 * gbs / PEAK_HBM_GBS, 1),
    }


def _teacher_setup():
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models import (
        PoseHigherHRNet, pack_w48_params, w48_config)

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False))()
    return cfg, model, variables


# ------------------------------------------------------------- sections

def section_headline():
    import jax

    from rtpe_tpu.models import pack_w48_params, packed_forward

    cfg, model, variables = _teacher_setup()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    for bs in (128, 64, 16):  # fallbacks if the big batch fails to fit
        try:
            log(f"packed forward bs={bs}:")
            cost = {}
            img_s = _scan_throughput(
                lambda a, x: packed_forward(a, x, cfg), pk, bs, 640,
                cost_out=cost)
            log(f"  {img_s:.1f} img/s")
            out = {"value": round(img_s, 2), "bs": bs}
            out.update(_efficiency_extras(img_s, cost, "headline"))
            return out
        except Exception as e:
            log(f"packed bs={bs} failed: {str(e)[:160]}")
    raise RuntimeError("no packed batch size worked")


def section_int8():
    """int8 serving path (per-channel weight quant + static activation
    scales; ops/quant.py).  Quantized numerics — reported beside, not
    as, the bf16 headline."""
    import jax

    from rtpe_tpu.models import (
        calibrate_act_scales, pack_w48_params, packed_forward,
        quantize_packed)

    cfg, model, variables = _teacher_setup()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    t0 = time.time()
    # the bench model is a fixed PRNGKey(0) init, so its activation
    # scales are deterministic: use the baked calibration (saved by
    # this very path) and only re-calibrate if it's missing — the
    # CPU capture compile costs 60-150 s
    scales_path = os.path.join(os.path.dirname(_FILE), "experiments",
                               "bench_act_scales.json")
    scales = None
    if os.path.exists(scales_path):
        with open(scales_path) as f:
            scales = json.load(f)
        # a stale bake after a config change would silently misquantize:
        # only trust it if it covers exactly the current conv set.  The
        # r4 file also carries fuse-layer ":out" keys (int8-act operand
        # scales) — extra for this section, not staleness
        if {k for k in scales if not k.endswith(":out")} != set(pk):
            log("baked act scales do not match the current conv set; "
                "re-calibrating")
            scales = None
        else:
            src = "baked"
    if scales is None:
        scales = calibrate_act_scales(
            pk, [jax.random.normal(jax.random.PRNGKey(9),
                                   (1, 320, 320, 3))], cfg)
        with open(scales_path, "w") as f:
            json.dump(scales, f)
        src = "calibrated"
    # one jitted program: per-layer host dispatches cost ~30 ms each
    # through the tunnel (~90 s for 303 layers)
    pkq = jax.jit(lambda p: quantize_packed(p, scales))(pk)
    log(f"int8 quantize ({src}): {time.time() - t0:.1f}s "
        f"({len(scales)} convs)")
    bs = 128
    log(f"int8 packed forward bs={bs}:")
    cost = {}
    img_s = _scan_throughput(
        lambda a, x: packed_forward(a, x, cfg), pkq, bs, 640,
        cost_out=cost)
    log(f"  {img_s:.1f} img/s")
    out = {f"int8_forward_img_s_bs{bs}": round(img_s, 1)}
    # %-of-peak vs the int8 MXU peak (394 TOPS on v5e); flops as XLA
    # cost analysis counts them on the s8xs8->s32 graph
    out.update(_efficiency_extras(img_s, cost, "int8",
                                  peak_tflops=PEAK_TOPS_INT8))
    return out


def _quantized_packed_params(cfg, pk):
    """int8-quantized packed params with cached activation scales.

    The scale file is keyed to the packed-param tree: the conv-input
    scales must cover ``pk`` exactly AND the fuse-layer OUTPUT scales
    (":out" keys, r4 — they arm ``QConv.inv_sy`` int8 operand storage)
    must be present; a pre-r4 file passed the key check and silently
    benched with the operand-int8 path disarmed."""
    import jax

    from rtpe_tpu.models import calibrate_act_scales, quantize_packed

    scales_path = os.path.join(os.path.dirname(_FILE), "experiments",
                               "bench_act_scales.json")
    scales = None
    if os.path.exists(scales_path):
        with open(scales_path) as f:
            scales = json.load(f)
        conv_keys = {k for k in scales if not k.endswith(":out")}
        if conv_keys != set(pk) or not any(
                k.endswith(":out") for k in scales):
            scales = None
    if scales is None:
        scales = calibrate_act_scales(
            pk, [jax.random.normal(jax.random.PRNGKey(9),
                                   (1, 320, 320, 3))], cfg)
        with open(scales_path, "w") as f:
            json.dump(scales, f)
    return jax.jit(lambda p: quantize_packed(p, scales))(pk)


def section_int8act():
    """int8 weights + int8 ACTIVATION STORAGE (consumer-scale static
    quantization of every inter-layer tensor): the remaining 2x HBM
    lever on the memory-bound serving path (VERDICT r2 item 4)."""
    import jax

    from rtpe_tpu.models import pack_w48_params, packed_forward

    cfg, model, variables = _teacher_setup()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    pkq = _quantized_packed_params(cfg, pk)
    bs = 128
    log(f"int8+int8_act packed forward bs={bs}:")
    cost = {}
    img_s = _scan_throughput(
        lambda a, x: packed_forward(a, x, cfg, int8_act=True), pkq,
        bs, 640, cost_out=cost)
    log(f"  {img_s:.1f} img/s")
    out = {f"int8act_forward_img_s_bs{bs}": round(img_s, 1)}
    out.update(_efficiency_extras(img_s, cost, "int8act",
                                  peak_tflops=PEAK_TOPS_INT8))
    return out


def section_train():
    """Full distillation train step at the reference config bs16@450,
    in the production configuration of scripts/distillation.py:
    bf16 BN compute (fp32 batch statistics; the r3 step was HBM-bound
    at 91.7% of peak moving fp32 BN regions while the MXU idled at
    15.4%)."""
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models import AttentionStudentSteps
    from rtpe_tpu.train import (
        DistillConfig, DistillTrainState, make_distill_train_step)

    # RTPE_BENCH_REMAT=1 opts into the CAM-block remat — measured dead
    # end on the chip (r4 ablation: 266 vs 337 img/s, bytes/img
    # 2.25 -> 2.66; the recompute re-reads each block's big inputs
    # while XLA already keeps the cheap internals out of HBM)
    remat = os.environ.get("RTPE_BENCH_REMAT", "0") == "1"
    # RTPE_BENCH_FUSED_CAM=1 opts into the v1 fused Pallas CAM kernels
    # (ops/pallas_cam.py) — measured dead end on the chip (r4): bytes
    # drop 2.25 -> 0.93 GB/img (HBM 92.7% -> 8.9%) but the in-kernel
    # conv recompute is N=hc-MXU-ceiling-bound: 78.4 vs 336.8 img/s
    fused = (os.environ.get("RTPE_BENCH_FUSED_CAM", "0") == "1"
             and not remat)
    student = AttentionStudentSteps(
        inplanes=80, num_heatmaps=17, ae_dims=0,
        detach_att_for_det=True, dtype=jnp.bfloat16, remat=remat,
        fused_cam=fused)
    # the reference's training config is bs16@450 (the headline metric
    # stays there for comparability); RTPE_BENCH_TRAIN_BS measures the
    # per-op-overhead amortization of bigger device batches
    bs = int(os.environ.get("RTPE_BENCH_TRAIN_BS", "16"))
    hw = 450
    x0 = jnp.zeros((1, hw, hw, 3))
    sv = jax.jit(lambda: student.init(
        jax.random.PRNGKey(0), x0, x0, train=False))()
    dcfg = DistillConfig()
    state = DistillTrainState.create(sv, dcfg)
    # RTPE_BENCH_BN=f32 measures the parity-policy step instead
    bn = (None if os.environ.get("RTPE_BENCH_BN") == "f32"
          else jnp.bfloat16)
    step_fn = make_distill_train_step(student, dcfg, bn_dtype=bn)
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

    def train_loop(state, batch):
        def body(carry, _):
            st, b = carry
            st, metrics = step_fn(st, b)
            # data dependency: perturb the input with the loss
            b = dict(b)
            b["img"] = b["img"] + metrics["keypoints_loss"] * 1e-12
            return (st, b), metrics["keypoints_loss"]
        (state, _), losses = jax.lax.scan(
            body, (state, batch), None, length=SCAN_LEN)
        return losses

    # RTPE_SCOPED_VMEM_KIB raises XLA:TPU's scoped-VMEM budget for the
    # step executable (the local client rejects TPU flags in XLA_FLAGS,
    # but per-jit compiler_options travel with the compile request).
    # The HLO byte census (experiments/train_hlo_bytes.py) shows ~45%
    # of store traffic is XLA row-slicing the 256-lane-padded CAM
    # tensors into 29-row chunks — a VMEM-budget-driven conv split.
    copts = None
    vk = os.environ.get("RTPE_SCOPED_VMEM_KIB")
    if vk:
        copts = {"xla_tpu_scoped_vmem_limit_kib": vk}
    t0 = time.time()
    loop_c = jax.jit(train_loop, compiler_options=copts
                     ).lower(state, batch).compile()
    jax.device_get(loop_c(state, batch))
    log(f"train step: compile+first {time.time() - t0:.1f}s")
    cost = {}
    try:
        ca = loop_c.cost_analysis()
        cost["gflops_img"] = float(ca.get("flops", 0.0)) / bs / 1e9
        cost["gb_img"] = float(ca.get("bytes accessed", 0.0)) / bs / 1e9
    except Exception as e:
        log(f"train cost analysis unavailable: {e}")
    times = []
    for t in range(3):
        b2 = dict(batch)
        b2["img"] = jnp.asarray(
            rng.rand(bs, hw, hw, 3).astype(np.float32))
        jax.device_get(jnp.sum(b2["img"]))  # sync, not a full pull
        t0 = time.time()
        jax.device_get(loop_c(state, b2))
        times.append(time.time() - t0)
    img_s = bs * SCAN_LEN / min(times)
    log(f"train step: {img_s:.1f} img/s (bs16 @{hw})")
    key = ("distill_step_img_s_bs16_450" if bs == 16
           else f"distill_step_img_s_bs{bs}_450")
    out = {key: round(img_s, 1),
           "train_config": ("bn=" + ("f32" if bn is None else "bf16")
                            + (",remat" if remat else "")
                            + (",fused_cam" if fused else ""))}
    out.update(_efficiency_extras(img_s, cost, "train"))
    return out


def _bench_lap_ladder():
    """Lap-solver rungs for the fused-decode sections.

    ``RTPE_BENCH_LAP`` (set by the parent's retry) pins one rung; the
    default ladder is mega-kernel ("auto" resolves to it on TPU), then
    per-joint Pallas LAP, then pure XLA — each rung's compile bounded
    by :class:`compile_deadline` so a Mosaic wedge degrades the number
    instead of erasing it (VERDICT r3 item 1(c))."""
    forced = os.environ.get("RTPE_BENCH_LAP")
    return [forced] if forced else ["auto", "pallas", "xla"]


def _make_sparse_det(rng2):
    det = np.clip(rng2.rand(1, 320, 320, 17) * 0.2, 0, 1
                  ).astype(np.float32)
    det[0, 100:103, 100:103, :] = 1.0
    tag = np.zeros((1, 320, 320, 17), np.float32)
    return det, tag


def _make_crowded_batch(rng2, b):
    det = np.clip(rng2.rand(b, 320, 320, 17) * 0.2, 0, 1
                  ).astype(np.float32)
    for bi in range(b):
        for _ in range(6):
            i, j = rng2.randint(5, 310, 2)
            det[bi, i:i + 3, j:j + 3, :] = rng2.rand() * 0.5 + 0.5
    tag = (rng2.randn(b, 320, 320, 17) * 0.1).astype(np.float32)
    return det, tag


def _resolved_lap(lap, single_image):
    """The solver ``lap="auto"`` RESOLVES to for the bench shapes.

    VERDICT r4 item 3: flushing the literal ``"auto"`` hid which rung
    actually ran (the selfcheck gate can silently demote), so a slow
    record could not be told apart from a demoted kernel.  The bench
    disables the selfcheck (RTPE_LAP_SELFCHECK=0, module top), so this
    out-of-jit resolution is exactly what the jitted decode traces."""
    if lap != "auto":
        return lap
    from rtpe_tpu.decode import fused as fused_mod
    return fused_mod._resolve_auto_lap(30, 90, 17, 1,
                                       single_image=single_image)


def _flush_selfcheck(resolved, key):
    """Record the on-device kernel-vs-XLA grouping parity verdict.

    Runs AFTER the timing metrics are flushed so a wedge here costs
    only the verdict; only kernel solvers have one."""
    if resolved not in ("greedy", "lockstep", "kernel"):
        return
    try:
        from rtpe_tpu.decode import fused as fused_mod
        solver = "lap" if resolved == "kernel" else resolved
        with compile_deadline(150):
            ok = fused_mod.kernel_selfcheck(30, 90, 17, 1,
                                            solver=solver)
        flush_metric({key: bool(ok)})
    except Exception as e:
        log(f"selfcheck unavailable: {type(e).__name__}: {e}")


def section_decode_fused1():
    """Device-only fused single-image decode (VERDICT r2 item 5): the
    whole NMS->top-k->group->adjust->refine program scan-chained with
    a data dependency — the on-chip cost a co-located server pays,
    excluding the ~30 ms tunnel round trip."""
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.decode.fused import decode_full

    rng2 = np.random.RandomState(0)
    det, tag = _make_sparse_det(rng2)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)
    use_pallas = jax.devices()[0].platform == "tpu"

    for lap in _bench_lap_ladder():
        try:
            def dec_loop(d0, t0_):
                def body(d, _):
                    people, n, scores = decode_full(
                        d, t0_, use_pallas=use_pallas, lap=lap)
                    d = d + (jnp.sum(scores) * 1e-9).astype(d.dtype)
                    return d, jnp.sum(people)
                _, outs = jax.lax.scan(body, d0, None, length=SCAN_LEN)
                return outs

            with compile_deadline(150):
                dec_c = jax.jit(dec_loop).lower(dj, tj).compile()
                jax.device_get(dec_c(dj, tj))  # compile + first
            dtimes = []
            for t in range(5):
                d2 = jnp.asarray(det + (rng2.rand(*det.shape) * 1e-4
                                        ).astype(np.float32))
                jax.device_get(jnp.sum(d2))  # sync, not a full pull
                t0 = time.time()
                jax.device_get(dec_c(d2, tj))
                dtimes.append(time.time() - t0)
            dev_ms = float(np.median(dtimes)) / SCAN_LEN * 1e3
            resolved = _resolved_lap(lap, single_image=True)
            log(f"decode device-only: {dev_ms:.2f} ms/img "
                f"(fused single-dispatch, lap={resolved}, "
                f"scan-chained x{SCAN_LEN})")
            flush_metric({
                "decode_device_p50_ms_320": round(dev_ms, 2),
                "decode_device_lap": resolved,
                "decode_device_ms_reps": [
                    round(t / SCAN_LEN * 1e3, 2) for t in dtimes],
            })
            _flush_selfcheck(resolved, "decode_device_selfcheck")
            return dict(_PARTIAL)
        except Exception as e:  # a Mosaic lowering error must degrade
            # the rung exactly like a wedged compile (r4: the greedy
            # kernel's first TPU contact died in lowering, and the
            # narrow _CompileTimeout catch lost the whole section)
            log(f"decode_fused1 lap={lap}: {type(e).__name__}: {e}; "
                f"trying next rung")
    raise RuntimeError("all lap rungs failed")


def section_decode_fused32():
    """Batched device-only decode: the grouping LAP is a sequential-
    latency floor, but the mega-kernel / vmap lanes ride it in
    lockstep, so the amortized per-image device cost — the
    serving-relevant number — drops almost linearly with batch."""
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.decode.fused import decode_full_batch

    rng2 = np.random.RandomState(7)
    Bd = 32
    detd, tagd = _make_crowded_batch(rng2, Bd)
    djd, tjd = jnp.asarray(detd), jnp.asarray(tagd)
    use_pallas = jax.devices()[0].platform == "tpu"

    for lap in _bench_lap_ladder():
        try:
            def decb_loop(d0, t0_):
                def body(d, _):
                    people, n, scores = decode_full_batch(
                        d, t0_, use_pallas=use_pallas, lap=lap)
                    d = d + (jnp.sum(scores) * 1e-9).astype(d.dtype)
                    # consume people too: scores are computed BEFORE
                    # the refine stage, so summing only n/scores lets
                    # XLA dead-code-eliminate the refine (~45% of the
                    # decode pre-cap) and the metric overstates
                    return d, jnp.sum(people) + jnp.sum(n).astype(
                        people.dtype)
                _, outs = jax.lax.scan(body, d0, None, length=SCAN_LEN)
                return outs

            with compile_deadline(200):
                decb_c = jax.jit(decb_loop).lower(djd, tjd).compile()
                jax.device_get(decb_c(djd, tjd))
            btimes = []
            for t in range(5):
                d2 = jnp.asarray(detd + (rng2.rand(*detd.shape) * 1e-4
                                         ).astype(np.float32))
                jax.device_get(jnp.sum(d2))
                t0 = time.time()
                jax.device_get(decb_c(d2, tjd))
                btimes.append(time.time() - t0)
            # median, not min (VERDICT r4 item 3): the tunnel's
            # dispatch jitter swings single reps ~2x; the rep list is
            # flushed so a slow-service day is visible in the record
            bdt = float(np.median(btimes)) / SCAN_LEN
            resolved = _resolved_lap(lap, single_image=False)
            log(f"decode device-only batched: {bdt / Bd * 1e3:.2f} "
                f"ms/img ({Bd / bdt:.1f} img/s, batch={Bd} crowded, "
                f"lap={resolved})")
            flush_metric({
                "decode_device_ms_per_img_batch32":
                    round(bdt / Bd * 1e3, 2),
                "decode_device_img_s_batch32": round(Bd / bdt, 1),
                "decode_device_batch_lap": resolved,
                "decode_device_batch_ms_img_reps": [
                    round(t / SCAN_LEN / Bd * 1e3, 2) for t in btimes],
            })
            _flush_selfcheck(resolved, "decode_device_batch_selfcheck")
            return dict(_PARTIAL)
        except Exception as e:
            log(f"decode_fused32 lap={lap}: {type(e).__name__}: {e}; "
                f"trying next rung")
    raise RuntimeError("all lap rungs failed")


def section_decode_host():
    """Production parse_batch (top-k+adjust dispatch, fast host
    grouping, filtered batched device refine): blocking host-visible
    latency, which on this tunnel includes a ~30 ms fixed round trip
    per dispatch.

    Starts with a COMPILE-FREE pure-numpy host-grouping metric (the
    cost the reference pays per image in its munkres loop,
    `rtpe/third_party/group.py:266-287`): during a compile-service
    outage (r4: every jit wedged while jax.devices() stayed healthy)
    this is the one decode number that still lands, and the
    orchestrator runs this section first while the service is sick."""
    import jax.numpy as jnp

    from rtpe_tpu.decode import HeatmapParser
    from rtpe_tpu.decode.group import GroupingParams, match_by_tag
    from rtpe_tpu.decode.group_fast import match_by_tag_fast

    rng2 = np.random.RandomState(0)

    # host grouping, zero device involvement: crowded top-k fixtures
    # (J=17, K=30, ~12 real peaks/joint in 4 tag clusters)
    J, K = 17, 30
    gp = GroupingParams(J, 30, 0.1, 1.0, True, False)
    tag_k = (rng2.randint(0, 4, (J, K, 1)) * 2.0
             + rng2.randn(J, K, 1) * 0.1).astype(np.float32)
    loc_k = rng2.randint(0, 320, (J, K, 2)).astype(np.float32)
    val_k = np.where(np.arange(K)[None, :] < 12,
                     rng2.rand(J, K) * 0.8 + 0.2, 0.0
                     ).astype(np.float32)
    match_by_tag_fast(tag_k, loc_k, val_k, gp)  # warm the code paths
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        match_by_tag_fast(tag_k, loc_k, val_k, gp)
    fast_ms = (time.time() - t0) / reps * 1e3
    t0 = time.time()
    for _ in range(5):
        match_by_tag(tag_k, loc_k, val_k, gp)
    oracle_ms = (time.time() - t0) / 5 * 1e3
    log(f"host grouping (compile-free): fast {fast_ms:.2f} ms/img, "
        f"reference-oracle {oracle_ms:.2f} ms/img (J=17, K=30)")
    flush_metric({
        "decode_hostgroup_fast_ms_img": round(fast_ms, 2),
        "decode_hostgroup_oracle_ms_img": round(oracle_ms, 2),
    })

    parser = HeatmapParser(num_joints=17, max_num_people=30)

    # single sparse image (round-1-comparable number)
    det, tag = _make_sparse_det(rng2)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)
    parser.parse_batch(dj, tj)  # compile
    times = []
    for _ in range(10):
        t0 = time.time()
        parser.parse_batch(dj, tj)
        times.append(time.time() - t0)
    p50 = float(np.median(times) * 1e3)
    log(f"decode p50: {p50:.1f} ms (320x320x17, single image, "
        f"incl ~30 ms tunnel round trip)")
    flush_metric({"decode_p50_ms_320": round(p50, 1)})

    # batched crowded decode: 8 images x ~30 people
    B = 8
    detb, tagb = _make_crowded_batch(rng2, B)
    djb, tjb = jnp.asarray(detb), jnp.asarray(tagb)
    ansb, _ = parser.parse_batch(djb, tjb)
    times = []
    for _ in range(5):
        t0 = time.time()
        parser.parse_batch(djb, tjb)
        times.append(time.time() - t0)
    dt = min(times)
    log(f"decode batched: {B / dt:.1f} img/s "
        f"({dt / B * 1e3:.1f} ms/img, batch={B}, "
        f"{len(ansb[0])} people/img)")
    flush_metric({
        "decode_img_s_batch8_crowded": round(B / dt, 1),
        "decode_ms_per_img_batch8_crowded": round(dt / B * 1e3, 1),
    })
    return dict(_PARTIAL)


def section_canonical():
    """Canonical (training-surface) forward."""
    cfg, model, variables = _teacher_setup()
    log("canonical forward bs=16:")
    cost = {}
    img_s = _scan_throughput(
        lambda v, x: model.apply(v, x, train=False), variables, 16, 640,
        cost_out=cost)
    log(f"  {img_s:.1f} img/s")
    out = {"canonical_forward_img_s_bs16": round(img_s, 1)}
    out.update(_efficiency_extras(img_s, cost, "canonical"))
    return out


def section_tta():
    """Flip-TTA packed forward (SURVEY §5.7 / VERDICT r3 item 4): flip
    rides as a doubled leading axis in ONE dispatch, so the per-IMAGE
    rate must land within 2x of the non-TTA packed rate (two model
    forwards per image + the flip_back/aggregation epilogue)."""
    import jax

    from rtpe_tpu.eval.tta import tta_forward
    from rtpe_tpu.models import pack_w48_params, packed_forward

    cfg, model, variables = _teacher_setup()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    bs = 64  # doubled to 128 inside tta_forward — the headline batch
    nj = cfg.num_joints

    def tta_fwd(scales):
        def fwd(a, x):
            hm, tags = tta_forward(
                lambda b: packed_forward(a, b, cfg), x,
                with_flip=True, scales=scales)
            # consume BOTH outputs: _scan_throughput's body chains on
            # the last output only, and tags come from the primary
            # scale alone — returning the tuple would let XLA dead-
            # code-eliminate the other scales' forwards and the
            # heatmap aggregation epilogue (measured: the 2-scale rung
            # benched identical to flip-only until this sum)
            return hm + tags[..., :nj]
        return fwd

    log(f"flip-TTA packed forward bs={bs} (dispatch 2x{bs}):")
    cost = {}
    img_s = _scan_throughput(tta_fwd((1.0,)), pk, bs, 640,
                             cost_out=cost)
    log(f"  {img_s:.1f} img/s (flip TTA)")
    out = {"tta_flip_img_s_bs64": round(img_s, 1)}
    out.update(_efficiency_extras(img_s, cost, "tta"))
    flush_metric(out)

    # upside rung: flip + multi-scale (the legacy full-quality config's
    # shape, `legacy/valid_ae1dim.py:166-191`) — scales run as separate
    # full-batch dispatches (640 + 320 px here) with on-device
    # aggregation; 3 forwards/img total, so ~1/3 the flip-only rate is
    # the expectation.  Flushed after the ask-tied flip number so a
    # wedge on the second compile costs only this rung.
    try:
        # 270 s: the flip rung above costs ~130 s of the 420 s section
        # budget; the r5 dress rehearsal lost this rung to a 240 s
        # deadline when the compile measured 234.6 s — use the slack
        with compile_deadline(270):
            ms_img_s = _scan_throughput(tta_fwd((1.0, 0.5)), pk, bs,
                                        640)
        log(f"  {ms_img_s:.1f} img/s (flip + 2-scale TTA)")
        out["tta_flip_ms2_img_s_bs64"] = round(ms_img_s, 1)
        flush_metric(out)
    except Exception as e:
        log(f"tta multi-scale rung failed: {str(e)[:160]}")
    return out


def _section_pipeline_impl(int8_act):
    """END-TO-END serving: packed forward + fused batch decode (the
    full image->people device program a production server runs, the
    reference's one-at-a-time forward + CPU-munkres loop:
    `rtpe/third_party/group.py:266-287`).  With the greedy grouping
    solver the decode cost is shape-static, so random weights measure
    the same program a trained model runs.  ``int8_act=True`` swaps in
    the int8-weight + int8-activation forward (same decode program)."""
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.decode.fused import decode_full_batch
    from rtpe_tpu.models import pack_w48_params, packed_forward
    from rtpe_tpu.ops.resize import resize_bilinear

    cfg, model, variables = _teacher_setup()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    if int8_act:
        pk = _quantized_packed_params(cfg, pk)
    nj = cfg.num_joints
    use_pallas = jax.devices()[0].platform == "tpu"
    prefix = "pipeline_int8act" if int8_act else "pipeline"

    def make_e2e(lap):
        def e2e(a, x):
            coarse, refined = packed_forward(
                a, x, cfg, int8_act=int8_act)
            hms = refined[..., :nj].astype(jnp.float32)
            tags = coarse[..., nj:].astype(jnp.float32)
            tags = resize_bilinear(tags, hms.shape[1:3],
                                   align_corners=True)
            people, n, scores = decode_full_batch(
                hms, tags, use_pallas=use_pallas and lap != "xla",
                lap=lap)
            # one combined live output: _scan_throughput chains on the
            # LAST output only, and scores are computed before the
            # refine stage — returning the tuple would let XLA
            # dead-code-eliminate the refine out of the benched program
            return scores + (jnp.sum(people) * 1e-9
                             + jnp.sum(n).astype(jnp.float32))
        return e2e

    # lap ladder x batch fallbacks, each rung's compile bounded so a
    # Mosaic wedge degrades (next rung) instead of erasing the metric.
    # Both variants land the reliable bs64 number FIRST and flush it,
    # then attempt bs128 as pure upside within the same section: the
    # combined forward+decode program's bs128 compile is service-
    # variable (int8act: >600 s observed, bs64 90 s; bf16: 113 s one
    # battery, >380 s the next) — bs128-first cost the whole bf16
    # section in the 2026-08-19 battery.
    bss = (64, 128)
    out = {}
    for lap in _bench_lap_ladder():
        for bs in bss:
            try:
                log(f"{prefix} (forward + fused decode) "
                    f"bs={bs} lap={lap}:")
                cost = {}
                with compile_deadline(380):
                    img_s = _scan_throughput(
                        make_e2e(lap), pk, bs, 640, cost_out=cost)
                log(f"  {img_s:.1f} img/s end-to-end")
                out[f"{prefix}_img_s_bs{bs}"] = round(img_s, 1)
                out[f"{prefix}_lap"] = _resolved_lap(
                    lap, single_image=False)
                out.update(_efficiency_extras(
                    img_s, cost, prefix,
                    peak_tflops=PEAK_TOPS_INT8 if int8_act
                    else PEAK_TFLOPS_BF16))
                flush_metric(out)
                if bs != bss[-1]:
                    continue  # upside attempt at the next batch size
                return out
            except Exception as e:
                log(f"{prefix} bs={bs} lap={lap} failed: "
                    f"{str(e)[:160]}")
                if out:  # the flushed rung already landed; stop here
                    return out
    if out:
        return out
    raise RuntimeError("no pipeline configuration worked")


def section_pipeline():
    return _section_pipeline_impl(int8_act=False)


def section_pipeline_int8act():
    return _section_pipeline_impl(int8_act=True)


def section_pipeline_lat1():
    """Single-IMAGE end-to-end device latency: one 640 px image ->
    packed forward -> fused greedy decode -> people, in ONE dispatch
    at bs=1 — the interactive/'realtime' serving number.  The
    reference pays a per-image CPU munkres decode on top of its
    one-at-a-time forward (`rtpe/third_party/group.py:266-287`);
    this program keeps the whole image->people path on chip.
    Scan-chained with a data dependency (like decode_fused1) so the
    ~30 ms tunnel round trip amortizes out.  bf16 first (flushed),
    then the int8-act variant as upside."""
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.decode.fused import decode_full_batch
    from rtpe_tpu.models import pack_w48_params, packed_forward
    from rtpe_tpu.ops.resize import resize_bilinear

    cfg, model, variables = _teacher_setup()
    pk_bf16 = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    nj = cfg.num_joints
    use_pallas = jax.devices()[0].platform == "tpu"
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 640, 640, 3),
                           jnp.float32)

    def make_loop(pk, int8_act):
        def e2e(c):
            coarse, refined = packed_forward(pk, c, cfg,
                                             int8_act=int8_act)
            hms = refined[..., :nj].astype(jnp.float32)
            tags = coarse[..., nj:].astype(jnp.float32)
            tags = resize_bilinear(tags, hms.shape[1:3],
                                   align_corners=True)
            return decode_full_batch(hms, tags,
                                     use_pallas=use_pallas)

        def loop(c0):
            def body(c, _):
                people, n, scores = e2e(c)
                c = c + (jnp.sum(scores) * 1e-9).astype(c.dtype)
                return c, jnp.sum(people)
            _, outs = jax.lax.scan(body, c0, None, length=SCAN_LEN)
            return outs
        return loop

    out = {}
    pk_q = None  # quantized once, shared by the int8/int8act rungs
    # int8 (weights-only) sits between: at bs=1 the act-quantize ops
    # of int8act are pure overhead (31.5 vs bf16's 22.4 ms in the r4
    # batteries), but int8 WEIGHTS halve the dominant stream — weight
    # DMAs — without adding activation passes, so it is the realtime
    # candidate
    for name, quantize, int8_act in (
            ("bf16", False, False),
            ("int8", True, False),
            ("int8act", True, True)):
        try:
            if quantize:
                if pk_q is None:
                    pk_q = _quantized_packed_params(cfg, pk_bf16)
                pk = pk_q
            else:
                pk = pk_bf16
            with compile_deadline(180):
                lat_c = jax.jit(make_loop(pk, int8_act)
                                ).lower(x0).compile()
                jax.device_get(lat_c(x0))  # compile + first
            times = []
            for t in range(5):
                x2 = x0 + t * 1e-6
                jax.device_get(jnp.sum(x2))  # sync, not a full pull
                t0 = time.time()
                jax.device_get(lat_c(x2))
                times.append(time.time() - t0)
            ms = float(np.median(times)) / SCAN_LEN * 1e3
            log(f"pipeline bs=1 latency ({name}): {ms:.2f} ms/img "
                f"({1e3 / ms:.1f} FPS single-stream, "
                f"scan-chained x{SCAN_LEN})")
            out[f"pipeline_lat1_{name}_p50_ms"] = round(ms, 2)
            flush_metric(out)
        except Exception as e:
            log(f"pipeline_lat1 {name} failed: "
                f"{type(e).__name__}: {str(e)[:160]}")
            if out:
                return out
    if not out:
        raise RuntimeError("no pipeline_lat1 variant worked")
    # the product default: PosePredictor auto-routes sub-threshold
    # batches through the bf16 program (VERDICT r4 item 6), so a
    # realtime deployment gets the best of these rungs automatically
    from rtpe_tpu.eval.predictor import INT8_MIN_BATCH_DEFAULT
    out["pipeline_lat1_routing"] = (
        f"PosePredictor(int8=True) serves batches <"
        f"{INT8_MIN_BATCH_DEFAULT} via the bf16 program")
    flush_metric(out)
    return out


SECTIONS = {
    "headline": section_headline,
    "int8": section_int8,
    "int8act": section_int8act,
    "train": section_train,
    "decode_fused1": section_decode_fused1,
    "decode_fused32": section_decode_fused32,
    "decode_host": section_decode_host,
    "canonical": section_canonical,
    "tta": section_tta,
    "pipeline": section_pipeline,
    "pipeline_int8act": section_pipeline_int8act,
    "pipeline_lat1": section_pipeline_lat1,
}


# --------------------------------------------------------- orchestrator

def _run_section_subprocess(name, env_extra=None, timeout=None):
    """Run one section in a child process; return its dict or None.

    The child's result travels through a temp file (``--out``), not
    stdout — any library printing after the JSON line would otherwise
    discard the whole section (ADVICE r2).  Sections flush each metric
    to the file as it lands (:func:`flush_metric`), so on a timeout or
    crash the partial result is still collected — a wedge costs the
    metrics after it, never the ones before.

    ``timeout`` (orchestrator-supplied) caps the section at the time
    remaining in the battery window, so a section launched near the
    deadline cannot overshoot it by its full SECTION_TIMEOUT — the r4
    driver run was killed externally (rc=124) because spend was only
    checked between launches."""
    import tempfile
    if timeout is None:
        timeout = SECTION_TIMEOUT[name]
    fd, out_path = tempfile.mkstemp(prefix=f"bench_{name}_",
                                    suffix=".json")
    os.close(fd)
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    try:
        failed = False
        try:
            res = subprocess.run(
                [sys.executable, _FILE, "--section", name,
                 "--out", out_path],
                stdout=None, stderr=None,  # logs flow through
                timeout=timeout, cwd=os.path.dirname(_FILE), env=env)
            if res.returncode != 0:
                log(f"[{name}] exited rc={res.returncode}")
                failed = True
        except subprocess.TimeoutExpired:
            log(f"[{name}] TIMED OUT after {timeout}s (wedged "
                f"compile?) — killed")
            failed = True
        try:
            with open(out_path) as f:
                content = f.read()
            got = json.loads(content) if content.strip() else None
        except Exception as e:
            log(f"[{name}] unparseable result file: {e}")
            got = None
        if failed:
            if got:
                log(f"[{name}] salvaged partial result: "
                    f"{sorted(got)}")
                return got
            return None
        return got
    finally:
        for p in (out_path, out_path + ".tmp"):
            try:
                os.unlink(p)
            except OSError:
                pass


def _result_json(headline, extra):
    best = headline["value"] if headline else 0.0
    best_bs = headline["bs"] if headline else 0
    return {
        "metric": "w48_teacher_images_per_sec_per_chip_640_bf16",
        "value": best,
        "unit": f"img/s (batch={best_bs}, packed serving path, "
                f"scan-chained, cache-proof)",
        "vs_baseline": round(best / TORCH_BASELINE_IMG_S, 2),
        "extra": extra,
    }


def _probe_devices(timeout_s=120):
    """Device discovery in a throwaway child.  The tunneled TPU
    backend can wedge INSIDE ``jax.devices()`` (client init hangs —
    observed r4: even a trivial probe never returns), which would hang
    the orchestrator itself before any section timeout fires.  Returns
    (alive, platform)."""
    try:
        # rtpe_tpu first: it applies RTPE_PLATFORM via the config API
        # (env vars alone are clobbered by sitecustomize), so tests can
        # point the probe at CPU while the driver probes the real chip
        r = subprocess.run(
            [sys.executable, "-c",
             "import rtpe_tpu, jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(_FILE))
        plat = (r.stdout.strip().splitlines() or [""])[-1]
        return r.returncode == 0 and bool(plat), plat
    except subprocess.TimeoutExpired:
        return False, ""


def _probe_compile(timeout_s=120):
    """Health probe of the remote COMPILE service, in a throwaway
    child.  The r4 driver run proved device discovery and compilation
    fail independently: ``jax.devices()`` answered instantly while
    every compile wedged forever, and the orchestrator burned its
    whole window on four 420 s headline attempts (`BENCH_r04.json`:
    rc=124, value 0.0).  A trivial jit answers in ~2 s healthy and in
    tens of seconds on a slow service; a wedge never returns, and the
    subprocess timeout converts that into a cheap, bounded "sick"
    verdict the orchestrator can schedule around."""
    code = ("import rtpe_tpu, jax, jax.numpy as jnp\n"
            "y = jax.jit(lambda a: a @ a)("
            "jnp.ones((256, 256), jnp.float32))\n"
            "jax.block_until_ready(y)\n"
            "print('COMPILE_OK')\n")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, timeout=timeout_s, cwd=os.path.dirname(_FILE))
        return r.returncode == 0 and "COMPILE_OK" in (r.stdout or "")
    except subprocess.TimeoutExpired:
        return False


def main():
    import signal

    # The default budget is calibrated to the DRIVER window, not the
    # builder's battery environment: the r4 driver killed the bench
    # (rc=124) after ~1680 s of spend, while the default then was
    # 3300 s — so the deadline guard never fired and four wedged
    # 420 s headline attempts consumed everything (VERDICT r4 item
    # 1c).  1500 s leaves flush slack inside the observed window;
    # builder batteries override with RTPE_BENCH_BUDGET_S=3300.
    budget = float(os.environ.get("RTPE_BENCH_BUDGET_S", "1500"))
    deadline = time.time() + budget

    def remaining():
        return deadline - time.time()

    # liveness gate: wait (bounded) for a wedged device tunnel to
    # recover instead of hanging the orchestrator or burning every
    # section's timeout against a dead backend.  The wait scales with
    # the window: spending 900 s of a 1500 s window waiting (the old
    # default) would leave no room to measure anything.
    wait_budget = float(os.environ.get(
        "RTPE_BENCH_WAIT_TPU_S", str(min(600.0, budget * 0.3))))
    t_wait0 = time.time()
    while True:
        alive, plat = _probe_devices()
        if alive:
            log(f"device platform: {plat}")
            break
        if time.time() - t_wait0 > wait_budget:
            log(f"device discovery still wedged after "
                f"{time.time() - t_wait0:.0f}s; proceeding anyway "
                f"(sections are individually bounded)")
            break
        log("device discovery wedged; retrying in 60s")
        time.sleep(60)

    headline = None
    extra = {}
    done = set()

    # if the caller TERMs us mid-run (driver timeout), still emit the
    # one-JSON-line contract with everything collected so far
    def _flush(signum, frame):
        log("SIGTERM: flushing partial result")
        print(json.dumps(_result_json(headline, extra)), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _flush)

    def launch(name, env_extra=None):
        """Launch a section bounded by BOTH its own timeout and the
        battery deadline; record whatever it flushed.  The headline's
        value/bs stay top-level in the result JSON — its efficiency
        extras are merged by the caller."""
        t = int(min(SECTION_TIMEOUT[name], max(0.0, remaining())))
        if t < 90:
            log(f"[{name}] skipped ({t}s left < 90s floor)")
            return None
        got = _run_section_subprocess(name, env_extra, timeout=t)
        if got is not None:
            if name != "headline":
                extra.update(got)
            done.add(name)
        return got

    probe_t = int(float(os.environ.get("RTPE_BENCH_PROBE_S", "120")))

    # ---- compile-service gate (VERDICT r4 item 1a).  While the
    # service is sick: land the compile-free host metrics first, then
    # re-probe on a backoff instead of burning 420 s headline slots.
    healthy = _probe_compile(probe_t)
    log(f"compile-service probe: {'healthy' if healthy else 'SICK'}")
    if not healthy:
        launch("decode_host")  # flushes pure-host grouping first
        backoff = 60
        while remaining() > probe_t + 180:
            time.sleep(min(backoff, max(1.0, remaining() - probe_t)))
            healthy = _probe_compile(probe_t)
            if healthy:
                log("compile service recovered")
                break
            log(f"compile service still sick; backing off")
            backoff = min(backoff * 2, 240)

    # ---- headline: at most TWO attempts up front (r4 burned the
    # whole window on four); if it is still missing it gets the
    # remaining budget at the END, after every other ask-tied metric
    # had its chance (VERDICT r4 item 1b)
    for attempt in range(2):
        if remaining() <= 0:
            break
        headline = launch("headline")
        if headline is not None and "value" in headline:
            break
        headline = None
        log(f"headline attempt {attempt + 1} failed")
        if attempt == 0 and remaining() > 0 and not _probe_compile(
                probe_t):
            log("compile service probes SICK after headline failure; "
                "deferring the retry to the end of the battery")
            break
    if headline:
        # the headline section's own efficiency extras ride along —
        # _result_json keeps only value/bs (VERDICT r3 item 1(a))
        extra.update({k: v for k, v in headline.items()
                      if k not in ("value", "bs")})

    # ---- main order: ask-tied metrics (VERDICT r5 done-criterion:
    # headline+%-peak, all three decode metrics, train, int8act, tta)
    # run before every upside section; decode first — three rounds of
    # verdicts have asked for driver-captured decode numbers and no
    # driver JSON has ever contained them
    ASK_TIED = {"decode_fused1", "decode_fused32", "decode_host",
                "train", "int8act", "tta", "canonical"}
    ORDER = ("decode_fused1", "decode_fused32", "decode_host",
             "train", "int8act", "tta", "canonical",
             "int8", "pipeline_lat1", "pipeline", "pipeline_int8act")
    pending = []
    for name in ORDER:
        if name in done:
            continue
        if remaining() <= 0:
            log(f"[{name}] skipped (budget)")
            continue
        got = launch(name)
        if got is None and name.startswith("decode_fused") \
                and remaining() > 0:
            # the compile-service wedge is per-PROCESS sticky (verify
            # notes): a kernel-rung _CompileTimeout usually means the
            # process is wedged, not the kernel — so the first retry
            # re-runs the full lap=auto ladder in a FRESH process;
            # an xla-pinned rung in the SAME process once recorded
            # 14.19 ms/img where the healthy kernel does ~1
            log(f"[{name}] retrying once (fresh process, lap=auto)")
            got = launch(name)
        if got is None and remaining() > 0:
            # a failure may be section-local or service-wide: probe
            # before spending another slot (VERDICT r4 item 1a —
            # "re-probe between failed sections")
            if not _probe_compile(probe_t):
                log(f"[{name}] failed and compile service probes "
                    f"SICK; deferring")
                if name in ASK_TIED:
                    pending.append(name)
                continue
            log(f"[{name}] retrying once")
            env2 = ({"RTPE_BENCH_LAP": "xla"}
                    if name.startswith("decode_fused") else None)
            got = launch(name, env_extra=env2)
        if got is None and name in ASK_TIED:
            pending.append(name)

    # ---- final pass with whatever budget remains: the headline
    # first (it is the contract), then deferred ask-tied sections
    while headline is None and remaining() > 90:
        log("final headline attempt (remaining budget)")
        headline = launch("headline")
        if headline is not None and "value" in headline:
            extra.update({k: v for k, v in headline.items()
                          if k not in ("value", "bs")})
            break
        headline = None
        if remaining() > probe_t and not _probe_compile(probe_t):
            log("compile service still sick; stopping headline "
                "retries")
            break
    for name in pending:
        if name in done or remaining() <= 0:
            continue
        log(f"[{name}] final retry (ask-tied metric)")
        launch(name)

    print(json.dumps(_result_json(headline, extra)))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        if len(sys.argv) >= 5 and sys.argv[3] == "--out":
            _OUT_PATH = sys.argv[4]
        result = SECTIONS[sys.argv[2]]()
        if _OUT_PATH is not None:
            flush_metric(result)  # idempotent for flushing sections
        else:
            print(json.dumps(result))
    else:
        main()
