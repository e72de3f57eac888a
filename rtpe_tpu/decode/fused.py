"""Single-dispatch decode: NMS -> top-k -> grouping -> adjust -> refine
as ONE jitted device program.

This is the end state the reference's CPU decode stack maps to on TPU
(SURVEY.md §7 M3): heatmaps never leave the device; the host receives
only the final (p_max, J, 3+D) people table, its length, and the
scores — one dispatch, one transfer.
"""

import os
import warnings
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .group_jit import match_by_tag_jit
from .nms import top_k
from .refine_device import adjust_refine_batch
from ..ops import pallas_group
from ..ops.pallas_group_lockstep import match_by_tag_lockstep


def _tag_image_batch(tag: jax.Array, j: int,
                     tag_per_joint: bool) -> jax.Array:
    """(B, H, W, J*D or D) tag planes -> (B, H, W, J, D) fp32."""
    b, h, w, _ = tag.shape
    t = tag.astype(jnp.float32)
    if tag_per_joint:
        d = t.shape[-1] // j
        return t.reshape(b, h, w, j, d)
    d = t.shape[-1]
    return jnp.broadcast_to(t[:, :, :, None, :], (b, h, w, j, d))


def _refine_tail(det: jax.Array, tag: jax.Array, people_b: jax.Array,
                 n_b: jax.Array, j: int, tag_per_joint: bool,
                 p_max: int, refine_cap: int):
    """Shared batched adjust+scores+capped-refine tail; zeroes slots
    beyond each image's n_people (they may contain refine artifacts)."""
    tag_img = _tag_image_batch(tag, j, tag_per_joint)
    people_b, scores_b = adjust_refine_batch(
        det.astype(jnp.float32), tag_img, people_b, n_b,
        cap=refine_cap)
    slot_valid = jnp.arange(p_max)[None, :] < n_b[:, None]
    people_b = jnp.where(slot_valid[..., None, None], people_b, 0.0)
    scores_b = jnp.where(slot_valid, scores_b, 0.0)
    return people_b, n_b, scores_b


def _kernel_fits(k: int, m: int, p_max: int) -> bool:
    """Shape envelope of the grouping mega-kernel
    (:func:`rtpe_tpu.ops.pallas_group.match_by_tag_kernel`)."""
    return (k <= pallas_group._ROWS and 2 * m + 1 <= pallas_group._LANES
            and p_max <= pallas_group._PSLOTS and k <= m)


_SELFCHECK_CACHE = {}


def kernel_selfcheck(max_num_people: int = 30, p_max: int = 90,
                     num_joints: int = 17, d: int = 1,
                     interpret: bool = False,
                     solver: str = "lap") -> bool:
    """One-time compiled-mega-kernel-vs-XLA grouping parity probe.

    CI exercises the kernel in interpret mode on CPU only; a Mosaic or
    libtpu regression on the real device would otherwise change AP
    silently (ADVICE r3).  This runs the COMPILED kernel against the
    XLA Hungarian on a tiny non-degenerate fixture (well-separated tag
    clusters -> a unique optimal assignment, so tie-breaking cannot
    legitimately diverge) and caches the verdict per process+shapes.
    Any mismatch or kernel failure demotes ``lap="auto"`` to the
    per-joint Pallas path.  Disable with ``RTPE_LAP_SELFCHECK=0``
    (e.g. the bench, which measures each rung explicitly).
    """
    key = (max_num_people, p_max, num_joints, d, interpret, solver)
    if key in _SELFCHECK_CACHE:
        return _SELFCHECK_CACHE[key]
    import numpy as np
    rng = np.random.default_rng(0)
    centers = np.linspace(-6.0, 6.0, 5)
    tags = np.zeros((1, num_joints, max_num_people, d), np.float32)
    for k in range(max_num_people):
        tags[0, :, k, :] = (centers[k % 5]
                            + rng.normal(size=(num_joints, d)) * 0.05)
    locs = rng.uniform(0, 128, size=(1, num_joints, max_num_people, 2)
                       ).astype(np.float32)
    vals = rng.uniform(0.2, 1.0, size=(1, num_joints, max_num_people)
                       ).astype(np.float32)
    vals[0, :, max(1, max_num_people * 2 // 5):] = -1.0  # sub-threshold
    # the callers (decode_full / decode_full_batch) are themselves
    # jitted, so this runs at TRACE time: without an escape every op
    # here would be lifted into the ambient trace and int(n_k[0])
    # would raise ConcretizationTypeError — i.e. the gate would ALWAYS
    # "error" on TPU and silently demote auto off the mega-kernel
    # (found 2026-08-19; CPU CI skips the gate and the bench disables
    # it, so only production TPU decode was affected).
    # `jax.ensure_compile_time_eval()` is NOT a usable escape on this
    # jax (0.9.0): it inlines inner jits and evaluates pallas interpret
    # mode eagerly, where `program_id` has no eval rule.  JAX trace
    # contexts are thread-local, so a worker thread runs the probe
    # outside any ambient trace with full dispatch semantics.
    def _probe():
        if solver == "lockstep":
            p_k, n_k = match_by_tag_lockstep(
                jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
                max_num_people=max_num_people, p_max=p_max,
                interpret=interpret)
        else:
            p_k, n_k = pallas_group.match_by_tag_kernel(
                jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
                max_num_people=max_num_people, p_max=p_max,
                interpret=interpret, solver=solver)
        p_x, n_x = match_by_tag_jit(
            jnp.asarray(tags[0]), jnp.asarray(locs[0]),
            jnp.asarray(vals[0]), max_num_people=max_num_people,
            p_max=p_max, lap="xla")
        return bool(int(n_k[0]) == int(n_x)
                    and np.allclose(np.asarray(p_k[0]), np.asarray(p_x),
                                    atol=1e-4))

    try:
        import concurrent.futures
        # bounded: the axon compile service can wedge a process at any
        # compile (verify notes); an unbounded result() would turn the
        # probe into an indefinite hang on the user's first decode.
        # shutdown(wait=False) so a hung probe thread is abandoned,
        # not joined.
        budget = float(os.environ.get("RTPE_LAP_SELFCHECK_TIMEOUT_S",
                                      "180"))
        ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        try:
            ok = ex.submit(_probe).result(timeout=budget)
        finally:
            ex.shutdown(wait=False)
        if not ok:
            warnings.warn(
                "grouping mega-kernel failed the on-device parity "
                "self-check vs the XLA solver; lap='auto' demoted to "
                "the per-joint Pallas path")
    except Exception as e:
        warnings.warn(
            f"grouping mega-kernel self-check errored ({e!r}); "
            f"lap='auto' demoted to the per-joint Pallas path")
        ok = False
    _SELFCHECK_CACHE[key] = ok
    return ok


def _resolve_auto_lap(max_num_people: int, p_max: int, num_joints: int,
                      d: int, single_image: bool = False) -> str:
    """``auto`` prefers the GREEDY solver for both entry points: the
    exact LAP's sequential Dijkstra depth is the latency floor in
    either shape — single-image 9.6 vs 4.6 ms at 320px crowded-noise
    scenes, and batch-32 5.55 vs 2.07 ms/img for the ``grid=(B, J)``
    greedy mega-kernel.  For BATCH decode ``auto`` picks the LOCKSTEP
    greedy kernel (``grid=(J,)``, batch on sublanes,
    :mod:`rtpe_tpu.ops.pallas_group_lockstep`): the grouping cost no
    longer scales with B — 0.61 vs 12.11 ms per batch-32 grouping on
    crowded scenes (r4, 20×; row-for-row parity with the greedy
    mega-kernel asserted in tests and in the one-time on-device
    self-check).  Single-image keeps ``grid=(B, J)`` greedy: at B=1
    the lockstep kernel's all-images vector ops cost ~1.6× more per
    joint step.  Greedy is straight-line vector code with
    people/AP-level parity asserted on the tie-prone fixtures
    (tests/test_e2e_ap.py, tests/test_decode.py); the exact solver
    stays reachable with ``lap="kernel"``."""
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = on_tpu and _kernel_fits(max_num_people,
                                         max_num_people, p_max)
    solver = "greedy" if single_image else "lockstep"
    if use_kernel and os.environ.get("RTPE_LAP_SELFCHECK", "1") != "0":
        use_kernel = kernel_selfcheck(
            max_num_people, p_max, num_joints, d, solver=solver)
    return solver if use_kernel else ("pallas" if on_tpu else "xla")


@partial(jax.jit, static_argnames=(
    "max_num_people", "detection_threshold", "tag_threshold",
    "use_detection_val", "ignore_too_much", "tag_per_joint",
    "nms_ksize", "nms_padding", "p_max", "use_pallas", "lap",
    "refine_cap"))
def decode_full(det: jax.Array, tag: jax.Array,
                max_num_people: int = 30,
                detection_threshold: float = 0.1,
                tag_threshold: float = 1.0,
                use_detection_val: bool = True,
                ignore_too_much: bool = False,
                tag_per_joint: bool = True,
                nms_ksize: int = 5, nms_padding: int = 2,
                p_max: int = 90,
                use_pallas: bool = False,
                lap: str = "auto",
                refine_cap: int = 32
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:param det: (1, H, W, J); :param tag: (1, H, W, J*D) or (1,H,W,D).
    :param lap: grouping solver — ``"auto"`` picks the single-launch
      grouping mega-kernel (:mod:`rtpe_tpu.ops.pallas_group`: cost
      build + assignment + people-table update, one ``pallas_call``
      for all joints) on TPU — with the GREEDY assignment solver for
      this single-image entry (the exact LAP's sequential Dijkstra
      depth is the blocking-latency floor; people/AP-level agreement
      asserted in tests) — and the XLA Hungarian elsewhere.
      ``"kernel"`` / ``"greedy"`` (and their ``*_interpret`` forms)
      force the mega-kernel with the exact / greedy solver;
      ``"pallas"`` keeps the per-joint LAP-kernel scan; other values
      pass through to
      :func:`~rtpe_tpu.decode.group_jit.match_by_tag_jit`.
    :param refine_cap: refine only the first ``refine_cap`` people
      slots when ``n_people`` fits them (a runtime ``lax.cond``; see
      :func:`~rtpe_tpu.decode.refine_device.adjust_refine_batch`).
      0 disables the cap.
    :returns: (people (p_max, J, 3+D), n_people int32, scores (p_max,)).
    """
    _, h, w, j = det.shape
    if lap == "auto":
        dd = (tag.shape[-1] // j) if tag_per_joint else tag.shape[-1]
        lap = _resolve_auto_lap(max_num_people, p_max, j, dd,
                                single_image=True)
    kernel_laps = ("kernel", "kernel_interpret", "greedy",
                   "greedy_interpret", "lockstep", "lockstep_interpret")
    if lap in kernel_laps:
        # the Mosaic NMS+top-k kernel and the grouping mega-kernel in
        # one program crash this TPU backend (worker kernel fault,
        # reproducible); the XLA top-k costs the same on real scenes,
        # so the combination is simply never emitted
        use_pallas = False
    val_k, loc_k, tag_k = top_k(det, tag, max_num_people, nms_ksize,
                                nms_padding, tag_per_joint,
                                use_pallas=use_pallas)
    if lap in kernel_laps:
        if lap.startswith("lockstep"):
            people_b, n_b = match_by_tag_lockstep(
                tag_k, loc_k, val_k,
                max_num_people=max_num_people,
                detection_threshold=detection_threshold,
                tag_threshold=tag_threshold,
                use_detection_val=use_detection_val,
                ignore_too_much=ignore_too_much,
                p_max=p_max, interpret=lap.endswith("_interpret"))
        else:
            people_b, n_b = pallas_group.match_by_tag_kernel(
                tag_k, loc_k, val_k,
                max_num_people=max_num_people,
                detection_threshold=detection_threshold,
                tag_threshold=tag_threshold,
                use_detection_val=use_detection_val,
                ignore_too_much=ignore_too_much,
                p_max=p_max, interpret=lap.endswith("_interpret"),
                solver="greedy" if lap.startswith("greedy") else "lap")
    else:
        people, n_people = match_by_tag_jit(
            tag_k[0], loc_k[0], val_k[0],
            max_num_people=max_num_people,
            detection_threshold=detection_threshold,
            tag_threshold=tag_threshold,
            use_detection_val=use_detection_val,
            ignore_too_much=ignore_too_much,
            p_max=p_max, lap=lap)
        people_b, n_b = people[None], n_people[None]

    people_b, n_b, scores_b = _refine_tail(
        det, tag, people_b, n_b, j, tag_per_joint, p_max, refine_cap)
    return people_b[0], n_b[0], scores_b[0]


@partial(jax.jit, static_argnames=(
    "max_num_people", "detection_threshold", "tag_threshold",
    "use_detection_val", "ignore_too_much", "tag_per_joint",
    "nms_ksize", "nms_padding", "p_max", "use_pallas", "lap",
    "refine_cap"))
def decode_full_batch(det: jax.Array, tag: jax.Array,
                      max_num_people: int = 30,
                      detection_threshold: float = 0.1,
                      tag_threshold: float = 1.0,
                      use_detection_val: bool = True,
                      ignore_too_much: bool = False,
                      tag_per_joint: bool = True,
                      nms_ksize: int = 5, nms_padding: int = 2,
                      p_max: int = 90,
                      use_pallas: bool = False,
                      lap: str = "auto",
                      refine_cap: int = 32
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched single-dispatch decode: ``vmap`` of :func:`decode_full`
    over the image dimension.

    The device grouping's cost is a SEQUENTIAL-latency floor (a
    ~30-row LAP per joint, 17 joints); under ``vmap`` every image
    rides the same sequential schedule in lockstep vector lanes, so
    the per-image amortized cost drops almost linearly with batch —
    this is the decode-side analog of batching the forward.

    :param det: (B, H, W, J); tag: (B, H, W, J*D or D).
    :param lap: grouping solver (see :func:`decode_full`).  ``"auto"``
      picks the LOCKSTEP greedy kernel on TPU
      (:mod:`rtpe_tpu.ops.pallas_group_lockstep`): ``grid=(J,)`` with
      the whole batch on the sublane axis, so grouping cost is
      ~independent of B — 0.61 ms per batch-32 crowded grouping vs
      12.11 for the ``grid=(B, J)`` greedy mega-kernel
      (``lap="greedy"``) and far more for the exact-LAP kernel
      (``lap="kernel"``, 5.55 ms/img full decode); row-for-row parity
      with the greedy mega-kernel asserted in tests and by the
      one-time on-device self-check.
    :returns: (people (B, p_max, J, 3+D), n_people (B,), scores
      (B, p_max)).
    """
    b, h, w, j = det.shape
    if lap == "auto":
        dd = (tag.shape[-1] // j) if tag_per_joint else tag.shape[-1]
        lap = _resolve_auto_lap(max_num_people, p_max, j, dd)
    kernel_laps = ("kernel", "kernel_interpret", "greedy",
                   "greedy_interpret", "lockstep", "lockstep_interpret")
    if lap in kernel_laps:
        use_pallas = False  # see decode_full: combo crashes the worker
    # top-k is natively batched (and the Pallas kernels stay out of
    # vmap); only the adjust/refine tail is vmapped
    val_k, loc_k, tag_k = top_k(det, tag, max_num_people, nms_ksize,
                                nms_padding, tag_per_joint,
                                use_pallas=use_pallas)

    if lap in kernel_laps:
        if lap.startswith("lockstep"):
            people_b, n_b = match_by_tag_lockstep(
                tag_k, loc_k, val_k,
                max_num_people=max_num_people,
                detection_threshold=detection_threshold,
                tag_threshold=tag_threshold,
                use_detection_val=use_detection_val,
                ignore_too_much=ignore_too_much,
                p_max=p_max, interpret=lap.endswith("_interpret"))
        else:
            people_b, n_b = pallas_group.match_by_tag_kernel(
                tag_k, loc_k, val_k,
                max_num_people=max_num_people,
                detection_threshold=detection_threshold,
                tag_threshold=tag_threshold,
                use_detection_val=use_detection_val,
                ignore_too_much=ignore_too_much,
                p_max=p_max, interpret=lap.endswith("_interpret"),
                solver="greedy" if lap.startswith("greedy") else "lap")
    else:
        def group_one(val_i, loc_i, tagk_i):
            return match_by_tag_jit(
                tagk_i, loc_i, val_i,
                max_num_people=max_num_people,
                detection_threshold=detection_threshold,
                tag_threshold=tag_threshold,
                use_detection_val=use_detection_val,
                ignore_too_much=ignore_too_much,
                p_max=p_max, lap=lap)

        people_b, n_b = jax.vmap(group_one)(val_k, loc_k, tag_k)

    return _refine_tail(det, tag, people_b, n_b, j, tag_per_joint,
                        p_max, refine_cap)
