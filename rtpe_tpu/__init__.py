"""rtpe_tpu — a TPU-native real-time multi-person pose-estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``andres-fr/realtime-pose-estimation`` (the reference lives at
``/root/reference``; see ``SURVEY.md`` for the full component inventory):

* HigherHRNet-W48 bottom-up teacher (17 COCO joints + associative
  embeddings), rebuilt as Flax modules running bf16 on the MXU
  (reference: ``rtpe/third_party/pose_higher_hrnet.py``).
* Context-Aware-Module student family trained by distillation
  (reference: ``rtpe/students.py``).
* Fused on-device heatmap decoding (max-pool NMS, top-k, tag grouping,
  quarter-pixel adjust, tag-guided refine) replacing the reference's
  CPU numpy/munkres stack (``rtpe/third_party/group.py``).
* A fixed-shape, device-resident data pipeline with one-matrix batched
  affine augmentation replacing the per-channel PIL replay
  (``rtpe/dataloaders.py``).
* pjit/shard_map data-parallel training over a ``jax.sharding.Mesh``
  (the reference is single-GPU only).

Layout::

  rtpe_tpu/
    configs/    dataclass config tree (mirrors the legacy cfg schema)
    models/     Flax modules: HRNet teacher, stem, student family
    ops/        resize / pooling / color / affine ops with exact
                reference (torch) numerical semantics
    decode/     NMS + top-k (Pallas), AE grouping, adjust/refine
    data/       COCO reader, RLE, Gaussian targets, augmentation
    train/      losses, SGDR schedule, optax, pjit train step
    eval/       OKS COCO keypoint evaluation (own implementation)
    parallel/   mesh + sharding rules
    io/         torch-statedict importer, orbax checkpoints
    utils/      logging, timestamps, model summaries
    native/     C++ helpers (LAP solver, RLE) with Python fallbacks
"""

__version__ = "0.1.0"


def _apply_platform_override():
    """Honor ``RTPE_PLATFORM`` (e.g. ``cpu``) via the config API.

    Subprocess drives (CLI tests) cannot force the platform with the
    ``JAX_PLATFORMS`` env var alone: this environment's sitecustomize
    imports jax at interpreter startup with the TPU platform pinned,
    after which only ``jax.config.update("jax_platforms", ...)``
    takes effect."""
    import os
    plat = os.environ.get("RTPE_PLATFORM")
    if plat:
        try:
            import jax
        except ImportError:
            return
        if plat.strip().lower() == "tpu":
            # Explicitly pinning jax_platforms="tpu" breaks backend
            # init on this environment's tunneled axon TPU ("No
            # jellyfish device found", observed 2026-08-19 after a
            # tunnel restart) while AUTO-selection initializes the
            # same chip fine.  Clear any pin and verify eagerly — a
            # wrong backend must fail loudly (ADVICE r3), never run
            # silently.
            jax.config.update("jax_platforms", "")
            backend = jax.default_backend()  # forces init now
            if backend != "tpu":
                raise RuntimeError(
                    f"RTPE_PLATFORM=tpu but the auto-selected backend "
                    f"is {backend!r} (TPU tunnel down?)")
        else:
            # an invalid value or a failing update must NOT silently
            # run on the wrong backend — that is the exact
            # misconfiguration the env var exists to prevent (ADVICE r3)
            jax.config.update("jax_platforms", plat)


_apply_platform_override()


def _enable_persistent_compilation_cache():
    """First compiles cost 30-180 s; cache executables on disk so every
    process after the first pays ~nothing for known shapes.

    Enabled by default only when the process targets the CPU platform
    (``JAX_PLATFORMS=cpu`` — the test/dryrun configuration).  On the
    tunneled TPU backend in this environment, *loading* a cached
    (AOT-serialized) executable can hang indefinitely or diverge when
    the terminal's libtpu build differs from the client's (the tunnel
    reports exactly this skew), so TPU processes must opt in with
    RTPE_XLA_CACHE=1.  Opt out everywhere with RTPE_NO_XLA_CACHE=1."""
    import os
    if os.environ.get("RTPE_NO_XLA_CACHE"):
        return
    # primary platform only: "tpu,cpu" (TPU with CPU fallback) must NOT
    # enable the cache — the process still compiles for the tunneled TPU
    primary = os.environ.get("JAX_PLATFORMS", "").lower().split(",")[0]
    if not (primary.strip() == "cpu" or os.environ.get("RTPE_XLA_CACHE")):
        return
    try:
        import jax
        cache_dir = os.environ.get(
            "RTPE_XLA_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "rtpe_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compilation_cache()
