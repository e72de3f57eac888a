"""Compiler-option helpers for the serving paths.

XLA:TPU's default 16 MB scoped-VMEM budget makes it split the packed
W48's big spatial convolutions into row chunks whose boundary tensors
are materialized in HBM (visible as async slice/copy streams in the
HLO byte census, ``experiments/train_hlo_bytes.py``).  A 64 MB budget
measured +4.7% on the bf16 packed serving forward (332.6 -> 348.3
img/s at bs128@640) and HALVED its compile time (269 -> 119 s); 128 MB
gave +6% at double the compile time.  The training step, by contrast,
measured WORSE at 64 MB (326.7 vs 336.8 img/s — its overlap schedule
loses more than the slicing costs), so this default applies to serving
entry points only.

The local jax client rejects TPU backend flags in ``XLA_FLAGS``
(axon remote-compile); per-jit ``compiler_options`` travel with the
compile request, so that is the delivery mechanism.
"""

import os

SERVING_SCOPED_VMEM_KIB = 65536


def serving_compiler_options():
    """``compiler_options`` dict for serving jits, or None.

    TPU-only (the option is rejected elsewhere); override the budget
    with ``RTPE_SCOPED_VMEM_KIB`` (empty string disables).
    """
    import jax

    if jax.default_backend() != "tpu":
        return None
    vk = os.environ.get("RTPE_SCOPED_VMEM_KIB",
                        str(SERVING_SCOPED_VMEM_KIB))
    if not vk:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": vk}
