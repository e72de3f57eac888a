"""High-level inference API: image in, people in image coordinates out.

The reference scatters this flow across its validation script
(``validate_hhrnet.py:84-110``: resize-align -> forward -> upsample ->
parse -> inverse transform); here it is one object suitable for
serving.  Distinct input shapes compile once each (the 64-multiple
resize keeps the shape set small); decode runs on the host-group path
by default (see decode/parser.py for the trade-offs).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.preprocess import (
    get_final_preds,
    normalize_image,
    resize_align_multi_scale,
)
from ..decode import HeatmapParser
from ..ops.resize import resize_bilinear


def _to_unit_rgb(image) -> np.ndarray:
    """uint8 / 0-255 float / 0-1 float RGB -> float32 in [0, 1].

    Integer inputs divide by 255 unconditionally (a near-black uint8
    frame must not be mistaken for unit-range); the max-value heuristic
    applies only to floats, whose range is genuinely ambiguous.
    """
    arr = np.asarray(image)
    img = arr.astype(np.float32)
    if np.issubdtype(arr.dtype, np.integer) or img.max() > 1.5:
        img = img / 255.0
    return img


# Batches smaller than this are served through the bf16 packed program
# when int8/int8-act is enabled: the measured crossover on the v5e chip
# (experiments/int8_smallbatch.py, r5 forward-only ms/img — bf16 vs
# int8-act: bs1 25.8/49.6, bs2 16.3/28.0, bs4 11.0/16.7, bs8 4.99/4.41)
# — the quantize/dequantize passes only amortize once ~8 images fill
# the MXU sublanes; from bs 8 the quantized path wins.
INT8_MIN_BATCH_DEFAULT = 8


class PosePredictor:
    """Bottom-up multi-person pose inference with the W48 teacher head
    contract (coarse = heatmaps+tags @1/4, refined = heatmaps @1/2)."""

    def __init__(self, model, variables, num_joints: int = 17,
                 input_size: int = 640,
                 parser: Optional[HeatmapParser] = None,
                 with_flip: bool = False,
                 scales: Sequence[float] = (1.0,),
                 packed: bool = False,
                 int8: bool = False,
                 int8_act: bool = False,
                 calibration_images: Optional[Sequence] = None,
                 allow_synthetic_calibration: bool = False,
                 act_scales=None,
                 mesh=None,
                 spatial_mesh=None,
                 fused_decode: Optional[bool] = None,
                 int8_min_batch: Optional[int] = None):
        """``packed=True`` serves the W48 teacher through the row-packed
        fast path (``models/hrnet_packed.py``): BN folded into bf16
        weights once here, ~1.9x the canonical forward throughput.

        ``int8=True`` (requires ``packed``) additionally quantizes the
        packed weights to per-channel int8 with static activation
        scales (``ops/quant.py``; +30% throughput on v5e, measured
        432.7 vs 334.3 img/s at bs128 @640).  Pass
        ``calibration_images`` — an iterable of RGB images in any of
        the ranges :meth:`predict` accepts (uint8, 0-255 float, or
        0-1 float) — for activation-range calibration.  Without them,
        int8 REQUIRES ``allow_synthetic_calibration=True``: a random
        normalized batch produces working but unvalidated scales, and
        silently serving with them is exactly the failure mode the
        gate exists to prevent.

        ``act_scales`` — a precomputed activation-scale set: either
        the dict from ``calibrate_act_scales`` (exposed on this object
        as ``self.act_scales`` after an int8 init) or a path to a file
        written by ``models.save_act_scales``.  Skips the calibration
        forward entirely — the production pattern is calibrate once,
        ``save_act_scales`` next to the weights, and construct every
        serving process from the file (no calibration corpus needed
        at load time).  Mutually exclusive with
        ``calibration_images``.

        ``int8_act=True`` (requires ``int8``) additionally stores the
        inter-layer activations as int8 (consumer-scale static
        quantization) — the remaining 2x HBM lever on the
        memory-bound serving path; slightly coarser numerics than
        plain int8 (see ``tests/test_rowpack.py``).

        ``mesh`` — a ``jax.sharding.Mesh`` with a ``data`` axis: batch
        calls (:meth:`predict_batch`) shard the image batch over it
        with replicated parameters (data-parallel serving; the
        reference serves strictly one image on one GPU).

        ``spatial_mesh`` — a ``jax.sharding.Mesh`` with a ``model``
        axis: the forward runs as the FULLY spatially-sharded W48
        (``parallel/spatial.py:spatial_forward_w48`` — every
        activation H-sharded with ``ppermute`` halo exchanges), for
        inputs so large (>1k px) that one chip's HBM cannot hold the
        activations.  BN is folded into dense fp32 weights once here;
        output equals the canonical forward within fold tolerance
        (``tests/test_spatial_stem.py``).  Requires the post-resize
        height to divide by ``32 * n_shards`` — pick ``input_size``
        accordingly (the 64-multiple resize keeps this easy).
        Mutually exclusive with ``packed``/``mesh``.

        ``fused_decode`` — decode through the single-device-program
        fused path (:meth:`HeatmapParser.parse_fused_batch`: on TPU
        the lockstep greedy grouping kernel, ~1.1 vs 7.6 ms/img at
        crowded batch-32, r5 measurement).  Default (``None``) resolves to True on the
        TPU backend and False elsewhere (the hybrid host-grouping
        :meth:`~HeatmapParser.parse_batch` is the oracle-parity path
        and faster than interpret-mode kernels on CPU).

        ``int8_min_batch`` — int8/int8-act serving auto-routes batches
        SMALLER than this through the bf16 packed program: at bs 1 the
        quantized forward is *slower* than bf16 (r4/r5 chip
        measurements: 31.5 vs 22.4 ms end-to-end — the per-conv
        quantize/dequantize ops only amortize batched), and realtime
        single-stream latency is the one regime where that matters.
        Default (``None``) resolves to the measured crossover
        (:data:`INT8_MIN_BATCH_DEFAULT`,
        ``experiments/int8_smallbatch.py``); ``0`` disables routing
        (every batch runs quantized).  Note the routed small batches
        return bf16 numerics — identical to serving the same image
        with ``int8=False``."""
        self.model = model
        self.variables = variables
        self.num_joints = num_joints
        self.input_size = input_size
        self.parser = parser or HeatmapParser(num_joints=num_joints)
        if fused_decode is None:
            fused_decode = jax.default_backend() == "tpu"
        self.fused_decode = bool(fused_decode)
        self.with_flip = with_flip
        self.scales = tuple(scales)
        self.act_scales = None  # set by an int8 packed init
        self._fwd_bf16 = None   # set by an int8 packed init (routing)
        if int8_min_batch is None:
            int8_min_batch = INT8_MIN_BATCH_DEFAULT
        self.int8_min_batch = int(int8_min_batch)
        if int8 and not packed:
            raise ValueError("int8=True requires packed=True")
        if int8_act and not int8:
            raise ValueError("int8_act=True requires int8=True")
        if act_scales is not None and calibration_images is not None:
            raise ValueError(
                "act_scales and calibration_images are mutually "
                "exclusive: precomputed scales skip calibration")
        if int8 and calibration_images is None and act_scales is None \
                and not allow_synthetic_calibration:
            raise ValueError(
                "int8=True without calibration_images uses synthetic "
                "random-batch activation scales — unvalidated numerics."
                " Pass real calibration_images (or precomputed "
                "act_scales), or opt in explicitly with "
                "allow_synthetic_calibration=True")
        if spatial_mesh is not None:
            if packed or mesh is not None:
                raise ValueError(
                    "spatial_mesh is the dense fp32 halo-exchange "
                    "path; it composes with neither packed/int8 nor "
                    "a data mesh")
            from ..models.hrnet_packed import fold_w48_params
            from ..parallel.spatial import spatial_forward_w48
            cfg = model.cfg
            fw = jax.jit(lambda v: fold_w48_params(v, cfg))(variables)
            n_sp = spatial_mesh.shape["model"]

            def spatial_fwd(x):
                if x.shape[1] % (32 * n_sp):
                    raise ValueError(
                        f"spatial_mesh: post-resize height {x.shape[1]}"
                        f" must divide by 32*{n_sp}; adjust input_size")
                return spatial_forward_w48(fw, x, spatial_mesh, cfg)

            self._fwd = spatial_fwd
        elif packed:
            from ..models.hrnet_packed import (
                calibrate_act_scales, pack_w48_params, packed_forward,
                quantize_packed)
            cfg = model.cfg
            pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
            pk_bf16 = pk
            if int8:
                if act_scales is not None:
                    if not isinstance(act_scales, dict):
                        from ..models.hrnet_packed import \
                            load_act_scales
                        act_scales = load_act_scales(act_scales)
                    missing = [k for k in pk if k not in act_scales]
                    if missing:
                        raise ValueError(
                            f"act_scales is missing {len(missing)} of "
                            f"{len(pk)} conv entries (e.g. "
                            f"{missing[:3]}): scale file from a "
                            f"different config or percentile run?")
                    scales_d = act_scales
                else:
                    # one fixed calibration shape: each distinct shape
                    # recompiles the (CPU) capture forward
                    hw = max(64, min(input_size, 320))
                    if calibration_images is not None:
                        # same range handling as predict(): users
                        # naturally pass the frames they serve (often
                        # uint8)
                        calib = [resize_bilinear(
                            jnp.asarray(normalize_image(
                                _to_unit_rgb(im)))[None],
                            (hw, hw), align_corners=False)
                            for im in calibration_images]
                    else:
                        calib = [jax.random.normal(
                            jax.random.PRNGKey(0), (1, hw, hw, 3))]
                    scales_d = calibrate_act_scales(pk, calib, cfg)
                self.act_scales = dict(scales_d)
                # one jitted program (per-layer dispatches are slow on
                # remote backends)
                pk = jax.jit(lambda p: quantize_packed(p, scales_d))(pk)
            from ..utils.compile import serving_compiler_options
            self._fwd = jax.jit(
                lambda x: packed_forward(pk, x, cfg,
                                         int8_act=int8_act),
                compiler_options=serving_compiler_options())
            if int8:
                # small-batch realtime route: jit is lazy, so this
                # costs nothing unless a small batch actually arrives
                self._fwd_bf16 = jax.jit(
                    lambda x: packed_forward(pk_bf16, x, cfg),
                    compiler_options=serving_compiler_options())
        else:
            from ..utils.compile import serving_compiler_options
            self._fwd = jax.jit(
                lambda x: model.apply(variables, x, train=False),
                compiler_options=serving_compiler_options())
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            raw = self._fwd
            in_sh = NamedSharding(mesh, P("data"))
            self._fwd_sharded = jax.jit(
                raw, in_shardings=(in_sh,),
                out_shardings=NamedSharding(mesh, P("data")))
        else:
            self._fwd_sharded = None

    # ------------------------------------------------------ constructors

    @classmethod
    def from_artifact(cls, path: str, **overrides) -> "PosePredictor":
        """Construct a serving process from ONE artifact directory
        (``io/serving.py``): weights, calibrated int8 scales, model
        config, and predictor settings all ship together — no torch,
        no calibration corpus, no config code at load time.  Keyword
        overrides win over the artifact's recorded settings (e.g.
        ``from_artifact(d, int8=False)`` serves the same weights in
        bf16; ``dtype=`` sets the canonical model's compute dtype,
        default bf16 to match ``get_hrnet_w48_teacher``)."""
        import jax.numpy as _jnp

        from ..io.serving import load_serving_artifact
        from ..models.hrnet import PoseHigherHRNet

        art = load_serving_artifact(path)
        dtype = overrides.pop("dtype", _jnp.bfloat16)
        model = PoseHigherHRNet(cfg=art.cfg, dtype=dtype)
        kwargs = dict(art.predictor_kwargs)
        kwargs.update(overrides)
        if not kwargs.get("int8"):
            kwargs.pop("act_scales", None)  # bf16 override drops scales
        return cls(model, art.variables, **kwargs)

    # ------------------------------------------------------ shared path

    def _preprocess(self, image_rgb):
        """Image (any accepted range) -> (model input HWC, center, scale)."""
        img = _to_unit_rgb(image_rgb)
        resized, center, scale = resize_align_multi_scale(
            img * 255.0, self.input_size, 1, 1)
        return normalize_image(resized / 255.0), center, scale

    def _route_fwd(self, n: int):
        """The forward program for an ``n``-image call: below the int8
        routing threshold the bf16 packed program serves (faster at
        small batch AND bf16-exact numerics); ``n`` counts user images
        — TTA's internal flip-doubling doesn't change the regime."""
        if self._fwd_bf16 is not None and n < self.int8_min_batch:
            return self._fwd_bf16
        return self._fwd

    def _parse(self, hms, tags):
        if self.fused_decode:
            return self.parser.parse_fused_batch(hms, tags)
        return self.parser.parse_batch(hms, tags, adjust=True,
                                       refine=True)

    def _decode_outputs(self, coarse, refined):
        """Head outputs -> (hms, tags) at the refined resolution."""
        hms = refined[..., : self.num_joints].astype(jnp.float32)
        tags = coarse[..., self.num_joints:].astype(jnp.float32)
        tags = resize_bilinear(tags, hms.shape[1:3], align_corners=True)
        return hms, tags

    def _finalize(self, grouped_i, scores_i, center, scale, hm_hw):
        """One image's parse output -> original-coordinate people."""
        people = [p for p in grouped_i if np.asarray(p).size > 0]
        hm_h, hm_w = hm_hw
        final = get_final_preds([people], center, scale, (hm_w, hm_h)) \
            if people else []
        return final, scores_i

    # ----------------------------------------------------------- public

    def predict_batch(self, images_rgb: Sequence[np.ndarray]
                      ) -> List[Tuple[List[np.ndarray], List[float]]]:
        """Batched inference over same-processing-path images; with a
        ``mesh`` the forward runs data-parallel across its devices
        (batch padded up to a multiple of the mesh's data axis).

        :returns: one ``(people, scores)`` pair per input image.
        """
        if not images_rgb:
            return []
        if self.with_flip or self.scales != (1.0,):
            # TTA composes per image; route through the single path
            return [self.predict(im) for im in images_rgb]
        pre = [self._preprocess(im) for im in images_rgb]
        # group by post-resize shape: each group runs as one batched
        # forward + one batched decode (mixed shapes are rare — the
        # 64-multiple resize buckets them — and each compiles once)
        groups = {}
        for i, (x, _, _) in enumerate(pre):
            groups.setdefault(x.shape, []).append(i)
        out: List = [None] * len(pre)
        for idxs in groups.values():
            batch = np.stack([pre[i][0] for i in idxs])
            n = len(idxs)
            fwd = self._route_fwd(n)
            if self._fwd_sharded is not None:
                d = self.mesh.shape["data"]
                padded_n = -(-n // d) * d
                if padded_n != n:
                    batch = np.concatenate(
                        [batch,
                         np.zeros((padded_n - n,) + batch.shape[1:],
                                  batch.dtype)])
                fwd = self._fwd_sharded
            coarse, refined = fwd(jnp.asarray(batch))
            hms, tags = self._decode_outputs(coarse, refined)
            grouped, scores = self._parse(hms[:n], tags[:n])
            hm_hw = (int(hms.shape[1]), int(hms.shape[2]))
            for k, i in enumerate(idxs):
                out[i] = self._finalize(grouped[k], scores[k],
                                        pre[i][1], pre[i][2], hm_hw)
        return out

    def stream(self, images_rgb):
        """Pipelined streaming inference: yields one ``(people,
        scores)`` per input frame, in order.

        The device forward of frame N+1 is dispatched *before* frame
        N's host-side decode runs (jax dispatch is asynchronous), so
        device compute and host grouping overlap — sustained throughput
        approaches ``max(forward, decode)`` instead of their sum.  TTA
        configs pipeline the same way: ``tta_forward`` is pure device
        work (flip as a doubled leading axis, per-scale dispatches,
        on-device aggregation), so its dispatch is just as asynchronous
        as the plain forward's.
        """
        use_tta = self.with_flip or self.scales != (1.0,)
        if use_tta:
            from .tta import tta_forward

        def decode(hms, tags, center, scale):
            grouped, scores = self._parse(hms, tags)
            return self._finalize(grouped[0], scores[0], center, scale,
                                  (int(hms.shape[1]), int(hms.shape[2])))

        pending = None
        for im in images_rgb:
            x_np, center, scale = self._preprocess(im)
            x = jnp.asarray(x_np[None])
            # all device ops — dispatch is asynchronous on both paths
            fwd = self._route_fwd(1)
            if use_tta:
                hms, tags = tta_forward(fwd, x, self.num_joints,
                                        self.with_flip, self.scales)
            else:
                coarse, refined = fwd(x)
                hms, tags = self._decode_outputs(coarse, refined)
            if pending is not None:
                yield decode(*pending)  # overlaps the device forward
            pending = (hms, tags, center, scale)
        if pending is not None:
            yield decode(*pending)

    def predict(self, image_rgb: np.ndarray
                ) -> Tuple[List[np.ndarray], List[float]]:
        """:param image_rgb: (H, W, 3) uint8/float RGB image.
        :returns: (people, scores) — each person (J, >=3) array with
          x, y in ORIGINAL image coordinates plus the joint score.
        """
        x_np, center, scale = self._preprocess(image_rgb)
        x = jnp.asarray(x_np[None])

        fwd = self._route_fwd(1)
        if self.with_flip or self.scales != (1.0,):
            from .tta import tta_forward
            hms, tags = tta_forward(fwd, x, self.num_joints,
                                    self.with_flip, self.scales)
        else:
            coarse, refined = fwd(x)
            hms, tags = self._decode_outputs(coarse, refined)

        grouped, scores = self._parse(hms, tags)
        return self._finalize(grouped[0], scores[0], center, scale,
                              (int(hms.shape[1]), int(hms.shape[2])))
