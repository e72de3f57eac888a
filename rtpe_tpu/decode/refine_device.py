"""Device-side quarter-pixel adjust + tag-guided refine.

The reference does both steps as python loops over full-resolution
heatmaps on the host (``group.py:181-264``), which forces a
device->host transfer of the complete det/tag tensors (tens of MB at
eval resolution) before decoding can finish.  Here both steps run as
one jitted program over a fixed-size people tensor; only the grouped
people (30 × J × (3+D) floats) cross the host boundary.

Semantics are kept bit-compatible with the host implementations in
``parser.py`` (which are themselves reference-exact); the parity test
asserts equality.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _adjust_people(det: jax.Array, people: jax.Array) -> jax.Array:
    """Quarter-pixel adjust of one image's (P, J, 3+D) people against
    its (H, W, J) heatmaps (reference ``group.py:181-200``)."""
    h, w, j = det.shape

    def adjust_person(person):
        xs = person[:, 0]
        ys = person[:, 1]
        vis = person[:, 2] > 0
        xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
        jj = jnp.arange(j)

        def read(yy, xx):
            return det[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1), jj]

        right = read(yi, jnp.minimum(xi + 1, w - 1))
        left = read(yi, jnp.maximum(xi - 1, 0))
        down = read(jnp.minimum(yi + 1, h - 1), xi)
        up = read(jnp.maximum(yi - 1, 0), xi)
        new_x = jnp.where(right > left, xs + 0.25, xs - 0.25) + 0.5
        new_y = jnp.where(down > up, ys + 0.25, ys - 0.25) + 0.5
        person = person.at[:, 0].set(jnp.where(vis, new_x, person[:, 0]))
        person = person.at[:, 1].set(jnp.where(vis, new_y, person[:, 1]))
        return person

    return jax.vmap(adjust_person)(people)


@partial(jax.jit, static_argnames=())
def adjust_refine_device(det: jax.Array, tag: jax.Array,
                         people: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """:param det: (H, W, J) heatmaps (fp32).
    :param tag: (H, W, J, D) tag maps.
    :param people: (P, J, 3 + D) grouped joints, padded with zero rows
      (a person with no joint having score > 0 is inert).
    :returns: (adjusted+refined people (P, J, 3+D), per-person scores
      computed after adjust but before refine — reference parse order,
      ``group.py:266-287``).
    """
    det = det.astype(jnp.float32)
    tag = tag.astype(jnp.float32)

    people = _adjust_people(det, people)
    scores = jnp.mean(people[:, :, 2], axis=1)

    people = _refine_people_vectorized(det, tag, people)
    return people, scores


@partial(jax.jit, static_argnames=("cap",))
def adjust_refine_batch(det: jax.Array, tag: jax.Array,
                        people: jax.Array, n_people: jax.Array,
                        cap: int = 32) -> Tuple[jax.Array, jax.Array]:
    """Batched adjust + scores + SLOT-CAPPED refine.

    The refine's tag-penalty argmax streams a (P, J, H·W) score per
    image — at the P=90 ``p_max`` envelope that is ~45% of the whole
    batched fused-decode cost, yet grouping allocates people slots
    SEQUENTIALLY (matched rows go to columns < n, new persons append
    at n), so every occupied slot sits in ``[0, n_people)``.  When the
    batch-wide max occupancy fits ``cap`` slots — every real scene;
    the reference's own ``max_num_people`` is 30 — a ``lax.cond``
    branch refines only ``people[:, :cap]`` (P/cap ≈ 2.8× less refine
    compute); the full-envelope branch stays reachable for
    adversarial crowds, chosen at runtime by one scalar.

    :param det: (B, H, W, J) heatmaps; tag: (B, H, W, J, D).
    :param people: (B, P, J, 3+D) grouped people; n_people: (B,) i32.
    :returns: (people (B, P, J, 3+D), scores (B, P)).
    """
    det = det.astype(jnp.float32)
    tag = tag.astype(jnp.float32)

    people = jax.vmap(_adjust_people)(det, people)
    scores = jnp.mean(people[:, :, :, 2], axis=2)

    p_slots = people.shape[1]
    if 0 < cap < p_slots:
        def refine_capped(pp):
            head = jax.vmap(_refine_people_vectorized)(
                det, tag, pp[:, :cap])
            return jnp.concatenate([head, pp[:, cap:]], axis=1)

        def refine_full(pp):
            return jax.vmap(_refine_people_vectorized)(det, tag, pp)

        people = jax.lax.cond(jnp.max(n_people) <= cap,
                              refine_capped, refine_full, people)
    else:
        people = jax.vmap(_refine_people_vectorized)(det, tag, people)
    return people, scores


def _refine_people_vectorized(det: jax.Array, tag: jax.Array,
                              people: jax.Array) -> jax.Array:
    """Tag-guided refine of ALL people slots in one pass.

    The per-person form (:func:`_make_refine_person` under
    ``lax.map``) streams the full (H, W, J) det and tag planes once
    PER SLOT — ~P x the minimal HBM traffic, and the measured
    dominant cost of the fused decode.  Here the tag-penalty argmax
    is one reduction over the planes with the people axis in the
    fused producer: score[p, j, hw] = det - round(||tag - mean_p||),
    reduced over hw.  XLA fuses the broadcast into the reduce, so det
    and tag are read once per people-tile instead of once per person.

    Semantics are element-identical to the per-person form (same
    first-occurrence argmax, same fill condition); asserted in
    ``tests/test_decode.py``.
    """
    h, w, j = det.shape
    d = tag.shape[-1]
    p_slots = people.shape[0]

    vis = people[:, :, 2] > 0                                # (P, J)
    n_vis = jnp.sum(vis.astype(jnp.int32), axis=1)           # (P,)
    xi = jnp.clip(people[:, :, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(people[:, :, 1].astype(jnp.int32), 0, h - 1)
    jj = jnp.arange(j)
    joint_tags = tag[yi, xi, jj[None, :]]                    # (P, J, D)
    prev_tag = (jnp.sum(jnp.where(vis[..., None], joint_tags, 0.0),
                        axis=1)
                / jnp.maximum(n_vis, 1)[:, None].astype(jnp.float32))

    # (P, J, H*W) score, argmax over the plane per (person, joint).
    tag_pj = jnp.transpose(tag, (2, 0, 1, 3))                # (J, H, W, D)
    det_pj = jnp.transpose(det, (2, 0, 1))                   # (J, H, W)

    def person_scores(prev):                                 # (D,) ->
        tt = jnp.sqrt(jnp.sum(
            (tag_pj - prev[None, None, None, :]) ** 2, axis=-1))
        return (det_pj - jnp.round(tt)).reshape(j, h * w)

    score = jax.vmap(person_scores)(prev_tag)                # (P, J, HW)
    idx = jnp.argmax(score, axis=-1)                         # (P, J)
    ry = idx // w
    rx = idx % w
    jj2 = jnp.broadcast_to(jj[None, :], (p_slots, j))
    val = det[ry, rx, jj2]
    right = det[ry, jnp.minimum(rx + 1, w - 1), jj2]
    left = det[ry, jnp.maximum(rx - 1, 0), jj2]
    down = det[jnp.minimum(ry + 1, h - 1), rx, jj2]
    up = det[jnp.maximum(ry - 1, 0), rx, jj2]
    fx = rx + 0.5 + jnp.where(right > left, 0.25, -0.25)
    fy = ry + 0.5 + jnp.where(down > up, 0.25, -0.25)

    fill = (val > 0) & (people[:, :, 2] == 0) & (n_vis[:, None] > 0)
    out = people.at[:, :, 0].set(jnp.where(fill, fx, people[:, :, 0]))
    out = out.at[:, :, 1].set(jnp.where(fill, fy, out[:, :, 1]))
    out = out.at[:, :, 2].set(jnp.where(fill, val, out[:, :, 2]))
    return out


def _make_refine_person(det: jax.Array, tag: jax.Array):
    """Per-person tag-guided refine closure over one image's (H, W, J)
    det and (H, W, J, D) tag (reference ``group.py:202-264``)."""
    h, w, j = det.shape

    def refine_person(person):
        vis = person[:, 2] > 0
        n_vis = jnp.sum(vis.astype(jnp.int32))
        xi = jnp.clip(person[:, 0].astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(person[:, 1].astype(jnp.int32), 0, h - 1)
        jj = jnp.arange(j)
        joint_tags = tag[yi, xi, jj]  # (J, D)
        prev_tag = (jnp.sum(jnp.where(vis[:, None], joint_tags, 0.0),
                            axis=0)
                    / jnp.maximum(n_vis, 1).astype(jnp.float32))

        # tag-distance penalty per joint plane
        tt = jnp.sqrt(jnp.sum(
            (tag - prev_tag[None, None, None, :]) ** 2, axis=-1))
        tmp2 = det - jnp.round(tt)  # (H, W, J)
        flat = tmp2.transpose(2, 0, 1).reshape(j, h * w)
        idx = jnp.argmax(flat, axis=-1)
        ry = idx // w
        rx = idx % w
        val = det[ry, rx, jj]
        # quarter offsets around the argmax
        right = det[ry, jnp.minimum(rx + 1, w - 1), jj]
        left = det[ry, jnp.maximum(rx - 1, 0), jj]
        down = det[jnp.minimum(ry + 1, h - 1), rx, jj]
        up = det[jnp.maximum(ry - 1, 0), rx, jj]
        fx = rx + 0.5 + jnp.where(right > left, 0.25, -0.25)
        fy = ry + 0.5 + jnp.where(down > up, 0.25, -0.25)

        fill = (val > 0) & (person[:, 2] == 0) & (n_vis > 0)
        person = person.at[:, 0].set(jnp.where(fill, fx, person[:, 0]))
        person = person.at[:, 1].set(jnp.where(fill, fy, person[:, 1]))
        person = person.at[:, 2].set(jnp.where(fill, val, person[:, 2]))
        return person

    return refine_person


@jax.jit
def refine_batch_device(det: jax.Array, tag: jax.Array,
                        people: jax.Array) -> jax.Array:
    """Tag-guided refine of a whole batch in ONE device program.

    :param det: (B, H, W, J) fp32 heatmaps.
    :param tag: (B, H, W, J, D) tag maps.
    :param people: (B, P, J, 3 + D) grouped (already adjusted) people,
      zero-padded along P (padded rows are inert: no visible joint).
    :returns: refined people, same shape.
    """
    det = det.astype(jnp.float32)
    tag = tag.astype(jnp.float32)
    return jax.vmap(_refine_people_vectorized)(det, tag, people)
