"""Iterative moment-segmentation inference.

Parity with reference modeling.py:353-474 (`test_moment_segmentation`):
up to `max_iterations` rounds of (TPU scoring forward -> host-side greedy
peak expansion -> mask update), then the reference's exact post-processing
(sort, flatten, clip to the moment end, dedup, enforce >= 5-frame gaps).

The scoring forward (trunk + segment head + softmax) is a jitted TPU
program; the expansion is O(max_iter * T) scalar work that stays on host —
a data-dependent while-walk that would only pessimize a compiled kernel.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def postprocess_boundaries(pairs_per_row, starts, lasts) -> list[list[int]]:
    """The reference's exact boundary post-processing (modeling.py:435-464):
    prepend [start,start], append [last,last], sort by segment start,
    flatten, pop trailing bounds beyond the moment end, dedup, and keep only
    boundaries >= 5 frames apart (the final element is excluded from the
    min-gap loop — reference behavior)."""
    results: list[list[int]] = []
    for i, pairs in enumerate(pairs_per_row):
        preds = [[starts[i], starts[i]]] + [list(p) for p in pairs]
        preds.append([lasts[i], lasts[i]])
        preds.sort(key=lambda x: x[0])

        flat: list[int] = []
        for x in preds:
            flat.extend(x)
        while flat and flat[-1] > lasts[i]:
            flat.pop(-1)
        flat = sorted(set(flat))

        kept = [flat[0]]
        current = flat[0]
        for j in range(1, len(flat) - 1):
            if flat[j] - current >= 5:
                kept.append(flat[j])
                current = flat[j]
        results.append(kept)
    return results


def iterative_segmentation(
    score_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    moment_bound_frames: np.ndarray,
    n_frames: int,
    percent_threshold: float = 0.50,
    max_iterations: int = 20,
) -> list[list[int]]:
    """Run the iterative boundary decoding loop.

    Args:
      score_fn: (moment_mask [B,T] int32, prev_boundary_mask [B,T] int32)
        -> softmax scores [B,T] float (already moment-masked + softmaxed,
        matching modeling.py:393-395).
      moment_bound_frames: [B, 2] int array of (start, end) frame indices.
      n_frames: T, the padded/bucketed frame count.
      percent_threshold: --moment_segmentation_difference_threshold.
      max_iterations: --moment_segmentation_max_iterations.

    Returns:
      Per-instance sorted boundary frame lists (the reference's
      `step_predictions`, post-processed).
    """
    bounds = np.asarray(moment_bound_frames)
    b = bounds.shape[0]
    starts = bounds[:, 0].tolist()
    lasts = bounds[:, 1].tolist()

    moment_mask = np.zeros((b, n_frames), dtype=np.int32)
    prev_boundary_mask = np.zeros((b, n_frames), dtype=np.int32)
    for i in range(b):
        moment_mask[i, starts[i]: lasts[i] + 1] = 1
        prev_boundary_mask[i, starts[i]] = 1

    step_predictions: list[list[list[int]]] = [[] for _ in starts]

    for _ in range(max_iterations):
        scores_batch = np.asarray(score_fn(moment_mask, prev_boundary_mask))
        max_frame_idxs = scores_batch.argmax(axis=1)

        for i in range(b):
            scores = scores_batch[i].tolist()
            max_idx = int(max_frame_idxs[i])
            max_score = scores[max_idx]
            if max_score < 0.00001:
                continue

            left_bound = max_idx
            right_bound = max_idx
            while (scores[left_bound] / max_score) > percent_threshold:
                if left_bound == 0:
                    break
                left_bound -= 1
            while (scores[right_bound] / max_score) > percent_threshold:
                if right_bound == (len(scores) - 1):
                    break
                right_bound += 1

            if left_bound == 0 or right_bound == 0:
                continue

            moment_mask[i, left_bound: right_bound + 1] = 0
            prev_boundary_mask[i, left_bound] = 1
            prev_boundary_mask[i, right_bound] = 1
            step_predictions[i].append([left_bound, right_bound])

    return postprocess_boundaries(step_predictions, starts, lasts)


def iterative_segmentation_scan(
    score_fn_traceable: Callable,
    moment_bound_frames: np.ndarray,
    n_frames: int,
    percent_threshold: float = 0.50,
    max_iterations: int = 20,
) -> list[list[int]]:
    """Fully-jitted variant: the whole (forward -> peak -> expansion -> mask
    update) x max_iterations loop runs as ONE lax.scan program on device —
    one dispatch instead of `max_iterations` host round trips (which cost
    seconds each over a tunneled chip).

    `score_fn_traceable(moment_mask, prev_boundary_mask) -> softmax scores
    [B, T]` must be jax-traceable. The greedy expansion walk is vectorized:
    walking down (up) from the argmax until the score ratio drops is exactly
    "the nearest index at-or-below (at-or-above) the peak whose ratio <=
    threshold", computed with masked max/min over an iota. Semantics match
    the host loop (same skip conditions, same one-frame overshoot into
    masked territory); the only difference is f32 ratio arithmetic instead
    of the host's float64.
    """
    import jax
    import jax.numpy as jnp

    bounds = np.asarray(moment_bound_frames)
    b = bounds.shape[0]
    starts = bounds[:, 0]
    lasts = bounds[:, 1]

    idx = np.arange(n_frames)[None, :]
    mm0 = jnp.asarray(((idx >= starts[:, None]) & (idx <= lasts[:, None]))
                      .astype(np.int32))
    pbm0 = jnp.asarray((idx == starts[:, None]).astype(np.int32))

    def body(carry, _):
        mm, pbm = carry
        scores = score_fn_traceable(mm, pbm)          # [B, T] softmax
        max_idx = jnp.argmax(scores, axis=1)          # [B]
        max_score = jnp.take_along_axis(scores, max_idx[:, None], 1)[:, 0]
        ratio = scores / jnp.maximum(max_score[:, None], 1e-30)
        ids = jnp.arange(n_frames)[None, :]
        not_ok = ratio <= percent_threshold

        below = not_ok & (ids <= max_idx[:, None])
        left = jnp.max(jnp.where(below, ids, -1), axis=1)
        left = jnp.maximum(left, 0)                   # walked to 0 while ok
        above = not_ok & (ids >= max_idx[:, None])
        right = jnp.min(jnp.where(above, ids, n_frames), axis=1)
        right = jnp.minimum(right, n_frames - 1)

        skip = (max_score < 0.00001) | (left == 0) | (right == 0)
        upd = ~skip

        in_seg = (ids >= left[:, None]) & (ids <= right[:, None])
        mm = jnp.where(upd[:, None] & in_seg, 0, mm)
        is_edge = (ids == left[:, None]) | (ids == right[:, None])
        pbm = jnp.where(upd[:, None] & is_edge, 1, pbm)

        pair = jnp.stack([left, right], axis=1)       # [B, 2]
        return (mm, pbm), (pair, upd)

    (_, _), (pairs, valid) = jax.lax.scan(body, (mm0, pbm0),
                                          jnp.arange(max_iterations))
    pairs = np.asarray(pairs)   # [iter, B, 2]
    valid = np.asarray(valid)   # [iter, B]

    per_row = [[pairs[t, i].tolist() for t in range(max_iterations)
                if valid[t, i]] for i in range(b)]
    return postprocess_boundaries(per_row, starts.tolist(), lasts.tolist())
