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

    step_predictions: list[list[list[int]]] = [[[s, s]] for s in starts]

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

    # Post-processing: parity with modeling.py:435-464
    results: list[list[int]] = []
    for i in range(b):
        preds = step_predictions[i]
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
            nxt = flat[j]
            if nxt - current >= 5:
                kept.append(nxt)
                current = nxt
        results.append(kept)

    return results
