"""Head-padding weight transform for the EVA vision tower.

ViT-g's head width of 88 wastes MXU lanes (the unit is 128) and blocks the
transpose-free packed Pallas kernel (Mosaic can only block the lane dim at
128-multiples). This transform zero-pads each head's qkv columns 88 -> 128
and the out-projection rows to match, and folds the attention-scale
correction (sqrt(128/88)) into the q weights — producing a mathematically
IDENTICAL model whose attention runs at head_dim 128:

- padded v columns are zero -> padded output dims are zero -> the zero out
  rows ignore them;
- padded q/k columns are zero -> scores unchanged;
- the kernel scales by 128^-0.5, so q weights are pre-multiplied by
  sqrt(128/88) to preserve q @ k * 88^-0.5.

Costs +45% FLOPs on qkv/out projections and the attention matmuls
(~+15% total) in exchange for aligned lanes and no [B,S,HD]<->[B,H,S,D]
transposes; benchmarked via `bench.py --padded-heads`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hirest_tpu.config import EvaVisionConfig


def pad_vision_head_params(params: dict, cfg: EvaVisionConfig,
                           new_head: int = 128):
    """(params tree, config) -> (padded params tree, padded config)."""
    heads = cfg.num_heads
    old = cfg.head_width
    assert new_head >= old
    scale_fix = float(np.sqrt(new_head / old))

    p = params["params"] if "params" in params else params
    out = dict(p)

    def pad_cols(w, per_head_old, per_head_new, n_groups):
        """[in, n_groups*per_head_old] -> [in, n_groups*per_head_new]."""
        w = np.asarray(w)
        w = w.reshape(w.shape[0], n_groups, per_head_old)
        padded = np.zeros((w.shape[0], n_groups, per_head_new), w.dtype)
        padded[:, :, :per_head_old] = w
        return padded.reshape(w.shape[0], n_groups * per_head_new)

    def pad_vec(v, per_head_old, per_head_new, n_groups):
        v = np.asarray(v).reshape(n_groups, per_head_old)
        padded = np.zeros((n_groups, per_head_new), v.dtype)
        padded[:, :per_head_old] = v
        return padded.reshape(-1)

    for i in range(cfg.layers):
        b = dict(p[f"block_{i}"])
        attn = dict(b["attn"])

        qkv_w = np.asarray(attn["qkv"]["kernel"])  # [width, 3*heads*old]
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=1)
        q_w = pad_cols(q_w * scale_fix, old, new_head, heads)
        k_w = pad_cols(k_w, old, new_head, heads)
        v_w = pad_cols(v_w, old, new_head, heads)
        attn["qkv"] = {"kernel": np.concatenate([q_w, k_w, v_w], axis=1)}

        attn["q_bias"] = pad_vec(np.asarray(attn["q_bias"]) * scale_fix,
                                 old, new_head, heads)
        attn["v_bias"] = pad_vec(attn["v_bias"], old, new_head, heads)

        out_w = np.asarray(attn["out"]["kernel"])  # [heads*old, width]
        out_w = out_w.reshape(heads, old, -1)
        padded = np.zeros((heads, new_head, out_w.shape[-1]), out_w.dtype)
        padded[:, :old] = out_w
        attn["out"] = {"kernel": padded.reshape(heads * new_head, -1),
                       "bias": np.asarray(p[f"block_{i}"]["attn"]["out"]["bias"])}

        b["attn"] = attn
        out[f"block_{i}"] = b

    new_cfg = dataclasses.replace(cfg, head_width=new_head,
                                  heads_override=heads)
    return ({"params": out} if "params" in params else out), new_cfg
