"""Pallas fused attention for the EVA ViT hot path.

The EVA-CLIP-g vision tower runs 40 layers of attention over
[B, 16 heads, 257 tokens, 88 head-dim] — small sequences, awkward dims.
The kernel computes one (batch, head) attention in a single VMEM-resident
fusion: scores + softmax + weighted sum never round-trip to HBM
( vs. XLA materializing [B, H, S, S] score tensors between fusions).

Layout strategy: the kernel reads the UNPADDED logical shapes and Mosaic
pads the VMEM tiles internally (padding on the host would materialize +45%
HBM traffic at the ViT-g head width of 88). Callers that pad the token axis
themselves must pass `key_mask` so padded keys are excluded from the
softmax; without a mask the kernel attends to every key it is given.
All matmuls accumulate f32 on the MXU (`preferred_element_type`), softmax
in f32, output cast back.

`fused_attention` dispatches to the Pallas kernel on TPU and to a plain
XLA implementation elsewhere (CPU tests use interpret mode explicitly).
Rectangular (cross-attention) shapes — query and key/value lengths
differing, e.g. the caption decoder's [B, 12, <=48, 64] queries over 20
visual keys — are supported by both paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too, but guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch*head) slice: q [1, Sq, D], k/v [1, Sk, D] -> o [1, Sq, D].

    No key masking: every key position participates in the softmax. Use
    `_attn_kernel_masked` when the key axis carries padding."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_kernel_masked(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    """Masked variant: m [1, Sk] nonzero marks a VALID key; padded keys get
    -inf scores before the softmax (additive -1e30 in f32, matching the
    reference encoders' -10000-style additive masking semantics but exact)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    valid = m_ref[0] > 0
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = jnp.where(valid[None, :], s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pallas_attention(q, k, v, scale: float, key_mask=None,
                      interpret: bool = False):
    """q: [B, H, Sq, D], k/v: [B, H, Sk, D], key_mask: [B, Sk] or None."""
    b, h, sq, d = q.shape
    sk = k.shape[2]

    vmem = pltpu.VMEM if pltpu else None
    q_spec = pl.BlockSpec((1, 1, sq, d), lambda i, j: (i, j, 0, 0),
                          memory_space=vmem)
    kv_spec = pl.BlockSpec((1, 1, sk, d), lambda i, j: (i, j, 0, 0),
                           memory_space=vmem)
    sq_pad, sk_pad, d_pad = (_round_up(sq, 16), _round_up(sk, 16),
                             _round_up(d, 128))
    cost = pl.CostEstimate(
        flops=2 * b * h * (sq_pad * sk_pad * d_pad * 2),
        bytes_accessed=(2 * b * h * sk * d + 2 * b * h * sq * d)
        * q.dtype.itemsize,
        transcendentals=b * h * sq_pad * sk_pad,
    )

    def squeeze_lead2(kernel):
        # kernels are written for [1, S, D] refs; adapt to [1, 1, S, D]
        def wrapped(*refs):
            kernel(*[r.at[0] for r in refs])
        return wrapped

    if key_mask is None:
        kernel = functools.partial(_attn_kernel, scale=scale)
        out = pl.pallas_call(
            squeeze_lead2(kernel),
            grid=(b, h),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(q, k, v)
    else:
        kernel = functools.partial(_attn_kernel_masked, scale=scale)
        m_spec = pl.BlockSpec((1, 1, sk), lambda i, j: (i, 0, 0),
                              memory_space=vmem)
        mask3 = key_mask.astype(jnp.int32)[:, None, :]
        out = pl.pallas_call(
            squeeze_lead2(kernel),
            grid=(b, h),
            in_specs=[q_spec, kv_spec, kv_spec, m_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(q, k, v, mask3)
    return out


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        heads: int, d: int):
    """One (batch, head-group) block: refs [1, S, heads*d]; per-head
    attention computed on in-VMEM column slices (no HBM transposes)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.dot(q[:, sl], k[:, sl].T,
                    preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o_ref[0, :, sl] = jnp.dot(p, v[:, sl],
                                  preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)


def _attn_kernel_packed_masked(q_ref, k_ref, v_ref, m_ref, o_ref, *,
                               scale: float, heads: int, d: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    valid = m_ref[0] > 0
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.dot(q[:, sl], k[:, sl].T,
                    preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid[None, :], s, jnp.float32(-1e30))
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o_ref[0, :, sl] = jnp.dot(p, v[:, sl],
                                  preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)


def _pick_heads_per_block(sq: int, sk: int, d: int, num_heads: int,
                          itemsize: int) -> int:
    """Smallest head-group whose lane extent (hpb*d) is 128-aligned and
    whose VMEM block set (q/k/v/o + f32 scores, double-buffered) stays
    within the ~16 MB scoped-vmem budget. Mosaic can only block the lane
    dim at 128-multiples, so unaligned head widths (EVA's 88) force larger
    groups — up to the full row (lane extent H*D), with per-head slices
    taken in-VMEM. Measured on the EVA shapes: group size is throughput-
    neutral (190-199 fps across hpb 1..16), so fit is the only criterion."""
    budget = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit
    for hpb in range(1, num_heads + 1):
        if num_heads % hpb or (hpb * d) % 128:
            continue
        io = 2 * (2 * sk + 2 * sq) * hpb * d * itemsize  # double-buffered
        scratch = 4 * _round_up(sq, 8) * _round_up(sk, 128)  # f32 scores
        if io + scratch <= budget:
            return hpb
    # full-row fallback (lane extent H*D, per-head slices in-VMEM): check
    # FIT too, not just the caller's alignment assert — over-budget block
    # sets die deep in Mosaic with an opaque scoped-vmem error
    io = 2 * (2 * sk + 2 * sq) * num_heads * d * itemsize
    scratch = 4 * _round_up(sq, 8) * _round_up(sk, 128)
    if io + scratch > budget:
        raise ValueError(
            f"no head-group fits the ~{budget >> 20} MB scoped-VMEM budget "
            f"for sq={sq} sk={sk} d={d} H={num_heads}: pad heads to a "
            f"128-aligned width (pad_vision_head_params) or use the "
            f"[B,H,S,D] split-heads path")
    return num_heads


def _pallas_attention_packed(q, k, v, scale: float, num_heads: int,
                             key_mask=None, interpret: bool = False,
                             heads_per_block: int | None = None):
    """Packed-layout attention: q [B, Sq, H*D], k/v [B, Sk, H*D].

    Heads are sliced inside the kernel from a [1, S, hpb*D] VMEM block, so
    the [B,S,H*D] -> [B,H,S,D] transposes (two full-tensor HBM round-trips
    per layer) never materialize, and grouping heads_per_block heads per
    grid cell keeps the DMA large and the cell count small."""
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    hpb = heads_per_block or _pick_heads_per_block(sq, sk, d, num_heads,
                                                   q.dtype.itemsize)
    assert num_heads % hpb == 0, (num_heads, hpb)
    assert (hpb * d) % 128 == 0 or interpret, (
        f"packed kernel needs a 128-aligned lane extent; heads_per_block="
        f"{hpb} x head_dim={d} is not — pad heads (eva_pad) or use the "
        f"[B,H,S,D] path")
    groups = num_heads // hpb

    vmem = pltpu.VMEM if pltpu else None
    q_spec = pl.BlockSpec((1, sq, hpb * d), lambda i, j: (i, 0, j),
                          memory_space=vmem)
    kv_spec = pl.BlockSpec((1, sk, hpb * d), lambda i, j: (i, 0, j),
                           memory_space=vmem)
    sq_pad, sk_pad, d_pad = (_round_up(sq, 16), _round_up(sk, 16),
                             _round_up(d, 128))
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * (sq_pad * sk_pad * d_pad * 2),
        bytes_accessed=(2 * b * sk * hd + 2 * b * sq * hd) * q.dtype.itemsize,
        transcendentals=b * num_heads * sq_pad * sk_pad,
    )
    if key_mask is None:
        kernel = functools.partial(_attn_kernel_packed, scale=scale,
                                   heads=hpb, d=d)
        return pl.pallas_call(
            kernel,
            grid=(b, groups),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(q, k, v)
    kernel = functools.partial(_attn_kernel_packed_masked, scale=scale,
                               heads=hpb, d=d)
    m_spec = pl.BlockSpec((1, sk), lambda i, j: (i, 0), memory_space=vmem)
    return pl.pallas_call(
        kernel,
        grid=(b, groups),
        in_specs=[q_spec, kv_spec, kv_spec, m_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )(q, k, v, key_mask.astype(jnp.int32))


def _attn_kernel_qkvfused(qkv_ref, qb_ref, vb_ref, o_ref, *, scale: float,
                          heads: int, d: int):
    """One batch row of the FUSED qkv tensor: qkv_ref [1, S, 3*H*D]
    (q | k | v thirds), biases [H*D]. Slicing q/k/v and per-head columns
    happens in VMEM, so the host-side jnp.split (three full-tensor HBM
    copies per layer) and the q/v bias-add passes disappear."""
    hd = heads * d
    row = qkv_ref[0]
    # biases are added on the 128-aligned [S, H*D] thirds: Mosaic rejects
    # broadcasts at unaligned (e.g. 88-wide head) lane offsets
    q_all = row[:, :hd] + qb_ref[...][None, :]
    k_all = row[:, hd: 2 * hd]
    v_all = row[:, 2 * hd:] + vb_ref[...][None, :]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.dot(q_all[:, sl], k_all[:, sl].T,
                    preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(row.dtype)
        o_ref[0, :, sl] = jnp.dot(p, v_all[:, sl],
                                  preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)


LOG2E = 1.4426950408889634


def _mask_pad_keys(s, n_real: int):
    """Mask key positions >= n_real in a score tensor [..., S_k] to -1e30.

    Token-padded trunks (S 257 -> 264 so every per-image face is 8-sublane
    aligned and the flat<->3D reshape is a true bitcast) carry `pad` junk
    rows per image; forcing their key scores to -1e30 BEFORE the row max
    makes exp2((s - m) * c) underflow to exactly 0.0 for pad keys, so real
    tokens' outputs are bit-identical to the unpadded kernel (pad V rows
    multiply a 0 probability in the f32 accumulate).

    The iota is materialized at the score tensor's own shape: a [1, S]
    helper array crashes the TPU backend inside the Pallas custom call
    (jellyfish `Check failed: limits[i] <= dim(i) (33 vs. 1)` on the
    sublane-broadcast — reproduced on-chip 2026-08-19), while the
    full-shape lane iota lowers cleanly."""
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    return jnp.where(idx >= n_real, jnp.float32(-1e30), s)


def _attn_kernel_qkv2(qkv_ref, o_ref, *, scale: float, heads: int, d: int,
                      rows: int, n_real: int = 0):
    """Lean fused-qkv attention: qkv_ref [R, S, 3*H*D] with q/v biases
    ALREADY added (callers fold them into the qkv matmul epilogue, where
    they are free), o_ref [R, S, H*D].

    vs _attn_kernel_qkvfused: no in-kernel bias broadcasts or q/k/v
    materialization (per-head value slices only), R>=2 rows per grid cell
    (fewer cell launches), softmax via exp2 with the logit scale folded
    into the exponent multiplier, and the normalizer applied to the
    [S, D] output instead of dividing the [S, S] probability matrix."""
    hd = heads * d
    c = scale * LOG2E
    for r in range(rows):
        row = qkv_ref[r]
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = jnp.dot(row[:, sl], row[:, hd + h * d: hd + (h + 1) * d].T,
                        preferred_element_type=jnp.float32)
            if n_real:
                s = _mask_pad_keys(s, n_real)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2((s - m) * c).astype(row.dtype)
            den = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(p, row[:, 2 * hd + h * d: 2 * hd + (h + 1) * d],
                        preferred_element_type=jnp.float32)
            o_ref[r, :, sl] = (o / den).astype(o_ref.dtype)


def _attn_kernel_qkv2_quant(qkv_ref, q_ref, s_ref, acc_ref, *, scale: float,
                            heads: int, d: int, rows: int, n_real: int = 0):
    """_attn_kernel_qkv2 with the int8 quantization epilogue of
    _attn_kernel_qkvfused_quant: per-head outputs accumulate in f32 VMEM
    scratch, then one per-row dynamic int8 quantization over the full
    H*D row emits codes + scales."""
    hd = heads * d
    c = scale * LOG2E
    for r in range(rows):
        row = qkv_ref[r]
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = jnp.dot(row[:, sl], row[:, hd + h * d: hd + (h + 1) * d].T,
                        preferred_element_type=jnp.float32)
            if n_real:
                s = _mask_pad_keys(s, n_real)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2((s - m) * c).astype(row.dtype)
            den = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(p, row[:, 2 * hd + h * d: 2 * hd + (h + 1) * d],
                        preferred_element_type=jnp.float32)
            acc_ref[r, :, sl] = o / den
        y = acc_ref[r]
        sc = jnp.maximum(jnp.max(jnp.abs(y), -1, keepdims=True) / 127.0, 1e-8)
        q_ref[r] = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
        s_ref[r] = sc


def fused_attention_qkv2(qkv_biased, scale: float, num_heads: int,
                         rows_per_cell: int = 2, interpret: bool = False,
                         quant_out: bool = False, n_real: int = 0):
    """Attention over [B, S, 3*H*D] fused qkv with biases pre-added.

    The q/v biases must be added by the caller (one [3HD] broadcast add —
    XLA fuses it into the producing matmul's epilogue at zero cost).
    rows_per_cell batches grid cells to amortize per-cell launch overhead;
    B must be divisible by it (callers fall back to rows_per_cell=1)."""
    b, s, three_hd = qkv_biased.shape
    hd = three_hd // 3
    d = hd // num_heads
    if quant_out:
        # the f32 accumulation scratch joins the block set; 2 rows/cell
        # (~15 MB with double buffering) risks the ~16 MB scoped-VMEM limit
        rows_per_cell = 1
    r = rows_per_cell if b % rows_per_cell == 0 else 1

    vmem = pltpu.VMEM if pltpu else None
    qkv_spec = pl.BlockSpec((r, s, three_hd), lambda i: (i, 0, 0),
                            memory_space=vmem)
    o_spec = pl.BlockSpec((r, s, hd), lambda i: (i, 0, 0), memory_space=vmem)
    s_pad, d_pad = _round_up(s, 16), _round_up(d, 128)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * (s_pad * s_pad * d_pad * 2),
        bytes_accessed=(b * s * three_hd + b * s * hd)
        * qkv_biased.dtype.itemsize,
        transcendentals=b * num_heads * s_pad * s_pad,
    )
    if quant_out:
        assert pltpu is not None, "quant_out needs pallas TPU scratch shapes"
        s_spec = pl.BlockSpec((r, s, 1), lambda i: (i, 0, 0),
                              memory_space=vmem)
        kernel = functools.partial(_attn_kernel_qkv2_quant, scale=scale,
                                   heads=num_heads, d=d, rows=r,
                                   n_real=n_real)
        return pl.pallas_call(
            kernel,
            grid=(b // r,),
            in_specs=[qkv_spec],
            out_specs=[o_spec, s_spec],
            out_shape=[jax.ShapeDtypeStruct((b, s, hd), jnp.int8),
                       jax.ShapeDtypeStruct((b, s, 1), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((r, s, hd), jnp.float32)],
            interpret=interpret,
            cost_estimate=cost,
        )(qkv_biased)
    kernel = functools.partial(_attn_kernel_qkv2, scale=scale,
                               heads=num_heads, d=d, rows=r, n_real=n_real)
    return pl.pallas_call(
        kernel,
        grid=(b // r,),
        in_specs=[qkv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), qkv_biased.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )(qkv_biased)


def _attn_heads_batched(row, heads: int, d: int, c: float, group: int,
                        out_dtype, n_real: int = 0):
    """row [S, 3*H*D] (q/v biases pre-added) -> [S, H*D] attention output.

    The v3 restructure of the per-head loop (BENCHLOG: 16 serialized
    [S, d] head dots + per-head softmax ran ~0.8 TF/s effective): heads are
    assembled into head-major [G, S, d] operands with VMEM concatenates
    (cheap on-chip copies), then BOTH attention dots run as single batched
    dot_generals and the softmax runs ONCE over the [G, S, S] score tensor
    — one vector-op sequence over G*S sublanes instead of `heads`
    serialized [S, S] passes, and G-batched MXU issue instead of
    head-at-a-time. `group` bounds the live f32 score tensor
    (G * S * S * 4 bytes) to fit the ~16 MB scoped-VMEM budget; softmax
    normalizer is applied to the [G, S, d] output (d lanes, not S)."""
    hd = heads * d
    outs = []
    for g0 in range(0, heads, group):
        gh = min(group, heads - g0)

        def hm(base):
            return jnp.concatenate(
                [row[:, base + (g0 + h) * d: base + (g0 + h + 1) * d][None]
                 for h in range(gh)], 0)

        q, k, v = hm(0), hm(hd), hm(2 * hd)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if n_real:
            s = _mask_pad_keys(s, n_real)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * c).astype(row.dtype)
        den = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o / den)
    o = jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]  # [H, S, d]
    return jnp.concatenate([o[h] for h in range(heads)],
                           -1).astype(out_dtype)


def _attn_kernel_qkv3(qkv_ref, o_ref, *, scale: float, heads: int, d: int,
                      rows: int, group: int, n_real: int = 0):
    """3D-layout batched-heads attention: qkv_ref [R, S, 3*H*D], biases
    pre-added (same contract as _attn_kernel_qkv2)."""
    c = scale * LOG2E
    for r in range(rows):
        o_ref[r] = _attn_heads_batched(qkv_ref[r], heads, d, c, group,
                                       o_ref.dtype, n_real=n_real)


def _attn_kernel_qkv3_quant(qkv_ref, q_ref, s_ref, *, scale: float,
                            heads: int, d: int, rows: int, group: int,
                            n_real: int = 0):
    c = scale * LOG2E
    for r in range(rows):
        y = _attn_heads_batched(qkv_ref[r], heads, d, c, group, jnp.float32,
                                n_real=n_real)
        sc = jnp.maximum(jnp.max(jnp.abs(y), -1, keepdims=True) / 127.0, 1e-8)
        q_ref[r] = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
        s_ref[r] = sc


def fused_attention_qkv3(qkv_biased, scale: float, num_heads: int,
                         rows_per_cell: int = 1, head_group: int = 8,
                         interpret: bool = False, quant_out: bool = False,
                         n_real: int = 0):
    """Batched-heads attention over [B, S, 3*H*D] fused qkv with biases
    pre-added (v3 — see _attn_heads_batched for the restructure).

    head_group trades VPU batching against VMEM: the live f32 score tensor
    is [head_group, S, S] (EVA: 8*257*257*4 = 2.1 MB)."""
    b, s, three_hd = qkv_biased.shape
    hd = three_hd // 3
    d = hd // num_heads
    r = rows_per_cell if b % rows_per_cell == 0 else 1

    vmem = pltpu.VMEM if pltpu else None
    qkv_spec = pl.BlockSpec((r, s, three_hd), lambda i: (i, 0, 0),
                            memory_space=vmem)
    o_spec = pl.BlockSpec((r, s, hd), lambda i: (i, 0, 0), memory_space=vmem)
    s_pad, d_pad = _round_up(s, 16), _round_up(d, 128)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * (s_pad * s_pad * d_pad * 2),
        bytes_accessed=(b * s * three_hd + b * s * hd)
        * qkv_biased.dtype.itemsize,
        transcendentals=b * num_heads * s_pad * s_pad,
    )
    if quant_out:
        s_spec = pl.BlockSpec((r, s, 1), lambda i: (i, 0, 0),
                              memory_space=vmem)
        kernel = functools.partial(_attn_kernel_qkv3_quant, scale=scale,
                                   heads=num_heads, d=d, rows=r,
                                   group=head_group, n_real=n_real)
        return pl.pallas_call(
            kernel,
            grid=(b // r,),
            in_specs=[qkv_spec],
            out_specs=[o_spec, s_spec],
            out_shape=[jax.ShapeDtypeStruct((b, s, hd), jnp.int8),
                       jax.ShapeDtypeStruct((b, s, 1), jnp.float32)],
            interpret=interpret,
            cost_estimate=cost,
        )(qkv_biased)
    kernel = functools.partial(_attn_kernel_qkv3, scale=scale,
                               heads=num_heads, d=d, rows=r,
                               group=head_group, n_real=n_real)
    return pl.pallas_call(
        kernel,
        grid=(b // r,),
        in_specs=[qkv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), qkv_biased.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )(qkv_biased)


def _attn_kernel_qkvfused_quant(qkv_ref, qb_ref, vb_ref, q_ref, s_ref,
                                acc_ref, *, scale: float, heads: int, d: int):
    """fused-qkv attention with an int8 quantization epilogue: per-head
    outputs accumulate in an f32 VMEM scratch, then one per-row dynamic
    int8 quantization (scale over the full H*D row, matching
    eva_scan._dyn_quant_rows) writes q int8 + s f32 — the attention output
    never round-trips to HBM in bf16."""
    hd = heads * d
    row = qkv_ref[0]
    q_all = row[:, :hd] + qb_ref[...][None, :]
    k_all = row[:, hd: 2 * hd]
    v_all = row[:, 2 * hd:] + vb_ref[...][None, :]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.dot(q_all[:, sl], k_all[:, sl].T,
                    preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(row.dtype)
        acc_ref[:, sl] = jnp.dot(p, v_all[:, sl],
                                 preferred_element_type=jnp.float32)
    y = acc_ref[...]
    sc = jnp.maximum(jnp.max(jnp.abs(y), -1, keepdims=True) / 127.0, 1e-8)
    q_ref[0] = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
    s_ref[0] = sc


def fused_attention_qkv(qkv, q_bias, v_bias, scale: float, num_heads: int,
                        use_pallas: bool = True, interpret: bool = False,
                        quant_out: bool = False):
    """Self-attention straight off the fused qkv projection output:
    qkv [B, S, 3*H*D] (thirds q|k|v), q_bias/v_bias [H*D] (EVA's q/v-only
    bias quirk, zeros elsewhere) -> [B, S, H*D].

    The whole row lives in one VMEM block per grid cell, so no split
    copies, no bias-add passes, and one operand for the custom call
    (fewer layout constraints on the producing matmul)."""
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads

    assert not (quant_out and not use_pallas), \
        "quant_out is a Pallas-kernel epilogue (use interpret=True on CPU)"
    if not use_pallas:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias
        v = v + v_bias
        return fused_attention_packed(q, k, v, scale, num_heads,
                                      use_pallas=False)

    vmem = pltpu.VMEM if pltpu else None
    qkv_spec = pl.BlockSpec((1, s, three_hd), lambda i: (i, 0, 0),
                            memory_space=vmem)
    bias_spec = pl.BlockSpec((hd,), lambda i: (0,), memory_space=vmem)
    o_spec = pl.BlockSpec((1, s, hd), lambda i: (i, 0, 0), memory_space=vmem)
    s_pad, d_pad = _round_up(s, 16), _round_up(d, 128)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * (s_pad * s_pad * d_pad * 2),
        bytes_accessed=(b * s * three_hd + b * s * hd) * qkv.dtype.itemsize,
        transcendentals=b * num_heads * s_pad * s_pad,
    )
    if quant_out:
        s_spec = pl.BlockSpec((1, s, 1), lambda i: (i, 0, 0),
                              memory_space=vmem)
        kernel = functools.partial(_attn_kernel_qkvfused_quant, scale=scale,
                                   heads=num_heads, d=d)
        assert pltpu is not None, "quant_out needs pallas TPU scratch shapes"
        scratch = [pltpu.VMEM((s, hd), jnp.float32)]
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[qkv_spec, bias_spec, bias_spec],
            out_specs=[o_spec, s_spec],
            out_shape=[jax.ShapeDtypeStruct((b, s, hd), jnp.int8),
                       jax.ShapeDtypeStruct((b, s, 1), jnp.float32)],
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=cost,
        )(qkv, q_bias.astype(qkv.dtype), v_bias.astype(qkv.dtype))
    kernel = functools.partial(_attn_kernel_qkvfused, scale=scale,
                               heads=num_heads, d=d)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[qkv_spec, bias_spec, bias_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )(qkv, q_bias.astype(qkv.dtype), v_bias.astype(qkv.dtype))


def fused_attention_flat(qkv2d, scale: float, num_heads: int, seq_len: int,
                         q_bias=None, v_bias=None, rows_per_cell: int = 1,
                         interpret: bool = False, quant_out: bool = False,
                         head_group: int = 0, n_real: int = 0):
    """Self-attention over the FLAT trunk layout: qkv2d [B*S, 3*H*D] with
    per-batch token blocks contiguous along rows (x was reshaped from
    [B, S, C] — a bitcast).

    Why flat: a 2D dot emits a plain {1,0}-layout result, so the qkv
    projection never pays the 3D batch-in-sublanes layout negotiation that
    costs the [B, S, C] path ~13%% MFU on the qkv matmul (see BENCHLOG
    round-2 device profile).

    The attention itself runs through the 3D kernels on a [B, S, 3HD]
    reshape of the flat operand. The reshape is a bitcast ({1,0} 2D and
    {2,1,0} 3D are the same dense bytes), so the producing matmul keeps
    its 2D layout; the earlier dedicated 2D-block kernels were REJECTED by
    the Mosaic TPU lowering on real hardware (block rows 257/514 of a
    32896-row array violate the 8-sublane divisibility rule — discovered
    on-chip 2026-08-18; CPU interpret mode does not enforce tiling), while
    the 3D kernels' [1, 257, C] blocks are legal because their block S
    equals the array S.

    With q_bias/v_bias given, biases are added in-kernel (classic softmax);
    with both None the caller must pre-add them (folded into the qkv dot
    epilogue) and the lean exp2 kernel runs. head_group > 0 selects the v3
    batched-heads kernel (_attn_heads_batched) with that many heads per
    batched dot — requires pre-added biases."""
    m, three_hd = qkv2d.shape
    hd = three_hd // 3
    b = m // seq_len
    qkv3d = qkv2d.reshape(b, seq_len, three_hd)
    if q_bias is None and v_bias is None:
        if head_group:
            out = fused_attention_qkv3(qkv3d, scale, num_heads,
                                       rows_per_cell=rows_per_cell,
                                       head_group=head_group,
                                       interpret=interpret,
                                       quant_out=quant_out, n_real=n_real)
        else:
            out = fused_attention_qkv2(qkv3d, scale, num_heads,
                                       rows_per_cell=rows_per_cell,
                                       interpret=interpret,
                                       quant_out=quant_out, n_real=n_real)
        if quant_out:
            q8, s8 = out
            return q8.reshape(m, hd), s8.reshape(m, 1)
        return out.reshape(m, hd)
    assert not quant_out, "quant_out requires pre-added biases (lean path)"
    assert not head_group, "head_group (v3) requires pre-added biases"
    assert not n_real, "n_real (token padding) requires the lean kernels"
    assert q_bias is not None and v_bias is not None
    out = fused_attention_qkv(qkv3d, q_bias, v_bias, scale, num_heads,
                              interpret=interpret)
    return out.reshape(m, hd)



def fused_attention_packed(q, k, v, scale: float, num_heads: int,
                           key_mask=None, use_pallas: bool = True,
                           interpret: bool = False,
                           heads_per_block: int | None = None):
    """Attention over packed [B, S, H*D] tensors (no head transpose).

    key_mask: optional [B, Sk]; nonzero marks a valid key."""
    if use_pallas:
        return _pallas_attention_packed(q, k, v, scale, num_heads,
                                        key_mask=key_mask, interpret=interpret,
                                        heads_per_block=heads_per_block)
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads

    def split(x, s):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    out = _xla_attention(split(q, sq), split(k, sk), split(v, sk), scale,
                         key_mask=key_mask)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, hd)


def _xla_attention(q, k, v, scale: float, key_mask=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if key_mask is not None:
        s = jnp.where((key_mask > 0)[:, None, None, :], s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def fused_attention(q, k, v, scale: float, key_mask=None,
                    use_pallas: bool = True, interpret: bool = False):
    """Attention over [B, H, Sq, D] queries and [B, H, Sk, D] keys/values.

    key_mask: optional [B, Sk]; nonzero marks a valid key (padded keys are
    excluded from the softmax). use_pallas selects the VMEM-fused kernel
    (TPU); otherwise plain XLA.
    """
    if use_pallas:
        return _pallas_attention(q, k, v, scale, key_mask=key_mask,
                                 interpret=interpret)
    return _xla_attention(q, k, v, scale, key_mask=key_mask)
