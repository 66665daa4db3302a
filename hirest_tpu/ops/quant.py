"""Weight-only-calibrated int8 matmul path for the frozen towers.

v5e's MXU has 2x int8 peak vs bf16. For the frozen EVA encoder (a feature
extractor, no training), the MLP up/down projections — ~2/3 of the FLOPs —
can run as int8 x int8 -> int32 with per-channel weight scales and dynamic
per-row activation scales. Attention stays bf16 (small fraction of FLOPs,
higher sensitivity).

This is an opt-in throughput mode (`quantize="int8"` on the tower /
`--int8` on the bench); parity-sensitive paths default to bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # importable on CPU too, but guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def quantize_weight(w):
    """[in, out] float weight -> (int8 weight, [out] float scales).

    Computed host-side in NumPy: doing this with jnp ops would dispatch one
    device program per weight matrix (~80 for the EVA tower) at build time.
    """
    import numpy as np

    w = np.asarray(w, dtype=np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=0) / 127.0, 1e-8)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bias: jnp.ndarray | None = None, out_dtype=jnp.bfloat16):
    """x [..., in] float -> [..., out], computed int8 x int8 -> int32 on the
    MXU with dynamic per-row activation quantization."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-8)
    x_q = jnp.clip(jnp.round(x2 / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * x_scale * w_scale[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype).reshape(shape[:-1] + (w_q.shape[1],))


# --- fused rowwise quantization kernels (Pallas) -------------------------
#
# The int8 scan path (models/eva_scan.py) quantizes activations at four
# sites per layer. Left to XLA, each site costs a reduce pass (row max) plus
# a map pass (round/clip/store) over the full activation — ~+50 ms/call of
# pure bandwidth on the EVA trunk (BENCHLOG.md int8 profile). These kernels
# fuse the producer op (LayerNorm / exact-erf GELU) with the row-scale
# reduction and the int8 store into ONE VMEM-resident pass: the activation
# is read once from HBM and written once as int8 (half the bytes).


# one VMEM sizing model for every row-quant/LN kernel in this module:
# f32 temp + double-buffered bf16 in / int8 out must fit the ~16 MB
# scoped-VMEM budget (headroom for regalloc)
VMEM_BUDGET = 10 * 1024 * 1024


def _bytes_per_row(c: int) -> int:
    return c * (4 + 2 * 2 + 2 * 1) + 8  # f32 temp, 2x bf16 in, 2x int8 out


def _pick_row_block(seq: int, c: int, budget: int = VMEM_BUDGET) -> int:
    """Rows per grid cell. Prefers the full sequence per cell (a block dim
    equal to the array dim is always legal, so S=257 needs no ragged tail);
    otherwise the largest 32-row multiple (int8 store tile) under budget."""
    per_row = _bytes_per_row(c)
    if seq * per_row <= budget:
        return seq
    return max(32, (budget // per_row // 32) * 32)


def _row_specs_flat(m: int, c: int, row_block: int | None):
    """Specs for the flat [M, C] trunk layout. row_block (the per-batch
    token count, from the caller) is scaled to the largest multiple that
    fits the VMEM budget so blocks divide M exactly; without it, a
    32-multiple block with a ragged cdiv tail is used."""
    if (row_block and m % row_block == 0
            and row_block * _bytes_per_row(c) <= VMEM_BUDGET):
        br = row_block * max(1, VMEM_BUDGET // _bytes_per_row(c) // row_block)
        while m % br:
            br -= row_block
        if br % 8 and br != m:
            # Mosaic's sublane rule: a block's second-minor dim must be
            # 8-divisible or equal to the array dim. An odd per-batch token
            # count (EVA's 257) can only satisfy it at lcm(row_block, 8)
            # rows — over budget at trunk widths — so fall through to the
            # ragged 32-multiple path (rows are independent; the cdiv tail
            # is masked by pallas). Discovered on-chip 2026-08-18: the
            # exact-division path emitted 514-row blocks that the TPU
            # lowering rejected while CPU interpret mode accepted them.
            br = _pick_row_block(m, c)
    else:
        # row_block absent, non-dividing, or itself over the VMEM budget
        # (e.g. 257 rows x 6144 cols at the post-fc1 act_quant site):
        # independent rows make a ragged 32-multiple tail correct
        br = _pick_row_block(m, c)
    vmem = pltpu.VMEM if pltpu else None
    x_spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=vmem)
    s_spec = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=vmem)
    return (pl.cdiv(m, br),), x_spec, s_spec, vmem


def _ln_quant_kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[...][None, :]
         + b_ref[...][None, :])
    s = jnp.maximum(jnp.max(jnp.abs(y), -1, keepdims=True) / 127.0, 1e-8)
    q_ref[...] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


def _act_quant_kernel(x_ref, q_ref, s_ref, *, act: str):
    y = x_ref[...].astype(jnp.float32)
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "gelu_poly":
        from hirest_tpu.models.layers import gelu_bf16_poly
        y = gelu_bf16_poly(y)
    s = jnp.maximum(jnp.max(jnp.abs(y), -1, keepdims=True) / 127.0, 1e-8)
    q_ref[...] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


def ln_quant(x, g, b, eps: float, *, interpret: bool = False,
             row_block: int | None = None):
    """LayerNorm + dynamic per-row int8 quantization in one pass.

    x [B, S, C] or flat [M, C] (bf16/f32), g/b [C] -> (q int8, s f32
    [..., 1]) with q*s ~= LN(x). The LN result never round-trips through
    bf16 (the unfused path casts to bf16 between LN and quantization), so
    this is numerically at least as faithful as _ln + _dyn_quant_rows.
    For flat inputs pass row_block (per-batch token count) so blocks
    divide M exactly. 3D inputs collapse to the flat layout via a reshape
    round-trip (bitcast at the jit level), blocked per batch row.
    """
    if x.ndim == 3:
        bsz, seq, c = x.shape
        q, s = ln_quant(x.reshape(bsz * seq, c), g, b, eps,
                        interpret=interpret, row_block=row_block or seq)
        return q.reshape(x.shape), s.reshape(bsz, seq, 1)
    m, c = x.shape
    grid, x_spec, s_spec, vmem = _row_specs_flat(m, c, row_block)
    g_spec = pl.BlockSpec((c,), lambda i: (0,), memory_space=vmem)
    return pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=grid,
        in_specs=[x_spec, g_spec, g_spec],
        out_specs=[x_spec, s_spec],
        out_shape=[jax.ShapeDtypeStruct((m, c), jnp.int8),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(x, g.astype(jnp.float32), b.astype(jnp.float32))


def act_quant(x, *, act: str = "none", interpret: bool = False,
              row_block: int | None = None):
    """Optional activation (exact-erf gelu) + per-row int8 quantization.

    x [B, S, C] or flat [M, C] -> (q int8, s f32 [..., 1]), q*s ~= act(x).
    3D inputs collapse to the flat layout (see ln_quant)."""
    if x.ndim == 3:
        bsz, seq, c = x.shape
        q, s = act_quant(x.reshape(bsz * seq, c), act=act,
                         interpret=interpret, row_block=row_block or seq)
        return q.reshape(x.shape), s.reshape(bsz, seq, 1)
    m, c = x.shape
    grid, x_spec, s_spec, _ = _row_specs_flat(m, c, row_block)
    return pl.pallas_call(
        functools.partial(_act_quant_kernel, act=act),
        grid=grid,
        in_specs=[x_spec],
        out_specs=[x_spec, s_spec],
        out_shape=[jax.ShapeDtypeStruct((m, c), jnp.int8),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(x)


# --- fused bf16 LayerNorm (no quantization) ------------------------------
#
# The bf16 trunk's fenced LayerNorms are XLA fusions that read the
# activation twice (reduce pass + normalize pass) and write once. This
# kernel is the one-read-one-write version for the flat [M, C] layout:
# worth ~1/3 of the LN bandwidth per site (2 sites x 40 layers). Like the
# quant kernels it also acts as a fusion boundary, so callers drop the
# explicit optimization_barrier at sites where it runs.


def _ln_kernel_flat(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[...][None, :]
         + b_ref[...][None, :])
    y_ref[...] = y.astype(y_ref.dtype)


def ln_bf16(x, g, b, eps: float, *, interpret: bool = False,
            row_block: int | None = None):
    """LayerNorm over flat [M, C] rows in one VMEM pass, output in x.dtype.

    Matches eva_scan._ln numerics exactly (f32 mean/var/rsqrt, cast at the
    end). row_block as in ln_quant. 3D inputs are handled by a reshape
    round-trip (bitcast at the jit level)."""
    if x.ndim == 3:
        bsz, seq, c = x.shape
        return ln_bf16(x.reshape(bsz * seq, c), g, b, eps,
                       interpret=interpret,
                       row_block=row_block or seq).reshape(x.shape)
    m, c = x.shape
    grid, x_spec, _, vmem = _row_specs_flat(m, c, row_block)
    g_spec = pl.BlockSpec((c,), lambda i: (0,), memory_space=vmem)
    return pl.pallas_call(
        functools.partial(_ln_kernel_flat, eps=eps),
        grid=grid,
        in_specs=[x_spec, g_spec, g_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(x, g.astype(jnp.float32), b.astype(jnp.float32))


# --- fused int8 MLP (fc1 -> gelu -> requant -> fc2 -> +residual) ----------
#
# The unfused int8 MLP round-trips the [M, mlp_hidden] fc1 output through
# HBM three times per layer (fc1 write, act_quant read+write, fc2 read):
# ~1.2 GB/layer at EVA-g's 33792x6144, measured ~50 ms/call for act_quant
# alone (tools/model_probe.py, 2026-08-19). This kernel keeps the hidden
# activation in VMEM: for each row block it loops over mlp_hidden in
# N-chunks, computing fc1 -> gelu -> per-(row, chunk) int8 requant ->
# fc2-partial on the MXU, accumulating the fc2 partials in f32 scratch,
# and finally adds the residual and bias. HBM traffic per layer drops to
# reading h_q/x and writing the output once.
#
# Numerics: the hidden requant uses per-(row, chunk) scales instead of the
# unfused path's per-row scales — strictly finer granularity (>= accuracy).
# When mlp_hidden <= n_chunk (tests' tiny configs) the two are identical.


def _fused_mlp_kernel(hq_ref, hs_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                      s2_ref, b2_ref, x_ref, o_ref, acc_ref, *, act: str,
                      n_chunks: int):
    j = pl.program_id(1)
    inter = jax.lax.dot_general(
        hq_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (inter.astype(jnp.float32) * hs_ref[...]
         * s1_ref[...][None, :] + b1_ref[...][None, :])
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "gelu_poly":
        from hirest_tpu.models.layers import gelu_bf16_poly
        y = gelu_bf16_poly(y)
    sc = jnp.maximum(jnp.max(jnp.abs(y), -1, keepdims=True) / 127.0, 1e-8)
    q2 = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        q2, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sc

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = (x_ref[...].astype(jnp.float32)
                        + b2_ref[...][None, :] + part * s2_ref[...][None, :])

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] += part * s2_ref[...][None, :]

    @pl.when(j == n_chunks - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def fused_mlp_int8(h_q, h_s, w1_q, w1_s, b1, w2_q, w2_s, b2, x_res, *,
                   act: str = "gelu_poly", row_block: int | None = None,
                   n_chunk: int = 1024, interpret: bool = False):
    """x_res + fc2(requant(act(fc1(h)))) in ONE pallas call.

    h_q [M, C] int8 + h_s [M, 1] f32 (from ln_quant), w1_q [C, F] int8 /
    w1_s [F] / b1 [F], w2_q [F, C] int8 / w2_s [C] / b2 [C], x_res [M, C]
    (the residual stream) -> [M, C] x_res.dtype. 3D inputs collapse to
    flat (reshape is a bitcast for 8-aligned token counts)."""
    if h_q.ndim == 3:
        bsz, seq, c = h_q.shape
        out = fused_mlp_int8(h_q.reshape(bsz * seq, c),
                             h_s.reshape(bsz * seq, 1), w1_q, w1_s, b1,
                             w2_q, w2_s, b2, x_res.reshape(bsz * seq, c),
                             act=act, row_block=row_block or seq,
                             n_chunk=n_chunk, interpret=interpret)
        return out.reshape(x_res.shape)
    m, c = h_q.shape
    f = w1_q.shape[1]
    nc = min(n_chunk, f)
    assert f % nc == 0, (f, nc)
    n_chunks = f // nc
    br = row_block if (row_block and m % row_block == 0) else m
    if br % 8 and br != m:
        # Mosaic sublane rule: block rows must be 8-divisible or equal the
        # array dim. Unpadded token counts (257) fall back to a 32-multiple
        # block with a ragged cdiv tail — rows are independent here, pallas
        # masks the tail (same policy as _row_specs_flat).
        br = min(m, 256)
    # block set: h_q/x/o [br, C], w blocks [C, nc]/[nc, C] int8 (double-
    # buffered), inter f32 [br, nc], acc f32 [br, C] scratch
    vmem = pltpu.VMEM if pltpu else None
    row_i8 = pl.BlockSpec((br, c), lambda i, j: (i, 0), memory_space=vmem)
    row_s = pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=vmem)
    w1_spec = pl.BlockSpec((c, nc), lambda i, j: (0, j), memory_space=vmem)
    s1_spec = pl.BlockSpec((nc,), lambda i, j: (j,), memory_space=vmem)
    w2_spec = pl.BlockSpec((nc, c), lambda i, j: (j, 0), memory_space=vmem)
    s2_spec = pl.BlockSpec((c,), lambda i, j: (0,), memory_space=vmem)
    scratch = [pltpu.VMEM((br, c), jnp.float32)] if pltpu else [None]
    if interpret and pltpu is None:  # pragma: no cover
        raise RuntimeError("fused_mlp_int8 needs pallas TPU scratch shapes")
    return pl.pallas_call(
        functools.partial(_fused_mlp_kernel, act=act, n_chunks=n_chunks),
        grid=(pl.cdiv(m, br), n_chunks),
        in_specs=[row_i8, row_s, w1_spec, s1_spec, s1_spec, w2_spec,
                  s2_spec, s2_spec, row_i8],
        out_specs=row_i8,
        out_shape=jax.ShapeDtypeStruct((m, c), x_res.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(h_q, h_s, w1_q, w1_s.astype(jnp.float32), b1.astype(jnp.float32),
      w2_q, w2_s.astype(jnp.float32), b2.astype(jnp.float32), x_res)


class QuantDense:
    """Stateless int8 replacement for a converted Dense layer: built from a
    float param dict {'kernel', 'bias'?}, callable on activations."""

    def __init__(self, params: dict, out_dtype=jnp.bfloat16):
        # quantize_weight is HOST-side (numpy) by design — never wrap the
        # kernel in jnp.asarray first, that would round-trip the full f32
        # weight device->host through the ~48 MB/s tunnel for nothing
        self.w_q, self.w_scale = quantize_weight(params["kernel"])
        self.bias = (jnp.asarray(params["bias"]) if "bias" in params else None)
        self.out_dtype = out_dtype

    def __call__(self, x):
        return int8_matmul(x, self.w_q, self.w_scale, self.bias, self.out_dtype)
