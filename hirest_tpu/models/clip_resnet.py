"""OpenAI CLIP ModifiedResNet visual tower (RN50 family) in flax.

The reference vendors this tower twice (EVA_clip/model.py:95-163 and
clip4caption/feature_extractor/modules/module_clip.py:155-222); it is the
visual encoder behind the `RN50` / `RN101` / `RN50x4` CLIP variants. The
HiREST main path runs ViT-B/32, but the vendored `clip.load` surface
accepts the ResNet names, so the rebuild carries it for drop-in parity.

TPU-first decisions (vs the torch original):
- NHWC layout throughout — the TPU conv emitter's native layout; the
  converter transposes OIHW kernels once at load time.
- BatchNorm is inference-only here (frozen retrieval backbone), so each
  BN folds to a per-channel affine `x * scale + bias` at CONVERT time
  (scale = gamma / sqrt(running_var + eps)); the forward never touches
  running stats and XLA fuses the affine+relu into the conv epilogue.
- AttentionPool2d queries ONLY the mean token: the torch code runs full
  (HW+1)x(HW+1) self-attention and keeps row 0 (EVA_clip/model.py:67-93,
  return_all_tokens=False); attending a single query to all keys is
  mathematically identical and 50x cheaper.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ClipResNetConfig:
    """RN50 defaults (embed width 64; attnpool output 1024)."""

    layers: tuple = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64
    bn_eps: float = 1e-5

    @property
    def embed_dim(self) -> int:  # final ResNet feature dim
        return self.width * 32


RN50 = ClipResNetConfig()
RN101 = ClipResNetConfig(layers=(3, 4, 23, 3), output_dim=512)
RN50x4 = ClipResNetConfig(layers=(4, 6, 10, 6), output_dim=640, heads=40,
                          image_size=288, width=80)


class _Affine(nn.Module):
    """Folded inference BatchNorm: per-channel scale+bias."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _avg_pool(x, k: int):
    # torch AvgPool2d(k): non-overlapping kxk windows, floor division
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """Anti-aliased bottleneck: all convs stride 1, avgpool after conv2
    when stride > 1; downsample branch is avgpool -> 1x1 conv -> affine.
    Mirrors EVA_clip/model.py:10-53 semantics."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        out_ch = self.planes * self.expansion
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_Affine(self.planes, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(h)
        h = nn.relu(_Affine(self.planes, name="bn2")(h))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = _Affine(out_ch, name="bn3")(h)

        identity = x
        if self.stride > 1 or inplanes != out_ch:
            identity = x if self.stride == 1 else _avg_pool(x, self.stride)
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               name="down_conv")(identity)
            identity = _Affine(out_ch, name="down_bn")(identity)
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool: [B, H, W, C] -> [B, output_dim].

    Matches EVA_clip/model.py:56-93 with the mean token as the only
    query (identical output to full self-attention row 0)."""

    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        toks = x.reshape(b, hh * ww, c)
        mean = toks.mean(axis=1, keepdims=True)
        toks = jnp.concatenate([mean, toks], axis=1)  # [B, HW+1, C]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5), (hh * ww + 1, c))
        toks = toks + pos[None].astype(toks.dtype)

        hd = c // self.heads
        q = nn.Dense(c, name="q_proj", dtype=toks.dtype)(toks[:, :1])
        k = nn.Dense(c, name="k_proj", dtype=toks.dtype)(toks)
        v = nn.Dense(c, name="v_proj", dtype=toks.dtype)(toks)
        q = q.reshape(b, 1, self.heads, hd) * (hd ** -0.5)
        k = k.reshape(b, -1, self.heads, hd)
        v = v.reshape(b, -1, self.heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, c)
        return nn.Dense(self.output_dim, name="c_proj", dtype=out.dtype)(out)


class ClipResNetTower(nn.Module):
    """ModifiedResNet image encoder: [B, S, S, 3] -> [B, output_dim]."""

    config: ClipResNetConfig = RN50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        assert images.shape[1] == images.shape[2] == cfg.image_size
        x = images.astype(self.dtype)

        # 3-conv stem, stride-2 first conv, avgpool(2) instead of maxpool
        w2 = cfg.width // 2
        x = nn.Conv(w2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv1")(x)
        x = nn.relu(_Affine(w2, name="bn1")(x))
        x = nn.Conv(w2, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv2")(x)
        x = nn.relu(_Affine(w2, name="bn2")(x))
        x = nn.Conv(cfg.width, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv3")(x)
        x = nn.relu(_Affine(cfg.width, name="bn3")(x))
        x = _avg_pool(x, 2)

        for stage, (planes_mul, blocks) in enumerate(
                zip((1, 2, 4, 8), cfg.layers)):
            stride = 1 if stage == 0 else 2
            planes = cfg.width * planes_mul
            for i in range(blocks):
                x = Bottleneck(planes, stride if i == 0 else 1,
                               name=f"layer{stage + 1}_{i}")(x)

        out = AttentionPool2d(cfg.heads, cfg.output_dim, name="attnpool")(x)
        return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Converter from the OpenAI CLIP torch state dict (`visual.*` keys)
# ---------------------------------------------------------------------------


def _conv(sd, key):
    import numpy as np

    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)  # [O, I, kh, kw]
    return {"kernel": w.transpose(2, 3, 1, 0)}  # -> [kh, kw, I, O]


def _bn_affine(sd, key, eps: float):
    import numpy as np

    g = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    mean = np.asarray(sd[f"{key}.running_mean"], dtype=np.float32)
    var = np.asarray(sd[f"{key}.running_var"], dtype=np.float32)
    scale = g / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _dense(sd, key):
    import numpy as np

    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    p = {"kernel": w.T}
    if f"{key}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return p


def convert_clip_resnet(sd, config: ClipResNetConfig = RN50) -> dict:
    """OpenAI CLIP ResNet checkpoint (`visual.*` keys, torch tensors or
    numpy) -> ClipResNetTower params. BatchNorms fold to affines here."""
    import numpy as np

    sd = {k[len("visual."):] if k.startswith("visual.") else k:
          (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    eps = config.bn_eps
    p = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = _conv(sd, f"conv{i}")
        p[f"bn{i}"] = _bn_affine(sd, f"bn{i}", eps)
    for stage in range(4):
        for i in range(config.layers[stage]):
            r = f"layer{stage + 1}.{i}"
            blk = {
                "conv1": _conv(sd, f"{r}.conv1"),
                "bn1": _bn_affine(sd, f"{r}.bn1", eps),
                "conv2": _conv(sd, f"{r}.conv2"),
                "bn2": _bn_affine(sd, f"{r}.bn2", eps),
                "conv3": _conv(sd, f"{r}.conv3"),
                "bn3": _bn_affine(sd, f"{r}.bn3", eps),
            }
            if f"{r}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv(sd, f"{r}.downsample.0")
                blk["down_bn"] = _bn_affine(sd, f"{r}.downsample.1", eps)
            p[f"layer{stage + 1}_{i}"] = blk
    p["attnpool"] = {
        "positional_embedding": np.asarray(sd["attnpool.positional_embedding"],
                                           dtype=np.float32),
        "q_proj": _dense(sd, "attnpool.q_proj"),
        "k_proj": _dense(sd, "attnpool.k_proj"),
        "v_proj": _dense(sd, "attnpool.v_proj"),
        "c_proj": _dense(sd, "attnpool.c_proj"),
    }
    return p
