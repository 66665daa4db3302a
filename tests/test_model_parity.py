"""Numerical parity of the flax models + weight converters against torch.

Each test builds a small *standard* torch module (the published
architectures: pre-LN CLIP text block, BEiT attention, BERT post-LN layer,
transformer decoder with tied classifier), exports its state dict through
the converters, and checks the flax forward matches torch to float32
tolerance. torch is a host-side test dependency only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hirest_tpu.config import (  # noqa: E402
    DecoderConfig,
    EvaTextConfig,
    EvaVisionConfig,
    VisualEncoderConfig,
)
from hirest_tpu.models import EvaTextTower, EvaVisionTower  # noqa: E402
from hirest_tpu.models.caption import CaptionDecoder, VisualEncoder  # noqa: E402
from hirest_tpu.models.convert import (  # noqa: E402
    convert_caption_decoder,
    convert_eva_text,
    convert_eva_vision,
    convert_visual_encoder,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def sd_numpy(module: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# EVA text tower vs a torch pre-LN CLIP text transformer
# ---------------------------------------------------------------------------


class TorchTextTower(nn.Module):
    """Standard CLIP text transformer (pre-LN, causal, EOT pooling)."""

    def __init__(self, vocab, width, heads, layers, ctx, embed_dim):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, width) * 0.01)
        self.blocks = nn.ModuleList()
        for _ in range(layers):
            blk = nn.Module()
            blk.ln_1 = nn.LayerNorm(width)
            blk.attn = nn.MultiheadAttention(width, heads)
            blk.ln_2 = nn.LayerNorm(width)
            blk.mlp = nn.Sequential()
            blk.mlp.c_fc = nn.Linear(width, width * 4)
            blk.mlp.c_proj = nn.Linear(width * 4, width)
            self.blocks.append(blk)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.randn(width, embed_dim) * width ** -0.5)
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def state_dict_for_convert(self):
        sd = {"token_embedding.weight": self.token_embedding.weight,
              "positional_embedding": self.positional_embedding,
              "ln_final.weight": self.ln_final.weight, "ln_final.bias": self.ln_final.bias,
              "text_projection": self.text_projection}
        for i, blk in enumerate(self.blocks):
            r = f"transformer.resblocks.{i}"
            sd[f"{r}.ln_1.weight"] = blk.ln_1.weight
            sd[f"{r}.ln_1.bias"] = blk.ln_1.bias
            sd[f"{r}.ln_2.weight"] = blk.ln_2.weight
            sd[f"{r}.ln_2.bias"] = blk.ln_2.bias
            sd[f"{r}.attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[f"{r}.attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[f"{r}.attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[f"{r}.attn.out_proj.bias"] = blk.attn.out_proj.bias
            sd[f"{r}.mlp.c_fc.weight"] = blk.mlp.c_fc.weight
            sd[f"{r}.mlp.c_fc.bias"] = blk.mlp.c_fc.bias
            sd[f"{r}.mlp.c_proj.weight"] = blk.mlp.c_proj.weight
            sd[f"{r}.mlp.c_proj.bias"] = blk.mlp.c_proj.bias
        return {k: v.detach().numpy() for k, v in sd.items()}

    @torch.no_grad()
    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)
        ctx = x.shape[0]
        for blk in self.blocks:
            h = blk.ln_1(x)
            h = blk.attn(h, h, h, need_weights=False, attn_mask=self.attn_mask[:ctx, :ctx])[0]
            x = x + h
            x = x + blk.mlp.c_proj(F.gelu(blk.mlp.c_fc(blk.ln_2(x))))
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return x @ self.text_projection


def test_eva_text_tower_parity():
    torch.manual_seed(0)
    cfg = EvaTextConfig(context_length=16, vocab_size=100, width=32, heads=4,
                        layers=2, embed_dim=24)
    ref = TorchTextTower(cfg.vocab_size, cfg.width, cfg.heads, cfg.layers,
                         cfg.context_length, cfg.embed_dim).eval()
    # text ids: EOT must be max id per row
    ids = np.array([[5, 7, 12, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                    [3, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
    want = ref(torch.tensor(ids, dtype=torch.long)).numpy()

    params = {"params": convert_eva_text(ref.state_dict_for_convert(), cfg)}
    got = np.asarray(EvaTextTower(cfg).apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, **TOL)


# ---------------------------------------------------------------------------
# EVA vision tower vs a torch BEiT-style ViT
# ---------------------------------------------------------------------------


class TorchViT(nn.Module):
    """BEiT-style ViT: fused qkv with q/v-only bias, pre-norm, cls pooling."""

    def __init__(self, img, patch, width, heads, head_dim, mlp_hidden, layers, embed_dim):
        super().__init__()
        self.patch = patch
        self.heads = heads
        self.head_dim = head_dim
        n = (img // patch) ** 2
        self.proj = nn.Conv2d(3, width, kernel_size=patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, width) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, width) * 0.02)
        self.blocks = nn.ModuleList()
        all_head = heads * head_dim
        for _ in range(layers):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(width, eps=1e-6)
            blk.qkv = nn.Linear(width, all_head * 3, bias=False)
            blk.q_bias = nn.Parameter(torch.randn(all_head) * 0.02)
            blk.v_bias = nn.Parameter(torch.randn(all_head) * 0.02)
            blk.attn_proj = nn.Linear(all_head, width)
            blk.norm2 = nn.LayerNorm(width, eps=1e-6)
            blk.fc1 = nn.Linear(width, mlp_hidden)
            blk.fc2 = nn.Linear(mlp_hidden, width)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(width, eps=1e-6)
        self.head = nn.Linear(width, embed_dim)

    def state_dict_for_convert(self):
        sd = {"patch_embed.proj.weight": self.proj.weight,
              "patch_embed.proj.bias": self.proj.bias,
              "cls_token": self.cls_token, "pos_embed": self.pos_embed,
              "norm.weight": self.norm.weight, "norm.bias": self.norm.bias,
              "head.weight": self.head.weight, "head.bias": self.head.bias}
        for i, blk in enumerate(self.blocks):
            r = f"blocks.{i}"
            sd[f"{r}.norm1.weight"] = blk.norm1.weight
            sd[f"{r}.norm1.bias"] = blk.norm1.bias
            sd[f"{r}.norm2.weight"] = blk.norm2.weight
            sd[f"{r}.norm2.bias"] = blk.norm2.bias
            sd[f"{r}.attn.qkv.weight"] = blk.qkv.weight
            sd[f"{r}.attn.q_bias"] = blk.q_bias
            sd[f"{r}.attn.v_bias"] = blk.v_bias
            sd[f"{r}.attn.proj.weight"] = blk.attn_proj.weight
            sd[f"{r}.attn.proj.bias"] = blk.attn_proj.bias
            sd[f"{r}.mlp.fc1.weight"] = blk.fc1.weight
            sd[f"{r}.mlp.fc1.bias"] = blk.fc1.bias
            sd[f"{r}.mlp.fc2.weight"] = blk.fc2.weight
            sd[f"{r}.mlp.fc2.bias"] = blk.fc2.bias
        return {k: v.detach().numpy() for k, v in sd.items()}

    @torch.no_grad()
    def forward(self, x):  # x: [B, 3, H, W]
        b = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv_bias = torch.cat((blk.q_bias, torch.zeros_like(blk.v_bias), blk.v_bias))
            qkv = F.linear(h, blk.qkv.weight, qkv_bias)
            B, N, _ = h.shape
            qkv = qkv.reshape(B, N, 3, self.heads, self.head_dim).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * self.head_dim ** -0.5) @ k.transpose(-2, -1)
            attn = attn.softmax(dim=-1)
            h = (attn @ v).transpose(1, 2).reshape(B, N, -1)
            x = x + blk.attn_proj(h)
            x = x + blk.fc2(F.gelu(blk.fc1(blk.norm2(x))))
        x = self.norm(x)
        return self.head(x[:, 0])


def test_eva_vision_tower_parity():
    torch.manual_seed(1)
    cfg = EvaVisionConfig(image_size=28, patch_size=14, layers=2, width=24,
                          head_width=6, mlp_ratio=2.0, embed_dim=16)
    ref = TorchViT(28, 14, cfg.width, cfg.num_heads, cfg.head_width,
                   cfg.mlp_hidden, cfg.layers, cfg.embed_dim).eval()
    imgs = np.random.default_rng(0).normal(size=(2, 28, 28, 3)).astype(np.float32)
    want = ref(torch.tensor(imgs).permute(0, 3, 1, 2)).numpy()

    params = {"params": convert_eva_vision(ref.state_dict_for_convert(), cfg)}
    got = np.asarray(EvaVisionTower(cfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, **TOL)


# ---------------------------------------------------------------------------
# BERT-style visual encoder vs torch
# ---------------------------------------------------------------------------


class TorchVisualEncoder(nn.Module):
    """Post-LN BERT encoder over projected feature vectors, erf GELU,
    constant attention bias (= full attention)."""

    def __init__(self, feat_dim, hidden, heads, inter, layers, max_pos):
        super().__init__()
        self.heads = heads
        self.word_embeddings = nn.Linear(feat_dim, hidden)
        self.position_embeddings = nn.Embedding(max_pos, hidden)
        self.LayerNorm = nn.LayerNorm(hidden, eps=1e-12)
        self.layers = nn.ModuleList()
        for _ in range(layers):
            lay = nn.Module()
            lay.q = nn.Linear(hidden, hidden)
            lay.k = nn.Linear(hidden, hidden)
            lay.v = nn.Linear(hidden, hidden)
            lay.att_out = nn.Linear(hidden, hidden)
            lay.att_ln = nn.LayerNorm(hidden, eps=1e-12)
            lay.inter = nn.Linear(hidden, inter)
            lay.out = nn.Linear(inter, hidden)
            lay.out_ln = nn.LayerNorm(hidden, eps=1e-12)
            self.layers.append(lay)

    def state_dict_for_convert(self, prefix="visual."):
        sd = {f"{prefix}embeddings.word_embeddings.weight": self.word_embeddings.weight,
              f"{prefix}embeddings.word_embeddings.bias": self.word_embeddings.bias,
              f"{prefix}embeddings.position_embeddings.weight": self.position_embeddings.weight,
              f"{prefix}embeddings.LayerNorm.weight": self.LayerNorm.weight,
              f"{prefix}embeddings.LayerNorm.bias": self.LayerNorm.bias}
        for i, lay in enumerate(self.layers):
            r = f"{prefix}encoder.layer.{i}"
            for name, mod in [("attention.self.query", lay.q), ("attention.self.key", lay.k),
                              ("attention.self.value", lay.v),
                              ("attention.output.dense", lay.att_out),
                              ("attention.output.LayerNorm", lay.att_ln),
                              ("intermediate.dense", lay.inter),
                              ("output.dense", lay.out), ("output.LayerNorm", lay.out_ln)]:
                sd[f"{r}.{name}.weight"] = mod.weight
                sd[f"{r}.{name}.bias"] = mod.bias
        return {k: v.detach().numpy() for k, v in sd.items()}

    @torch.no_grad()
    def forward(self, feats):
        B, T, _ = feats.shape
        pos = self.position_embeddings(torch.arange(T)).unsqueeze(0)
        x = self.LayerNorm(self.word_embeddings(feats) + pos)
        hd = x.shape[-1] // self.heads

        def heads_split(t):
            return t.view(B, T, self.heads, hd).permute(0, 2, 1, 3)

        for lay in self.layers:
            q, k, v = heads_split(lay.q(x)), heads_split(lay.k(x)), heads_split(lay.v(x))
            attn = (q @ k.transpose(-1, -2)) / hd ** 0.5
            ctx = (attn.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(B, T, -1)
            x = lay.att_ln(lay.att_out(ctx) + x)
            g = lay.inter(x)  # erf gelu
            g = g * 0.5 * (1.0 + torch.erf(g / 2 ** 0.5))
            x = lay.out_ln(lay.out(g) + x)
        return x


def test_visual_encoder_parity():
    torch.manual_seed(2)
    cfg = VisualEncoderConfig(feature_dim=8, hidden_size=16, num_hidden_layers=2,
                              num_attention_heads=4, intermediate_size=32,
                              max_position_embeddings=64)
    ref = TorchVisualEncoder(8, 16, 4, 32, 2, 64).eval()
    feats = np.random.default_rng(1).normal(size=(2, 10, 8)).astype(np.float32)
    want = ref(torch.tensor(feats)).numpy()

    p = convert_visual_encoder(ref.state_dict_for_convert(), num_layers=2,
                               max_position_embeddings=64)
    got = np.asarray(VisualEncoder(cfg).apply({"params": p}, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, **TOL)


# ---------------------------------------------------------------------------
# Caption decoder vs torch
# ---------------------------------------------------------------------------


class TorchDecoder(nn.Module):
    """Transformer decoder with causal+answer mask, cross-attn, tied classifier."""

    def __init__(self, vocab, hidden, heads, inter, layers, max_tgt):
        super().__init__()
        self.heads = heads
        self.word_embeddings = nn.Embedding(vocab, hidden)
        self.position_embeddings = nn.Embedding(max_tgt, hidden)
        self.LayerNorm = nn.LayerNorm(hidden, eps=1e-12)
        self.layers = nn.ModuleList()
        for _ in range(layers):
            lay = nn.Module()
            for attn in ("slf", "enc"):
                setattr(lay, f"{attn}_q", nn.Linear(hidden, hidden))
                setattr(lay, f"{attn}_k", nn.Linear(hidden, hidden))
                setattr(lay, f"{attn}_v", nn.Linear(hidden, hidden))
                setattr(lay, f"{attn}_out", nn.Linear(hidden, hidden))
                setattr(lay, f"{attn}_ln", nn.LayerNorm(hidden, eps=1e-12))
            lay.inter = nn.Linear(hidden, inter)
            lay.out = nn.Linear(inter, hidden)
            lay.out_ln = nn.LayerNorm(hidden, eps=1e-12)
            self.layers.append(lay)
        self.transform = nn.Linear(hidden, hidden)
        self.transform_ln = nn.LayerNorm(hidden, eps=1e-12)
        self.cls_bias = nn.Parameter(torch.zeros(vocab))

    def state_dict_for_convert(self, prefix="decoder."):
        sd = {f"{prefix}embeddings.word_embeddings.weight": self.word_embeddings.weight,
              f"{prefix}embeddings.position_embeddings.weight": self.position_embeddings.weight,
              f"{prefix}embeddings.LayerNorm.weight": self.LayerNorm.weight,
              f"{prefix}embeddings.LayerNorm.bias": self.LayerNorm.bias,
              f"{prefix}classifier.cls.predictions.transform.dense.weight": self.transform.weight,
              f"{prefix}classifier.cls.predictions.transform.dense.bias": self.transform.bias,
              f"{prefix}classifier.cls.predictions.transform.LayerNorm.weight": self.transform_ln.weight,
              f"{prefix}classifier.cls.predictions.transform.LayerNorm.bias": self.transform_ln.bias,
              f"{prefix}classifier.cls.predictions.bias": self.cls_bias}
        for i, lay in enumerate(self.layers):
            r = f"{prefix}decoder.layer.{i}"
            for attn in ("slf", "enc"):
                sd[f"{r}.{attn}_attn.att.query.weight"] = getattr(lay, f"{attn}_q").weight
                sd[f"{r}.{attn}_attn.att.query.bias"] = getattr(lay, f"{attn}_q").bias
                sd[f"{r}.{attn}_attn.att.key.weight"] = getattr(lay, f"{attn}_k").weight
                sd[f"{r}.{attn}_attn.att.key.bias"] = getattr(lay, f"{attn}_k").bias
                sd[f"{r}.{attn}_attn.att.value.weight"] = getattr(lay, f"{attn}_v").weight
                sd[f"{r}.{attn}_attn.att.value.bias"] = getattr(lay, f"{attn}_v").bias
                sd[f"{r}.{attn}_attn.output.dense.weight"] = getattr(lay, f"{attn}_out").weight
                sd[f"{r}.{attn}_attn.output.dense.bias"] = getattr(lay, f"{attn}_out").bias
                sd[f"{r}.{attn}_attn.output.LayerNorm.weight"] = getattr(lay, f"{attn}_ln").weight
                sd[f"{r}.{attn}_attn.output.LayerNorm.bias"] = getattr(lay, f"{attn}_ln").bias
            sd[f"{r}.intermediate.dense.weight"] = lay.inter.weight
            sd[f"{r}.intermediate.dense.bias"] = lay.inter.bias
            sd[f"{r}.output.dense.weight"] = lay.out.weight
            sd[f"{r}.output.dense.bias"] = lay.out.bias
            sd[f"{r}.output.LayerNorm.weight"] = lay.out_ln.weight
            sd[f"{r}.output.LayerNorm.bias"] = lay.out_ln.bias
        return {k: v.detach().numpy() for k, v in sd.items()}

    @torch.no_grad()
    def forward(self, ids, enc_out, answer_mask):
        B, L = ids.shape
        pos = self.position_embeddings(torch.arange(L)).unsqueeze(0)
        x = self.LayerNorm(self.word_embeddings(ids) + pos)
        tri = torch.triu(torch.ones(L, L), diagonal=1)
        slf_mask = ((1.0 - answer_mask.float()[:, None, None, :]) + tri[None, None]).gt(0).float()
        slf_bias = slf_mask * -10000.0
        hd = x.shape[-1] // self.heads

        def split(t, n):
            return t.view(B, n, self.heads, hd).permute(0, 2, 1, 3)

        def attend(q, k, v, bias):
            s = (q @ k.transpose(-1, -2)) / hd ** 0.5
            if bias is not None:
                s = s + bias
            ctx = s.softmax(-1) @ v
            return ctx.permute(0, 2, 1, 3).reshape(B, q.shape[2], -1)

        for lay in self.layers:
            ctx = attend(split(lay.slf_q(x), L), split(lay.slf_k(x), L),
                         split(lay.slf_v(x), L), slf_bias)
            x = lay.slf_ln(lay.slf_out(ctx) + x)
            T = enc_out.shape[1]
            ctx = attend(split(lay.enc_q(x), L), split(lay.enc_k(enc_out), T),
                         split(lay.enc_v(enc_out), T), None)
            x = lay.enc_ln(lay.enc_out(ctx) + x)
            g = lay.inter(x)
            g = g * 0.5 * (1.0 + torch.erf(g / 2 ** 0.5))
            x = lay.out_ln(lay.out(g) + x)

        h = self.transform(x)
        h = h * 0.5 * (1.0 + torch.erf(h / 2 ** 0.5))
        h = self.transform_ln(h)
        return h @ self.word_embeddings.weight.T + self.cls_bias


def test_caption_decoder_parity():
    torch.manual_seed(3)
    cfg = DecoderConfig(vocab_size=50, hidden_size=16, num_decoder_layers=2,
                        num_attention_heads=4, intermediate_size=32,
                        max_target_embeddings=32)
    ref = TorchDecoder(50, 16, 4, 32, 2, 32).eval()
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 50, size=(2, 6)).astype(np.int32)
    enc = rng.normal(size=(2, 5, 16)).astype(np.float32)
    amask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], dtype=np.int32)
    want = ref(torch.tensor(ids, dtype=torch.long), torch.tensor(enc),
               torch.tensor(amask)).numpy()

    p = convert_caption_decoder(ref.state_dict_for_convert(), num_layers=2)
    got = np.asarray(CaptionDecoder(cfg).apply({"params": p}, jnp.asarray(ids),
                                               jnp.asarray(enc), jnp.asarray(amask)))
    np.testing.assert_allclose(got, want, **TOL)


def test_build_eva_model_and_transforms_surface():
    """Reference-factory surface: encode_text / encode_image / preprocess."""
    import jax.numpy as jnp2

    from hirest_tpu.models.eva_clip import build_eva_model_and_transforms

    small_t = EvaTextConfig(layers=1, width=32, heads=4, vocab_size=100,
                            embed_dim=16, context_length=8)
    small_v = EvaVisionConfig(image_size=28, patch_size=14, layers=1, width=16,
                              head_width=4, mlp_ratio=2.0, embed_dim=16)
    model, preprocess = build_eva_model_and_transforms(
        dtype=jnp2.float32, use_pallas=False, padded_heads=False,
        text_config=small_t, vision_config=small_v)
    ids = np.zeros((2, 8), np.int32)
    ids[:, 1] = 99
    assert np.asarray(model.encode_text(ids)).shape == (2, 16)
    imgs = np.zeros((2, 28, 28, 3), np.float32)
    assert np.asarray(model.encode_image(imgs)).shape == (2, 16)
    arr = preprocess(np.zeros((50, 40, 3), np.uint8))
    assert arr.shape == (224, 224, 3)
