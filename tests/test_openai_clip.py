"""OpenAI CLIP ViT-B/32 parity vs an inline torch oracle (QuickGELU,
class embedding, ln_pre/ln_post, projection)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hirest_tpu.config import EvaTextConfig  # noqa: E402
from hirest_tpu.models.openai_clip import (  # noqa: E402
    ClipTextTower,
    ClipVisionConfig,
    ClipVisionTower,
    convert_clip_text,
    convert_clip_vision,
)

TOL = dict(rtol=3e-4, atol=3e-4)


def qgelu(x):
    return x * torch.sigmoid(1.702 * x)


class TorchClip(nn.Module):
    """Minimal OpenAI-CLIP: shared pre-LN transformer, vision+text towers."""

    def __init__(self, width_v, heads_v, layers, patch, img, width_t, heads_t,
                 vocab, ctx, embed):
        super().__init__()
        self.patch, self.heads_v, self.heads_t = patch, heads_v, heads_t
        grid = img // patch
        self.conv1 = nn.Conv2d(3, width_v, patch, patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(width_v) * width_v ** -0.5)
        self.v_pos = nn.Parameter(torch.randn(grid * grid + 1, width_v) * 0.01)
        self.ln_pre = nn.LayerNorm(width_v)
        self.v_blocks = nn.ModuleList(
            [self._block(width_v, heads_v) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width_v)
        self.proj = nn.Parameter(torch.randn(width_v, embed) * width_v ** -0.5)

        self.token_embedding = nn.Embedding(vocab, width_t)
        self.t_pos = nn.Parameter(torch.randn(ctx, width_t) * 0.01)
        self.t_blocks = nn.ModuleList(
            [self._block(width_t, heads_t) for _ in range(layers)])
        self.ln_final = nn.LayerNorm(width_t)
        self.text_projection = nn.Parameter(torch.randn(width_t, embed) * width_t ** -0.5)
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    @staticmethod
    def _block(width, heads):
        blk = nn.Module()
        blk.ln_1 = nn.LayerNorm(width)
        blk.attn = nn.MultiheadAttention(width, heads)
        blk.ln_2 = nn.LayerNorm(width)
        blk.c_fc = nn.Linear(width, width * 4)
        blk.c_proj = nn.Linear(width * 4, width)
        return blk

    @staticmethod
    def _run_blocks(x, blocks, attn_mask=None):
        for blk in blocks:
            h = blk.ln_1(x)
            h = blk.attn(h, h, h, need_weights=False, attn_mask=attn_mask)[0]
            x = x + h
            x = x + blk.c_proj(qgelu(blk.c_fc(blk.ln_2(x))))
        return x

    @torch.no_grad()
    def encode_image(self, images):  # [B, 3, H, W]
        x = self.conv1(images).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.v_pos
        x = self.ln_pre(x).permute(1, 0, 2)
        x = self._run_blocks(x, self.v_blocks).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj

    @torch.no_grad()
    def encode_text(self, ids):
        x = self.token_embedding(ids) + self.t_pos
        ctx = x.shape[1]
        x = x.permute(1, 0, 2)
        x = self._run_blocks(x, self.t_blocks, self.attn_mask[:ctx, :ctx])
        x = self.ln_final(x.permute(1, 0, 2))
        x = x[torch.arange(x.shape[0]), ids.argmax(-1)]
        return x @ self.text_projection

    def export(self):
        sd = {"token_embedding.weight": self.token_embedding.weight,
              "positional_embedding": self.t_pos,
              "ln_final.weight": self.ln_final.weight,
              "ln_final.bias": self.ln_final.bias,
              "text_projection": self.text_projection,
              "visual.conv1.weight": self.conv1.weight,
              "visual.class_embedding": self.class_embedding,
              "visual.positional_embedding": self.v_pos,
              "visual.ln_pre.weight": self.ln_pre.weight,
              "visual.ln_pre.bias": self.ln_pre.bias,
              "visual.ln_post.weight": self.ln_post.weight,
              "visual.ln_post.bias": self.ln_post.bias,
              "visual.proj": self.proj}
        for prefix, blocks in (("", self.t_blocks), ("visual.", self.v_blocks)):
            for i, blk in enumerate(blocks):
                r = f"{prefix}transformer.resblocks.{i}"
                sd[f"{r}.ln_1.weight"] = blk.ln_1.weight
                sd[f"{r}.ln_1.bias"] = blk.ln_1.bias
                sd[f"{r}.ln_2.weight"] = blk.ln_2.weight
                sd[f"{r}.ln_2.bias"] = blk.ln_2.bias
                sd[f"{r}.attn.in_proj_weight"] = blk.attn.in_proj_weight
                sd[f"{r}.attn.in_proj_bias"] = blk.attn.in_proj_bias
                sd[f"{r}.attn.out_proj.weight"] = blk.attn.out_proj.weight
                sd[f"{r}.attn.out_proj.bias"] = blk.attn.out_proj.bias
                sd[f"{r}.mlp.c_fc.weight"] = blk.c_fc.weight
                sd[f"{r}.mlp.c_fc.bias"] = blk.c_fc.bias
                sd[f"{r}.mlp.c_proj.weight"] = blk.c_proj.weight
                sd[f"{r}.mlp.c_proj.bias"] = blk.c_proj.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    return TorchClip(width_v=16, heads_v=4, layers=2, patch=14, img=28,
                     width_t=12, heads_t=4, vocab=60, ctx=10, embed=8).eval()


def test_clip_vision_parity(oracle):
    cfg = ClipVisionConfig(image_size=28, patch_size=14, layers=2, width=16,
                           heads=4, embed_dim=8)
    imgs = np.random.default_rng(0).normal(size=(2, 28, 28, 3)).astype(np.float32)
    want = oracle.encode_image(torch.tensor(imgs).permute(0, 3, 1, 2)).numpy()
    params = {"params": convert_clip_vision(oracle.export(), cfg)}
    got = np.asarray(ClipVisionTower(cfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, **TOL)


def test_clip_text_parity(oracle):
    cfg = EvaTextConfig(context_length=10, vocab_size=60, width=12, heads=4,
                        layers=2, embed_dim=8)
    ids = np.array([[3, 5, 59, 0, 0, 0, 0, 0, 0, 0],
                    [7, 59, 0, 0, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
    want = oracle.encode_text(torch.tensor(ids, dtype=torch.long)).numpy()
    params = {"params": convert_clip_text(oracle.export(), cfg)}
    got = np.asarray(ClipTextTower(cfg).apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, **TOL)
