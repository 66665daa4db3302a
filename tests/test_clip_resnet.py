"""Parity of the flax ModifiedResNet tower against the reference torch one.

Imports the vendored OpenAI CLIP ResNet directly from
/root/reference/EVA_clip/model.py (clean top-level imports) as the oracle:
tiny config, randomized BN running stats, eval() mode, identical NCHW/NHWC
inputs through both, f32 tolerance. Also checks that the single-query
attention pool in clip_resnet.AttentionPool2d matches the reference's full
self-attention row 0, and that RN50-shaped params build.
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hirest_tpu.models.clip_resnet import (  # noqa: E402
    RN50,
    ClipResNetConfig,
    ClipResNetTower,
    convert_clip_resnet,
)

REF_MODEL = "/root/reference/EVA_clip/model.py"

TINY = ClipResNetConfig(layers=(1, 1, 1, 1), output_dim=24, heads=2,
                        image_size=64, width=16)


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location("ref_eva_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(module, seed=0):
    """Random weights AND random BN running stats (so folding is tested)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_modified_resnet_parity(ref_mod):
    cfg = TINY
    ref = ref_mod.ModifiedResNet(layers=list(cfg.layers),
                                 output_dim=cfg.output_dim, heads=cfg.heads,
                                 input_resolution=cfg.image_size,
                                 width=cfg.width)
    _randomize(ref)
    ref.eval()

    rng = np.random.RandomState(1)
    img = rng.randn(3, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    params = convert_clip_resnet(ref.state_dict(), cfg)
    got = ClipResNetTower(cfg).apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_attnpool_matches_full_self_attention(ref_mod):
    """Our mean-token-only query == reference full self-attention row 0."""
    torch.manual_seed(3)
    pool = ref_mod.AttentionPool2d(spacial_dim=2, embed_dim=32, num_heads=4,
                                   output_dim=16)
    pool.eval()
    x = torch.randn(2, 32, 2, 2)
    with torch.no_grad():
        want = pool(x).numpy()

    from hirest_tpu.models.clip_resnet import AttentionPool2d

    sd = pool.state_dict()
    params = {
        "positional_embedding": sd["positional_embedding"].numpy(),
        **{k: {"kernel": sd[f"{k}.weight"].numpy().T,
               "bias": sd[f"{k}.bias"].numpy()}
           for k in ("q_proj", "k_proj", "v_proj", "c_proj")},
    }
    got = AttentionPool2d(heads=4, output_dim=16).apply(
        {"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["resnet", "vit"])
def test_build_clip_from_state_dict(ref_mod, variant):
    """Shape-sniffing factory vs the reference CLIP's encode_image/text."""
    from hirest_tpu.models.openai_clip import build_clip_from_state_dict

    if variant == "resnet":
        vision_layers, vision_width, patch, res = (1, 1, 1, 1), 2, None, 64
    else:
        vision_layers, vision_width, patch, res = 2, 64, 16, 64
    ref = ref_mod.CLIP(embed_dim=24, image_resolution=res,
                       vision_layers=vision_layers, vision_width=vision_width,
                       vision_patch_size=patch, context_length=16,
                       vocab_size=100, transformer_width=64,
                       transformer_heads=1, transformer_layers=2)
    _randomize(ref, seed=7)
    ref.eval()

    rng = np.random.RandomState(2)
    img = rng.randn(2, res, res, 3).astype(np.float32)
    ids = rng.randint(1, 100, size=(2, 16))
    ids[:, -1] = 99  # argmax EOT lands on the last position
    with torch.no_grad():
        want_img = ref.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        want_txt = ref.encode_text(torch.from_numpy(ids)).numpy()

    vt, vp, tt, tp, scale = build_clip_from_state_dict(ref.state_dict())
    got_img = vt.apply({"params": vp}, jnp.asarray(img))
    got_txt = tt.apply({"params": tp}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_img), want_img,
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_txt), want_txt,
                               rtol=3e-4, atol=3e-4)
    assert np.isclose(scale, float(ref.logit_scale.detach().exp()), rtol=1e-5)


def test_rn50_param_shapes_build():
    """RN50 config initializes and runs one tiny-batch forward."""
    tower = ClipResNetTower(RN50)
    params = jax.eval_shape(
        lambda: tower.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3), jnp.float32)))
    leaves = jax.tree_util.tree_leaves(params)
    n = sum(int(np.prod(l.shape)) for l in leaves)
    # torch RN50 visual: 38,316,896 params; BN folding keeps count identical
    # (running stats excluded, weight+bias kept as scale+bias)
    assert n == 38_316_896
