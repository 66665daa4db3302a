import numpy as np
import pytest

from hirest_tpu.infer.segmentation import iterative_segmentation


def softmax_masked(logits, moment_mask):
    x = np.where(moment_mask > 0, logits, -np.finfo(np.float32).max)
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def make_score_fn(peaks):
    """Score fn with fixed per-frame preference `peaks` [B, T]; masked frames
    get no mass, so each iteration the best remaining peak wins."""

    def fn(moment_mask, prev_boundary_mask):
        return softmax_masked(np.array(peaks, dtype=np.float32), moment_mask)

    return fn


def test_single_sharp_peak_segments_moment():
    T = 40
    peaks = np.full((1, T), -10.0)
    peaks[0, 20] = 10.0   # one sharp boundary at frame 20
    fn = make_score_fn(peaks)
    out = iterative_segmentation(fn, np.array([[5, 35]]), T, 0.5, max_iterations=3)
    # a boundary near the peak must appear; the reference's greedy expansion
    # overshoots one frame into masked territory, so the start can be 4
    assert any(abs(x - 20) <= 1 for x in out[0])
    assert all(4 <= x <= 35 for x in out[0])
    assert out[0] == sorted(set(out[0]))
    # >= 5 frame gaps between consecutive boundaries
    assert all(b - a >= 5 for a, b in zip(out[0], out[0][1:]))


def test_flat_scores_expand_to_whole_moment():
    # Uniform scores: ratio == 1 > 0.5 everywhere, so the expansion walks to
    # the mask edges and then scores[0]/max == 0 stops at the zero frames.
    T = 30
    peaks = np.zeros((1, T))
    fn = make_score_fn(peaks)
    out = iterative_segmentation(fn, np.array([[4, 25]]), T, 0.5, max_iterations=2)
    assert out[0][0] in (3, 4)  # expansion may overshoot one masked frame
    # the RIGHT edge must expand too: without it 'expand to whole moment'
    # passes even when the expansion loop is dead
    assert out[0][-1] in (24, 25, 26), out[0]
    assert len(out[0]) >= 2


def test_batch_independence():
    T = 32
    peaks = np.full((2, T), -10.0)
    peaks[0, 10] = 5.0
    peaks[1, 22] = 5.0
    fn = make_score_fn(peaks)
    out = iterative_segmentation(fn, np.array([[2, 28], [2, 28]]), T, 0.5, 2)
    assert any(abs(x - 10) <= 1 for x in out[0])
    assert any(abs(x - 22) <= 1 for x in out[1])
    assert not any(abs(x - 22) <= 1 for x in out[0])


def test_dedup_and_sorted():
    T = 20
    peaks = np.full((1, T), -10.0)
    peaks[0, 9] = 8.0
    fn = make_score_fn(peaks)
    out = iterative_segmentation(fn, np.array([[0, 19]]), T, 0.5, max_iterations=5)
    assert out[0] == sorted(set(out[0]))


@pytest.mark.slow
def test_scan_variant_matches_host_loop():
    """The fused lax.scan decoder must produce the same boundaries as the
    host loop on a real (random) scoring model."""
    import jax
    import jax.numpy as jnp

    from hirest_tpu.config import JointModelConfig, VisualEncoderConfig, DecoderConfig
    from hirest_tpu.infer.segmentation import iterative_segmentation_scan
    from hirest_tpu.models import MomentModel

    cfg = JointModelConfig(
        embed_dim=16,
        visual=VisualEncoderConfig(hidden_size=16, num_hidden_layers=1,
                                   num_attention_heads=4, intermediate_size=32),
        decoder=DecoderConfig(vocab_size=16, hidden_size=16, num_decoder_layers=1,
                              num_attention_heads=4, intermediate_size=32,
                              max_target_embeddings=16))
    m = MomentModel(cfg)
    B, T = 3, 48
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, T, 1024)).astype(np.float32))
    text = jnp.asarray(rng.normal(size=(B, 1024)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), video, text,
                    jnp.zeros((B, 8), jnp.int32), method=MomentModel.init_all)
    vm = jnp.ones((B, T), jnp.int32)

    def score_traceable(mm, pbm):
        logits = m.apply(params, video, text, vm, mm, None, pbm,
                         method=MomentModel.moment_segmentation)
        masked = jnp.where(mm > 0, logits, -jnp.finfo(jnp.float32).max)
        return jax.nn.softmax(masked, axis=1)

    def score_host(mm, pbm):
        return np.asarray(score_traceable(jnp.asarray(mm), jnp.asarray(pbm)))

    bounds = np.array([[3, 40], [0, 47], [10, 30]])
    host = iterative_segmentation(score_host, bounds, T, 0.5, 6)
    fused = iterative_segmentation_scan(score_traceable, bounds, T, 0.5, 6)
    assert fused == host
