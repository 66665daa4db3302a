"""Serving engine + HTTP server: spin up on a free port, hit the endpoints."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from hirest_tpu.config import (
    DecoderConfig,
    HirestConfig,
    JointModelConfig,
    VisualEncoderConfig,
)


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    feats = tmp / "feats"
    feats.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(feats / f"vid{i}.mp4.npy",
                rng.normal(size=(40 + i * 10, 1024)).astype(np.float32))

    model_cfg = JointModelConfig(
        embed_dim=32,
        visual=VisualEncoderConfig(hidden_size=32, num_hidden_layers=1,
                                   num_attention_heads=4, intermediate_size=64),
        decoder=DecoderConfig(vocab_size=40, hidden_size=32, num_decoder_layers=1,
                              num_attention_heads=4, intermediate_size=64,
                              max_target_embeddings=32))
    cfg = HirestConfig(video_feature_dir=str(feats),
                       task_moment_retrieval=True, task_moment_segmentation=True,
                       task_step_captioning=True, eval_batch_size=1,
                       num_beams=2, max_words=8,
                       moment_segmentation_max_iterations=2,
                       frame_buckets=(64, 128),
                       pretrained_dir=str(tmp / "none"))

    from hirest_tpu.serve import ServingEngine, make_server
    from hirest_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, text_encoder_fn=lambda ids: np.ones((len(ids), 1024),
                                                               np.float32),
                      verbose=False, model_config=model_cfg)
    engine = ServingEngine(cfg, trainer=trainer)
    server = make_server(engine, port=0)  # OS-assigned free port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def test_health(served):
    with urllib.request.urlopen(f"{served}/health", timeout=30) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["indexed_videos"] == 4


def test_retrieve(served):
    status, data = _post(f"{served}/v1/retrieve", {"prompt": "make pancakes",
                                                   "top_k": 3})
    assert status == 200
    assert len(data["videos"]) == 3
    assert data["scores"] == sorted(data["scores"], reverse=True)


@pytest.mark.slow
def test_analyze(served):
    status, data = _post(f"{served}/v1/analyze",
                         {"prompt": "make pancakes", "video": "vid0.mp4"})
    assert status == 200, data
    assert len(data["moment_bounds"]) == 2
    for step in data["steps"]:
        assert "bounds" in step and "caption" in step


def test_error_paths(served):
    status_codes = []
    # missing prompt
    try:
        _post(f"{served}/v1/retrieve", {})
    except urllib.error.HTTPError as e:
        status_codes.append(e.code)
    # unknown video
    try:
        _post(f"{served}/v1/analyze", {"prompt": "x", "video": "nope.mp4"})
    except urllib.error.HTTPError as e:
        status_codes.append(e.code)
    # unknown path
    try:
        _post(f"{served}/v1/nope", {})
    except urllib.error.HTTPError as e:
        status_codes.append(e.code)
    assert status_codes == [400, 404, 404]
