"""Custom-video pipeline: synthesize a real mp4 with OpenCV, extract frames,
encode with a fake tower, run the staged pipeline end-to-end."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hirest_tpu.config import (  # noqa: E402
    DecoderConfig,
    HirestConfig,
    JointModelConfig,
    VisualEncoderConfig,
)
from hirest_tpu.infer.custom_video import (  # noqa: E402
    build_single_video_annotation,
    probe_duration,
    run_custom_video,
)


def make_test_video(path, seconds=8, fps=10, size=64):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, fps, (size, size))
    rng = np.random.default_rng(0)
    for i in range(seconds * fps):
        frame = np.full((size, size, 3), (i * 3) % 255, np.uint8)
        frame += rng.integers(0, 20, frame.shape).astype(np.uint8)
        w.write(frame)
    w.release()


def test_probe_and_annotation(tmp_path):
    video = tmp_path / "clip.mp4"
    make_test_video(video)
    dur = probe_duration(str(video))
    assert 7.0 <= dur <= 9.0
    anns = build_single_video_annotation(str(video), "test prompt")
    entry = anns["test prompt"]["clip.mp4"]
    assert entry["relevant"] and entry["clip"]
    assert entry["bounds"] == [0, int(dur)]
    assert len(entry["steps"]) == 5


@pytest.mark.slow
def test_custom_video_pipeline_end_to_end(tmp_path):
    video = tmp_path / "vids" / "clip.mp4"
    video.parent.mkdir()
    make_test_video(video, seconds=12)

    model_cfg = JointModelConfig(
        embed_dim=32,
        visual=VisualEncoderConfig(hidden_size=32, num_hidden_layers=1,
                                   num_attention_heads=4, intermediate_size=64),
        decoder=DecoderConfig(vocab_size=32, hidden_size=32, num_decoder_layers=1,
                              num_attention_heads=4, intermediate_size=64,
                              max_target_embeddings=32))
    config = HirestConfig(
        task_moment_retrieval=True, task_moment_segmentation=True,
        task_step_captioning=True, end_to_end=True, eval_batch_size=1,
        num_beams=2, max_words=8, moment_segmentation_max_iterations=2,
        ckpt_dir=str(tmp_path / "out"), frame_buckets=(64, 128),
        pretrained_dir=str(tmp_path / "none"))

    rng = np.random.default_rng(1)

    def fake_encode_image(imgs):
        return rng.normal(size=(len(imgs), 1024)).astype(np.float32)

    def fake_preprocess(img):
        return np.zeros((224, 224, 3), np.float32)

    def fake_text_encoder(ids):
        return np.ones((len(ids), 1024), np.float32)

    # build the trainer with the tiny model config injected
    import dataclasses

    from hirest_tpu.train.trainer import Trainer

    work = tmp_path / "work"
    # pre-create the feature dir path the trainer will use
    cfg2 = dataclasses.replace(config, data_dir=str(work / "splits"),
                               video_feature_dir=str(work / "feats"))
    os.makedirs(work / "splits")
    os.makedirs(work / "feats")
    json.dump({}, open(work / "splits" / "all_data_test.json", "w"))
    trainer = Trainer(cfg2, text_encoder_fn=fake_text_encoder, verbose=False,
                      model_config=model_cfg)

    result = run_custom_video(str(video), "demo prompt", config,
                              encode_image_fn=fake_encode_image,
                              preprocess_fn=fake_preprocess,
                              work_dir=str(work), trainer=trainer)
    entry = result["demo prompt"]["clip.mp4"]
    assert "bounds" in entry
    assert os.path.exists(tmp_path / "out" / "final_end_to_end_results.json")
    # features were extracted from the real frames of the synthesized video
    feats = np.load(work / "feats" / "clip.mp4.npy")
    assert feats.shape[1] == 1024 and feats.shape[0] >= 8
