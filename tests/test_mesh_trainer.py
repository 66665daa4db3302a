"""Trainer on an 8-device virtual mesh: data-parallel batches + TP params."""

import json
import os

import numpy as np
import pytest

import jax

from hirest_tpu.config import (
    DecoderConfig,
    HirestConfig,
    JointModelConfig,
    VisualEncoderConfig,
)
from hirest_tpu.data.annotations import load_annotations

VAL_PATH = "/root/reference/data/splits/all_data_val.json"
requires = pytest.mark.skipif(
    not os.path.exists(VAL_PATH) or len(jax.devices()) < 8,
    reason="needs reference data + 8 virtual devices")


@requires
@pytest.mark.slow
def test_trainer_trains_on_mesh(tmp_path):
    from hirest_tpu.train.trainer import Trainer

    anns = load_annotations(VAL_PATH)
    anns = {k: anns[k] for k in list(anns)[:2]}
    data_dir = tmp_path / "splits"
    data_dir.mkdir()
    for split in ("train", "val", "test"):
        with open(data_dir / f"all_data_{split}.json", "w") as f:
            json.dump(anns, f)
    vdir = tmp_path / "feats"
    vdir.mkdir()
    rng = np.random.default_rng(0)
    for vids in anns.values():
        for fname, a in vids.items():
            if a["relevant"] and a["clip"]:
                np.save(vdir / f"{fname}.npy",
                        rng.normal(size=(round(a["v_duration"]), 1024)).astype(np.float32))

    model_cfg = JointModelConfig(
        embed_dim=32,
        visual=VisualEncoderConfig(hidden_size=32, num_hidden_layers=1,
                                   num_attention_heads=4, intermediate_size=64),
        decoder=DecoderConfig(vocab_size=32, hidden_size=32, num_decoder_layers=1,
                              num_attention_heads=4, intermediate_size=64,
                              max_target_embeddings=32))
    cfg = HirestConfig(
        data_dir=str(data_dir), video_feature_dir=str(vdir),
        task_moment_retrieval=True, train=True,
        train_batch_size=4, eval_batch_size=4, epochs=1, lr=1e-4,
        mesh_shape="data:4,model:2", max_words=8,
        ckpt_dir=str(tmp_path / "ckpt"), frame_buckets=(512, 1024),
        pretrained_dir=str(tmp_path / "none"))

    trainer = Trainer(cfg, text_encoder_fn=lambda ids: np.ones((len(ids), 1024), np.float32),
                      verbose=False, model_config=model_cfg)
    assert trainer.mesh is not None and dict(trainer.mesh.shape) == {"data": 4, "model": 2}

    # TP actually sharded something: the FFN intermediate kernel lives on the
    # model axis
    inter = trainer.params["params"]["encoder"]["layer_0"]["ffn"]["intermediate"]["kernel"]
    assert "model" in str(inter.sharding.spec)

    results = trainer.train()
    assert "moment_retrieval" in results
    # predictions exist for every relevant+clip video
    n_vids = sum(1 for vids in anns.values() for a in vids.values()
                 if a["relevant"] and a["clip"])
    n_pred = sum(len(v) for k, v in results["moment_retrieval"].items() if k != "loss")
    assert n_pred == n_vids
