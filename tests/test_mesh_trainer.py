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


@requires
def test_uneven_final_batch_pads_and_shards(tmp_path):
    """A final partial batch must be padded to the static batch size, land
    with the intended P('data') sharding on every array, and contribute only
    its real rows to predictions (round-1 weak #4)."""
    from jax.sharding import PartitionSpec as P

    from hirest_tpu.train.trainer import Trainer

    anns = load_annotations(VAL_PATH)
    anns = {k: anns[k] for k in list(anns)[:3]}
    data_dir = tmp_path / "splits"
    data_dir.mkdir()
    for split in ("train", "val", "test"):
        with open(data_dir / f"all_data_{split}.json", "w") as f:
            json.dump(anns, f)
    vdir = tmp_path / "feats"
    vdir.mkdir()
    rng = np.random.default_rng(0)
    n_vids = 0
    for vids in anns.values():
        for fname, a in vids.items():
            if a["relevant"] and a["clip"]:
                n_vids += 1
                np.save(vdir / f"{fname}.npy",
                        rng.normal(size=(round(a["v_duration"]), 1024)).astype(np.float32))

    model_cfg = JointModelConfig(
        embed_dim=32,
        visual=VisualEncoderConfig(hidden_size=32, num_hidden_layers=1,
                                   num_attention_heads=4, intermediate_size=64),
        decoder=DecoderConfig(vocab_size=32, hidden_size=32, num_decoder_layers=1,
                              num_attention_heads=4, intermediate_size=64,
                              max_target_embeddings=32))
    bs = 4
    assert n_vids % bs != 0, "test needs a partial final batch"
    cfg = HirestConfig(
        data_dir=str(data_dir), video_feature_dir=str(vdir),
        task_moment_retrieval=True,
        train_batch_size=bs, eval_batch_size=bs, epochs=1, lr=1e-4,
        mesh_shape="data:4,model:2", max_words=8,
        ckpt_dir=str(tmp_path / "ckpt"), frame_buckets=(512, 1024),
        pretrained_dir=str(tmp_path / "none"))
    trainer = Trainer(cfg, text_encoder_fn=lambda ids: np.ones((len(ids), 1024), np.float32),
                      verbose=False, model_config=model_cfg)

    batcher = trainer.loaders["test"]["moment_retrieval"]
    batches = list(batcher)
    last = batches[-1]
    # the partial batch was padded to the static size with a batch_mask
    assert last["vis_feats"].shape[0] == bs
    assert "batch_mask" in last and last["batch_mask"].sum() < bs

    arrs = trainer._prepare(last, "moment_retrieval")
    for k, v in arrs.items():
        spec = v.sharding.spec
        assert len(spec) >= 1 and spec[0] == "data", (k, spec)

    # predictions drop the padded rows
    preds = trainer.predict(batcher, "moment_retrieval")
    n_pred = sum(len(v) for k, v in preds.items() if k != "loss")
    assert n_pred == n_vids


def test_mesh_requires_divisible_batch_size(tmp_path):
    from hirest_tpu.train.trainer import Trainer

    cfg = HirestConfig(train_batch_size=5, eval_batch_size=4,
                       mesh_shape="data:4,model:2")
    with pytest.raises(ValueError, match="divisible"):
        Trainer(cfg, text_encoder_fn=lambda ids: np.ones((len(ids), 1024), np.float32),
                verbose=False,
                model_config=JointModelConfig(
                    embed_dim=32,
                    visual=VisualEncoderConfig(hidden_size=32, num_hidden_layers=1,
                                               num_attention_heads=4,
                                               intermediate_size=64),
                    decoder=DecoderConfig(vocab_size=32, hidden_size=32,
                                          num_decoder_layers=1,
                                          num_attention_heads=4,
                                          intermediate_size=64,
                                          max_target_embeddings=32)))
