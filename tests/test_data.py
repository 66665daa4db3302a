"""Data layer tests against the real reference annotation JSONs."""

import json
import os

import numpy as np
import pytest

from hirest_tpu.data.annotations import build_examples, caption_targets, load_annotations
from hirest_tpu.data.batching import TaskBatcher, collate, pick_bucket
from hirest_tpu.data.features import FeatureStore
from hirest_tpu.data.multitask import MultitaskSchedule
from hirest_tpu.data.srt import parse_srt

VAL_PATH = "/root/reference/data/splits/all_data_val.json"
requires_data = pytest.mark.skipif(not os.path.exists(VAL_PATH),
                                   reason="reference data not mounted")


@requires_data
def test_build_examples_counts_and_golden():
    anns = load_annotations(VAL_PATH)
    mr = build_examples(anns, "moment_retrieval")
    ms_eval = build_examples(anns, "moment_segmentation")
    ms_train = build_examples(anns, "moment_segmentation", is_train=True)
    sc = build_examples(anns, "step_captioning")

    # every relevant+clip video yields exactly one MR example
    n_videos = sum(1 for vids in anns.values() for a in vids.values()
                   if a["relevant"] and a["clip"])
    assert len(mr) == n_videos
    assert len(ms_eval) <= n_videos  # steps==0 videos are skipped
    # teacher-forcing expansion: one example per GT boundary interval
    assert len(ms_train) > len(ms_eval)
    # one SC example per step
    n_steps = sum(len(a["steps"]) for vids in anns.values() for a in vids.values()
                  if a["relevant"] and a["clip"] and len(a["steps"]) > 0)
    assert len(sc) == n_steps

    # golden sample: Make Oatmeal Pancake Mix / 5V3dI2zp1xA.mp4
    g = [e for e in mr if e["fname"] == "5V3dI2zp1xA.mp4"
         and e["prompt"] == "Make Oatmeal Pancake Mix"][0]
    assert g["video_duration"] == 207
    assert g["moment_retrieval_start_target"] == 50
    assert g["moment_retrieval_end_target"] == 121
    assert g["video_mask"].shape == (207,)

    g_ms = [e for e in ms_eval if e["fname"] == "5V3dI2zp1xA.mp4"][0]
    assert g_ms["moment_bound_frames"] == [50, 121]
    assert g_ms["moment_mask"][50:122].sum() == 72
    assert g_ms["moment_mask"].sum() == 72
    assert g_ms["all_bound_frames"] == [50, 58, 67, 80, 104, 121]

    g_sc = [e for e in sc if e["fname"] == "5V3dI2zp1xA.mp4"]
    assert len(g_sc) == 5
    assert g_sc[0]["target_text_raw"] == "take grinned oats flour"
    # SC mask covers [start, end] inclusive
    assert g_sc[0]["moment_mask"][50:59].sum() == 9


@requires_data
def test_ms_train_teacher_forcing_expansion():
    anns = load_annotations(VAL_PATH)
    ms_train = build_examples(anns, "moment_segmentation", is_train=True)
    ex = [e for e in ms_train if e["fname"] == "5V3dI2zp1xA.mp4"]
    # 6 boundaries -> 5 intervals
    assert len(ex) == 5
    # first interval: prev boundary only at moment start
    assert ex[0]["prev_boundary_mask"].sum() == 1
    assert ex[0]["prev_boundary_mask"][50] == 1
    assert ex[0]["moment_segmentation_target"] == 58
    # moment mask runs from current step start to moment end
    assert ex[2]["moment_mask"][67:122].all()
    assert ex[2]["moment_mask"][:67].sum() == 0


def test_caption_targets_layout():
    class FakeTok:
        def tokenize(self, text):
            return text.split()

        def convert_tokens_to_ids(self, toks):
            table = {"[CLS]": 101, "[SEP]": 102}
            return [table.get(t, 10 + len(t)) for t in toks]

    out = caption_targets(FakeTok(), "add salt now", max_words=6)
    assert out["input_caption_ids"].tolist()[:4] == [101, 13, 14, 13]
    assert out["output_caption_ids"].tolist()[:4] == [13, 14, 13, 102]
    assert out["decoder_mask"].tolist() == [1, 1, 1, 1, 0, 0]


def test_srt_parser():
    content = """1
00:00:01,500 --> 00:00:04,200
hello there

2
00:00:04,200 --> 00:01:02,000
second line
continued
"""
    subs = parse_srt(content)
    assert len(subs) == 2
    assert subs[0].start_seconds == 1 and subs[0].end_seconds == 4
    assert subs[1].end_seconds == 62
    assert subs[1].text == "second line\ncontinued"


def test_feature_store_with_synthetic_npy(tmp_path):
    vdir = tmp_path / "feats"
    vdir.mkdir()
    np.save(vdir / "vid1.mp4.npy", np.random.randn(100, 16).astype(np.float32))
    adir = tmp_path / "asr"
    adir.mkdir()
    (adir / "vid1.srt").write_text(
        "1\n00:00:00,000 --> 00:00:30,000\nfirst\n\n"
        "2\n00:00:30,000 --> 00:01:40,000\nsecond\n")
    afdir = tmp_path / "asr_feats_minilm"
    afdir.mkdir()
    np.save(afdir / "vid1.npy", np.stack([np.ones(8), 2 * np.ones(8)]).astype(np.float32))

    store = FeatureStore(str(vdir), str(adir), str(afdir))
    v = store.visual("vid1.mp4")
    assert v.shape == (100, 16)
    assert store.visual("vid1.mp4", 20).shape == (20, 16)
    a = store.asr("vid1.mp4", 100)
    assert a.shape == (100, 8)
    assert (a[:30] == 1).all() and (a[30:100] == 2).all()


@requires_data
def test_collate_buckets_and_batcher(tmp_path):
    anns = load_annotations(VAL_PATH)
    mr = build_examples(anns, "moment_retrieval")[:7]
    # synthesize features for these videos
    vdir = tmp_path / "feats"
    vdir.mkdir()
    for e in mr:
        np.save(vdir / f"{e['fname']}.npy",
                np.random.randn(e["video_duration"], 8).astype(np.float32))
    store = FeatureStore(str(vdir))

    batch = collate(mr[:4], store, buckets=(128, 256, 512, 1024))
    T = batch["vis_feats"].shape[1]
    assert T in (128, 256, 512, 1024)
    assert batch["video_mask"].shape == (4, T)
    assert batch["moment_mask"].shape == (4, T)
    # masks reflect true lengths
    for i, e in enumerate(mr[:4]):
        assert batch["video_mask"][i].sum() == min(e["video_duration"], T)

    b = TaskBatcher(mr, batch_size=3, store=store, buckets=(256, 512, 1024),
                    shuffle=True, seed=1)
    batches = list(b)
    assert sum(len(x["prompts"]) for x in batches) == 7
    # host sharding partitions examples
    b0 = TaskBatcher(mr, 3, store, (256, 512, 1024), num_hosts=2, host_id=0)
    b1 = TaskBatcher(mr, 3, store, (256, 512, 1024), num_hosts=2, host_id=1)
    n0 = sum(len(x["prompts"]) for x in b0)
    n1 = sum(len(x["prompts"]) for x in b1)
    assert n0 + n1 == 7


def test_multitask_schedule_parity():
    """Schedule order must equal the reference MultitaskLoader's:
    task list built per loader length, shuffled by random.Random(epoch),
    consumed by pop() from the end."""
    import random as pyrandom

    class DummyBatcher:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([{"i": i} for i in range(self.n)])

    batchers = {"a": DummyBatcher(3), "b": DummyBatcher(2)}
    sched = MultitaskSchedule(batchers, shuffle=True)
    sched.set_epoch(5)

    want = ["a"] * 3 + ["b"] * 2
    pyrandom.Random(5).shuffle(want)
    assert sched.epoch_tasks == want
    assert len(sched) == 5


def test_pick_bucket():
    assert pick_bucket(100, (64, 128, 256)) == 128
    assert pick_bucket(64, (64, 128)) == 64
    with pytest.raises(ValueError):
        pick_bucket(300, (64, 128, 256))


def test_prefetch_iterator():
    from hirest_tpu.data.prefetch import prefetch

    assert list(prefetch(range(10), depth=3)) == list(range(10))
    assert list(prefetch(iter([]), depth=2)) == []

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


@requires_data
def test_full_train_split_scale():
    """Full-scale smoke over the real train split: counts stay stable and
    example building stays fast (sub-second class, not minutes)."""
    import time

    train = load_annotations("/root/reference/data/splits/all_data_train.json")
    t0 = time.time()
    counts = {t: len(build_examples(train, t, is_train=True))
              for t in ("moment_retrieval", "moment_segmentation",
                        "step_captioning")}
    assert counts == {"moment_retrieval": 865, "moment_segmentation": 4128,
                      "step_captioning": 4145}
    assert time.time() - t0 < 30


def test_host_striding_pad_hosts_equalizes_counts():
    """pad_hosts=True (trainer loaders) wrap-pads so every host iterates
    the same number of indices/batches (DistributedSampler parity —
    unequal counts desync collective steps); pad_hosts=False (independent
    offline inference sharding) keeps exact partitioning, no duplicates."""
    from hirest_tpu.data.batching import TaskBatcher

    ex = [{"task": "t", "prompt": "p", "fname": f"v{i}", "video_duration": 1.0,
           "n_frames": 4, "video_mask": [1] * 4, "moment_mask": [1] * 4}
          for i in range(9)]
    padded = [TaskBatcher(ex, batch_size=4, num_hosts=2, host_id=h,
                          pad_hosts=True) for h in (0, 1)]
    assert [len(b._indices()) for b in padded] == [5, 5]
    assert len(padded[0]) == len(padded[1])
    # the wrap duplicates come from the front of the permutation
    assert sorted(np.concatenate([b._indices() for b in padded])[:10].tolist()
                  ) == sorted(list(range(9)) + [int(padded[1]._indices()[-1])])

    exact = [TaskBatcher(ex, batch_size=4, num_hosts=2, host_id=h)
             for h in (0, 1)]
    both = np.concatenate([b._indices() for b in exact])
    assert sorted(both.tolist()) == list(range(9))  # partition, no dup


def test_collate_reconciles_short_features():
    """A feature file SHORTER than the n_frames metadata must shrink every
    frame-indexed view consistently: video_mask, moment_mask, and the MR
    bin targets all stay inside the real feature range (otherwise the loss
    trains on zero-feature frames that predict-time masking makes
    unreachable)."""
    import tempfile

    from hirest_tpu.data.batching import collate
    from hirest_tpu.data.features import FeatureStore

    tmp = tempfile.mkdtemp()
    np.save(os.path.join(tmp, "v.npy"),
            np.ones((6, 8), np.float32))  # 6 real rows < 10 meta
    store = FeatureStore(tmp, None, None)

    e = {"task": "moment_retrieval", "prompt": "p", "fname": "v",
         "video_duration": 10.0, "n_frames": 10, "n_model_frames": -1,
         "video_mask": [1] * 10, "moment_mask": [0] * 8 + [1, 1],
         "moment_retrieval_start_target": 8,
         "moment_retrieval_end_target": 9}
    b = collate([e], store, buckets=(16,))
    assert b["video_mask"][0].sum() == 6
    assert not b["moment_mask"][0, 6:].any()
    assert b["moment_mask"][0].any()              # degenerate-guard kept 1
    assert b["moment_retrieval_start_target"][0] <= 5
    assert b["moment_retrieval_end_target"][0] <= 5
