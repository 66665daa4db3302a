"""bench.py host-side helpers: param-cache tree roundtrip, the TPU-queue
lock wait, and the tunnel-down fail-fast JSON (incl. last_measured
attachment). No device work — these guard the logic that runs before any
TPU client exists, where a bug costs real tunnel wall-time."""

import io
import contextlib
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_flatten_unflatten_roundtrip():
    tree = {"params": {"block_0": {"w": np.zeros((2, 3)),
                                   "b": np.ones((3,))},
                       "head": {"kernel": np.full((4,), 7.0)}}}
    flat = bench._flatten_tree(tree)
    assert set(flat) == {"params/block_0/w", "params/block_0/b",
                         "params/head/kernel"}
    back = bench._unflatten_tree(flat)
    assert back["params"]["block_0"]["w"].shape == (2, 3)
    assert back["params"]["head"]["kernel"][0] == 7.0


def test_queue_lock_stale_and_owner(monkeypatch, tmp_path):
    import time

    lock = tmp_path / "tpu_queue.lock"
    monkeypatch.setattr(bench, "QUEUE_LOCK_PATH", str(lock))
    monkeypatch.delenv("TPU_QUEUE_OWNER", raising=False)

    def elapsed(**kw):
        t0 = time.perf_counter()
        bench._wait_for_queue_lock(**kw)
        return time.perf_counter() - t0

    # no lock / stale lock (dead pid) / garbage lock: immediate
    assert elapsed() < 0.5
    lock.write_text("999999")
    assert elapsed() < 0.5
    lock.write_text("not-a-pid")
    assert elapsed() < 0.5
    # live-pid lock + exhausted wait: fail-fast JSON and exit — NEVER
    # proceed into a second concurrent TPU client
    lock.write_text(str(os.getpid()))
    monkeypatch.setattr(os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit):
            bench._wait_for_queue_lock(max_wait_s=0.0)
    out = json.loads(buf.getvalue())
    assert out["value"] == 0.0 and "concurrent" in out["error"]
    # owner env: immediate even with a live-pid lock
    monkeypatch.setenv("TPU_QUEUE_OWNER", "1")
    assert elapsed() < 0.5
    # PermissionError from kill(pid, 0) means the holder is ALIVE under
    # another uid — must keep waiting (fail fast here), never proceed
    monkeypatch.delenv("TPU_QUEUE_OWNER")
    real_kill = os.kill
    monkeypatch.setattr(
        os, "kill",
        lambda pid, sig: (_ for _ in ()).throw(PermissionError())
        if sig == 0 else real_kill(pid, sig))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit):
            bench._wait_for_queue_lock(max_wait_s=0.0)
    assert "concurrent" in json.loads(buf.getvalue())["error"]


def test_record_last_good_merges_by_metric(monkeypatch, tmp_path):
    last = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", str(last))
    bench._record_last_good({"metric": "eva_clip_frames_per_sec_per_chip",
                             "value": 270.0, "unit": "frames/sec"})
    bench._record_last_good({"metric": "step_caption_p50_latency",
                             "value": 31.0, "unit": "ms"})
    data = json.load(open(last))
    assert data["eva_clip_frames_per_sec_per_chip"]["value"] == 270.0
    assert data["step_caption_p50_latency"]["value"] == 31.0
    assert "measured_at" in data["eva_clip_frames_per_sec_per_chip"]
    # a newer result for the same metric replaces, others survive
    bench._record_last_good({"metric": "eva_clip_frames_per_sec_per_chip",
                             "value": 300.0, "unit": "frames/sec"})
    data = json.load(open(last))
    assert data["eva_clip_frames_per_sec_per_chip"]["value"] == 300.0
    assert data["step_caption_p50_latency"]["value"] == 31.0
    # pre-round-4 single-object files migrate on read
    json.dump({"metric": "video_retrieval_queries_per_sec", "value": 9.0},
              open(last, "w"))
    assert bench._read_last_good()[
        "video_retrieval_queries_per_sec"]["value"] == 9.0


def test_record_config_result_incremental_durability(monkeypatch, tmp_path):
    """VERDICT r4 #2: every ladder config's number must be durable the
    moment it completes — a mid-ladder kill keeps configs 1..k-1."""
    last = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", str(last))
    hl = {"metric": "eva_clip_frames_per_sec_per_chip", "value": 250.0,
          "unit": "frames/sec", "vs_baseline": 0.025, "mfu": 0.67,
          "config": {"batch": 128, "config": "bf16+v3+flat"}}
    bench._record_config_result("bf16+v3+flat", 128, 250.0, 0.67, hl)
    # simulate the ladder dying here: the file already holds the config
    data = json.load(open(last))
    assert data["experiments"]["bf16+v3+flat@b128"]["fps"] == 250.0
    assert data["eva_clip_frames_per_sec_per_chip"]["value"] == 250.0
    assert "measured_at" in data["eva_clip_frames_per_sec_per_chip"]
    # a slower later config records its experiment but NOT the headline
    hl2 = {**hl, "value": 200.0, "config": {"batch": 128, "config": "int8"}}
    bench._record_config_result("int8", 128, 200.0, 0.54, hl2)
    data = json.load(open(last))
    assert data["experiments"]["int8@b128"]["fps"] == 200.0
    assert data["eva_clip_frames_per_sec_per_chip"]["value"] == 250.0
    # --experiment probes (headline_result=None) never touch the headline
    bench._record_config_result("bf16+pad", 128, 400.0, 0.9, None)
    data = json.load(open(last))
    assert data["experiments"]["bf16+pad@b128"]["fps"] == 400.0
    assert data["eva_clip_frames_per_sec_per_chip"]["value"] == 250.0
    # other metrics in the file survive the merge
    bench._record_last_good({"metric": "step_caption_p50_latency",
                             "value": 31.0, "unit": "ms"})
    bench._record_config_result("bf16", 128, 260.0, 0.7,
                                {**hl, "value": 260.0})
    data = json.load(open(last))
    assert data["step_caption_p50_latency"]["value"] == 31.0
    assert data["eva_clip_frames_per_sec_per_chip"]["value"] == 260.0


def test_physics_context_fields():
    """The roofline story must be CPU-computable and self-consistent."""
    phys = bench._physics_context()
    assert phys["useful_tflops_per_frame"] == pytest.approx(0.5341, abs=2e-4)
    assert phys["bf16_ceiling_fps"] == pytest.approx(368.9, abs=0.5)
    assert phys["int8_ceiling_fps"] == pytest.approx(2 * 368.9, abs=1.0)
    assert "27.1x" in phys["target_note"]


def test_failfast_carries_physics_and_backfills_mfu(monkeypatch, tmp_path):
    """VERDICT r4 weak #2: the driver-visible fail JSON must tell the
    roofline story, and a pre-round-5 last_measured (no mfu) gets one."""
    last = tmp_path / "BENCH_LAST_GOOD.json"
    json.dump({"eva_clip_frames_per_sec_per_chip":
               {"metric": "eva_clip_frames_per_sec_per_chip",
                "value": 220.5, "measured_at": "2026-08-16T22:30:00Z"}},
              open(last, "w"))
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", str(last))
    monkeypatch.setattr(os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit):
            bench._fail_fast("tunnel down (test)")
    out = json.loads(buf.getvalue())
    assert out["bf16_ceiling_fps"] == pytest.approx(368.9, abs=0.5)
    assert "target_note" in out
    assert out["last_measured"]["mfu"] == pytest.approx(0.5978, abs=2e-3)


def test_tunnel_down_failfast_attaches_last_measured(monkeypatch, tmp_path):
    last = tmp_path / "BENCH_LAST_GOOD.json"
    json.dump({"eva_clip_frames_per_sec_per_chip":
               {"metric": "eva_clip_frames_per_sec_per_chip", "value": 321.0,
                "measured_at": "2026-08-17T12:00:00Z"},
               "step_caption_p50_latency":
               {"metric": "step_caption_p50_latency", "value": 31.0,
                "measured_at": "2026-08-17T12:00:00Z"}},
              open(last, "w"))
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", str(last))
    monkeypatch.setattr(os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    # Simulate a wedged tunnel deterministically: with jax already imported
    # and on CPU (conftest), the real jax.devices() can win the
    # t.join(timeout_s=0) race and the probe would "succeed".
    import time as _time

    import jax as _jax
    monkeypatch.setattr(_jax, "devices", lambda *a: _time.sleep(30))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit):
            bench._require_device(timeout_s=0.0)
    out = json.loads(buf.getvalue())
    assert out["value"] == 0.0
    assert out["metric"] == "eva_clip_frames_per_sec_per_chip"
    assert out["last_measured"]["value"] == 321.0
    # every recorded metric rides along so an outage zeroes nothing
    assert out["last_measured_all"]["step_caption_p50_latency"]["value"] == 31.0
    # without a recorded result the keys are absent
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", str(tmp_path / "nope"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit):
            bench._require_device(timeout_s=0.0)
    out = json.loads(buf.getvalue())
    assert "last_measured" not in out and "last_measured_all" not in out


def test_physics_context_chip_aware_peak():
    """Live runs pass the runtime chip's peak so mfu and the ceilings in
    one JSON share a basis (a v4's 275 TF/s is not v5e's 197)."""
    phys = bench._physics_context(275.0)
    assert phys["peak_basis_bf16_tflops"] == 275.0
    assert phys["bf16_ceiling_fps"] == pytest.approx(
        275.0 / phys["useful_tflops_per_frame"], rel=1e-3)
    assert "275 TF/s" in phys["target_note"]
    # default (fail-fast, no device to probe) stays the documented v5e basis
    assert bench._physics_context()["peak_basis_bf16_tflops"] == 197.0


def test_bench_frames_are_unique(tmp_path, monkeypatch):
    """The synthesis docstring guarantees byte-distinct JPEGs; a 1D roll
    cycled after 24 frames (round-5 review finding)."""
    root = bench._ensure_bench_frames(n_frames=40, size=(64, 36))
    jpgs = sorted((root / "video0").glob("*.jpg"))
    assert len(jpgs) == 40
    blobs = {p.read_bytes() for p in jpgs}
    assert len(blobs) == 40, "frames repeat within the first 40"
