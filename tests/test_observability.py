import json
import time

import numpy as np

from hirest_tpu.parallel.collectives import allgather_objects, merge_prediction_lists
from hirest_tpu.utils.profiling import MetricsLogger, PhaseTimer, trace


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0.01
    assert "b" in rep
    t.reset()
    assert t.report() == {}


def test_metrics_logger(tmp_path):
    path = tmp_path / "metrics.jsonl"
    log = MetricsLogger(str(path))
    log.log(1, loss=0.5, task="mr")
    log.log(2, loss=np.float32(0.25))
    log.close()
    lines = [json.loads(x) for x in path.read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["loss"] == 0.25

    # disabled logger is a no-op
    MetricsLogger(None).log(1, loss=1.0)


def test_trace_noop():
    with trace(None):
        pass


def test_allgather_single_process():
    out = allgather_objects({"predictions": [1, 2], "loss": 0.5})
    assert out == [{"predictions": [1, 2], "loss": 0.5}]


def test_merge_prediction_lists():
    shards = [
        {"predictions": [1, 2], "fnames": ["a"], "loss": 0.5},
        {"predictions": [3], "fnames": ["b"], "loss": 0.7},
    ]
    merged = merge_prediction_lists(shards)
    assert merged["predictions"] == [1, 2, 3]
    assert merged["fnames"] == ["a", "b"]
