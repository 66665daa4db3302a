"""Real two-process multi-host test (VERDICT round-2 item #5).

The reference exercises its gather path (dist_utils.py:96-179) with real
multi-process DDP runs; the JAX analogue here spawns TWO actual processes,
initializes `jax.distributed` over a local coordinator with gloo CPU
collectives, strides one epoch of a TaskBatcher per host
(hirest_dataset.py:604-606's DistributedSampler role), and merges the
per-host prediction accumulators with the JSON-over-process_allgather path
(parallel/collectives.py). Both ranks' merged output must equal the
single-process run byte-for-byte.

Runs entirely on CPU — no tunnel dependency.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
# env alone does not keep a process off the axon tunnel in this image;
# the config update does (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2

from hirest_tpu.parallel.collectives import (allgather_objects,
                                             merge_prediction_lists)
import pipeline_shared

local = pipeline_shared.predict_shard(num_hosts=jax.process_count(),
                                      host_id=jax.process_index())
merged = merge_prediction_lists(allgather_objects(local))
with open(out, "w") as f:
    json.dump(merged, f, sort_keys=True)
"""

PIPELINE = """
import numpy as np
import sys
sys.path.insert(0, {repo!r})
from hirest_tpu.data.batching import TaskBatcher


def make_examples():
    exs = []
    for i in range(23):
        n = 5 + (i * 7) % 40
        exs.append({{
            "task": "moment_retrieval",
            "prompt": f"prompt {{i}}",
            "fname": f"video_{{i:03d}}.mp4",
            "video_duration": float(30 + i),
            "n_frames": n,
            "video_mask": [1] * n,
            "moment_mask": [1] * max(1, n // 2) + [0] * (n - max(1, n // 2)),
        }})
    return exs


def predict_shard(num_hosts, host_id):
    batcher = TaskBatcher(make_examples(), batch_size=4, shuffle=True,
                          seed=7, num_hosts=num_hosts, host_id=host_id)
    batcher.set_epoch(3)
    preds = {{"video_fnames": [], "scores": [], "task": "moment_retrieval"}}
    for batch in batcher:
        preds["video_fnames"].extend(batch["video_fnames"])
        # a deterministic stand-in for per-example model output
        preds["scores"].extend(
            [float(m.sum()) for m in batch["moment_mask"]])
    return preds
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_stride_and_allgather_merge(tmp_path):
    (tmp_path / "pipeline_shared.py").write_text(PIPELINE.format(repo=REPO))
    (tmp_path / "worker.py").write_text(WORKER.format(repo=REPO))

    port = _free_port()
    outs = [tmp_path / "out0.json", tmp_path / "out1.json"]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # no virtual 8-device mesh in workers
    procs = [subprocess.Popen(
        [sys.executable, "worker.py", str(i), str(port), str(outs[i])],
        cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    logs = [p.communicate(timeout=180)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    merged = [json.loads(o.read_text()) for o in outs]
    # both ranks saw the identical merged result
    assert merged[0] == merged[1]

    # oracle 1: the merge equals host0-stride ++ host1-stride, computed
    # in-process (striding is seeded and deterministic)
    sys.path.insert(0, str(tmp_path))
    try:
        import pipeline_shared
        expect = {"video_fnames": [], "scores": [], "task": "moment_retrieval"}
        for host in (0, 1):
            shard = pipeline_shared.predict_shard(num_hosts=2, host_id=host)
            expect["video_fnames"].extend(shard["video_fnames"])
            expect["scores"].extend(shard["scores"])
        assert merged[0] == expect

        # oracle 2: same multiset of examples as the single-process epoch
        single = pipeline_shared.predict_shard(num_hosts=1, host_id=0)
        assert sorted(merged[0]["video_fnames"]) == sorted(single["video_fnames"])
        assert sorted(merged[0]["scores"]) == sorted(single["scores"])
        assert len(merged[0]["video_fnames"]) == 23   # nothing dropped/dup'd
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("pipeline_shared", None)
