"""Crash-resume realism: SIGKILL a build subprocess mid-flight, resume in
a fresh process, and assert the index equals a clean build (the
restart-upgrade conformance analog, `qa/restart-upgrade/`)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.state.manifest import completed_segments, verify_index
from opensearch_jvector_ray.synth import generate_conversations


def _write_corpus(tmp_path, n=3000):
    corpus = generate_conversations(np.arange(n))
    src = str(tmp_path / "input")
    os.makedirs(src)
    per = corpus.num_rows // 12 + 1
    for i in range(12):
        part = corpus.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(src, f"p{i:02d}.parquet"),
                           row_group_size=max(256, part.num_rows // 4))
    return corpus, src


BUILD_SNIPPET = """
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
res = build_index(sys.argv[1], sys.argv[2],
                  EngineConfig(num_segments=48), IndexSpec())
print("BUILT", res.segments_built, res.segments_skipped)
ray.shutdown()
"""


def test_sigkill_mid_build_then_resume(tmp_path):
    corpus, src = _write_corpus(tmp_path)
    idx = str(tmp_path / "idx")
    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    # start a slow (2-cpu) build and SIGKILL the whole process group while
    # segment tasks are in flight
    proc = subprocess.Popen([sys.executable, "-c", BUILD_SNIPPET, src, idx],
                            env=env, cwd="/root/repo",
                            start_new_session=True,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(completed_segments(idx)) >= 3:
            break
        if proc.poll() is not None:
            break                      # finished before we could kill: fine
        time.sleep(0.2)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    n_done = len(completed_segments(idx))

    # resume in-process (fresh Ray session is the pytest fixture's)
    res = build_index(src, idx, EngineConfig(num_segments=48), IndexSpec())
    assert res.segments_skipped >= min(n_done, res.num_segments)
    assert verify_index(idx)["ok"]

    clean = str(tmp_path / "clean")
    build_index(src, clean, EngineConfig(num_segments=48), IndexSpec())
    q = {"a": "data model search index", "b": "zebra quantum nebula"}
    pd.testing.assert_frame_equal(IndexSearcher(idx).search(q, k=12),
                                  IndexSearcher(clean).search(q, k=12),
                                  atol=1e-12)


SPILL_SNIPPET = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False,
         object_store_memory=256 * 1024 * 1024,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
# shuffle build (forced): every row moves through the tiny object store
ds = rd.read_parquet(sys.argv[1])
res = build_index(ds, sys.argv[2], EngineConfig(num_segments=16), IndexSpec(),
                  mode="shuffle")
print("ROWS", res.num_docs)
ray.shutdown()
"""


def test_shuffle_build_spills_under_tiny_object_store(tmp_path):
    """The all-to-all path must survive object-store pressure by spilling
    (backpressure, not OOM): a 430MB+ shuffle through a 256MB store."""
    src = "/tmp/ojr_synth/transcripts_seed42_n20000"   # ~240k turns, cached
    if not os.path.exists(src):
        import pytest
        pytest.skip("bench corpus not synthesized in this environment")
    idx = str(tmp_path / "idx")
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    out = subprocess.run([sys.executable, "-c", SPILL_SNIPPET, src, idx],
                         env=env, cwd="/root/repo", capture_output=True,
                         text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROWS" in out.stdout
    assert verify_index(idx)["ok"]
