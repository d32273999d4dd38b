"""Native ingest ring tests: build, single/multi-process push/drain,
integrity under concurrency, and feeding the device replay."""
import multiprocessing as mp
import os
import time

import numpy as np
import pytest

from agents_tpu import specs
from agents_tpu.replay_buffers.host_ingest import (FrameCodec, IngestClient,
                                                   IngestServer,
                                                   ensure_built)

SPEC = {
    "obs": specs.ArraySpec((4,), np.float32),
    "action": specs.ArraySpec((), np.int32),
    "reward": specs.ArraySpec((), np.float32),
}


def test_build():
  assert os.path.exists(ensure_built())


def test_codec_roundtrip():
  codec = FrameCodec(SPEC)
  frames = {
      "obs": np.random.randn(5, 4).astype(np.float32),
      "action": np.arange(5, dtype=np.int32),
      "reward": np.linspace(0, 1, 5).astype(np.float32),
  }
  buf = codec.encode_batch(frames)
  assert buf.shape == (5, codec.frame_bytes)
  out = codec.decode_batch(buf)
  np.testing.assert_array_equal(out["obs"], frames["obs"])
  np.testing.assert_array_equal(out["action"], frames["action"])
  np.testing.assert_array_equal(out["reward"], frames["reward"])


def test_push_drain_same_process():
  server = IngestServer("test_ring_a", SPEC, capacity=64)
  client = IngestClient("test_ring_a", SPEC)
  frames = {
      "obs": np.ones((3, 4), np.float32),
      "action": np.asarray([1, 2, 3], np.int32),
      "reward": np.asarray([0.5, 1.5, 2.5], np.float32),
  }
  assert client.push(frames) == 3
  assert server.size() == 3
  out = server.drain()
  np.testing.assert_array_equal(out["action"], [1, 2, 3])
  assert server.size() == 0
  assert server.drain() is None
  client.close()
  server.close()


def test_backpressure_drops():
  server = IngestServer("test_ring_b", SPEC, capacity=4)
  client = IngestClient("test_ring_b", SPEC)
  frames = {
      "obs": np.zeros((6, 4), np.float32),
      "action": np.arange(6, dtype=np.int32),
      "reward": np.zeros(6, np.float32),
  }
  accepted = client.push(frames)
  assert accepted == 4
  assert server.dropped() == 2
  client.close()
  server.close()


def _producer(name, pid, n):
  client = IngestClient(name, SPEC)
  sent = 0
  while sent < n:
    b = min(8, n - sent)
    frames = {
        "obs": np.full((b, 4), pid, np.float32),
        "action": np.arange(sent, sent + b, dtype=np.int32),
        "reward": np.full(b, pid, np.float32),
    }
    pushed = client.push(frames)
    sent += pushed
    if pushed < b:
      time.sleep(0.001)
  client.close()


def test_multiprocess_producers_integrity():
  n_per = 500
  server = IngestServer("test_ring_c", SPEC, capacity=256)
  ctx = mp.get_context("fork")
  procs = [ctx.Process(target=_producer, args=("test_ring_c", pid, n_per))
           for pid in (1, 2)]
  for p in procs:
    p.start()
  got = {1: [], 2: []}
  total = 0
  deadline = time.time() + 30
  while total < 2 * n_per and time.time() < deadline:
    out = server.drain(max_frames=128)
    if out is None:
      time.sleep(0.001)
      continue
    pids = out["reward"].astype(np.int32)
    for pid in (1, 2):
      got[pid].extend(out["action"][pids == pid].tolist())
    total += len(pids)
  for p in procs:
    p.join(5)
  assert total == 2 * n_per
  # Per-producer FIFO order and completeness.
  for pid in (1, 2):
    assert got[pid] == sorted(got[pid])
    assert got[pid] == list(range(n_per))
  server.close()


def test_ingest_feeds_device_replay():
  import jax

  from agents_tpu.replay_buffers import UniformReplay

  server = IngestServer("test_ring_d", SPEC, capacity=64)
  client = IngestClient("test_ring_d", SPEC)
  client.push({
      "obs": np.random.randn(4, 4).astype(np.float32),
      "action": np.asarray([0, 1, 2, 3], np.int32),
      "reward": np.asarray([1., 2., 3., 4.], np.float32),
  })
  out = server.drain()
  replay = UniformReplay(SPEC, batch_size=4, max_length=8)
  state = replay.init()
  state = jax.jit(replay.add_batch)(state, out)
  assert int(state.count) == 1
  batch, _ = replay.sample(state, jax.random.key(0), 16)
  assert set(np.asarray(batch["action"])).issubset({0, 1, 2, 3})
  client.close()
  server.close()
