"""Rate limiting for the host ingest -> learner path.

Reference: Reverb's MinSize / SampleToInsertRatio limiters as used by
``tf_agents/train/utils/replay_buffer_utils.py:29-56``. Both directions
are covered: a fast trainer blocks when starved, a fast collector blocks
once the trainer falls behind the target ratio (and the shm ring's
push_blocking waits instead of dropping).
"""
import threading
import time

import numpy as np
import pytest

from agents_tpu.replay_buffers.rate_limiter import (MinSize,
                                                    SampleToInsertRatio)


def test_min_size_blocks_until_filled():
  lim = MinSize(min_size_to_sample=4)
  assert not lim.can_sample(1)
  assert not lim.sample(1, timeout=0.05)      # starved trainer times out
  assert lim.insert(3)                        # inserts never block
  assert not lim.can_sample(1)
  assert lim.insert(1)
  assert lim.can_sample(1)
  assert lim.sample(1, timeout=0.05)


def test_min_size_unblocks_waiting_sampler():
  lim = MinSize(min_size_to_sample=2)
  got = []

  def trainer():
    got.append(lim.sample(1, timeout=5.0))

  t = threading.Thread(target=trainer)
  t.start()
  time.sleep(0.05)
  assert not got                              # still blocked
  lim.insert(2)
  t.join(timeout=5.0)
  assert got == [True]


def test_ratio_blocks_fast_trainer():
  # 2 samples per insert, min size 2, slack 4 samples.
  lim = SampleToInsertRatio(samples_per_insert=2.0, min_size_to_sample=2,
                            error_buffer=4.0)
  lim.insert(2)                               # d = 4; bounds [0, 8]
  assert lim.can_sample(4)                    # d - 4 = 0 >= min_diff
  assert lim.sample(4)
  assert not lim.can_sample(1)                # d = 0, would undershoot
  assert not lim.sample(1, timeout=0.05)
  lim.insert(1)                               # d = 2
  assert lim.sample(2, timeout=0.05)


def test_ratio_blocks_fast_collector():
  lim = SampleToInsertRatio(samples_per_insert=2.0, min_size_to_sample=2,
                            error_buffer=4.0)
  lim.insert(2)                               # min-size fill always allowed
  assert lim.can_insert(2)                    # d = 4 -> 8 <= max_diff
  lim.insert(2)                               # d = 8 = max_diff
  assert not lim.can_insert(1)                # trainer is behind: block
  assert not lim.insert(1, timeout=0.05)
  done = []

  def collector():
    done.append(lim.insert(1, timeout=5.0))

  t = threading.Thread(target=collector)
  t.start()
  time.sleep(0.05)
  assert not done
  lim.sample(4)                               # trainer catches up, d = 4
  t.join(timeout=5.0)
  assert done == [True]


def test_ratio_deadlock_guard():
  with pytest.raises(ValueError):
    SampleToInsertRatio(samples_per_insert=10.0, min_size_to_sample=1,
                        error_buffer=(0.0, 5.0))


def test_push_blocking_waits_for_ring_space():
  from agents_tpu.replay_buffers.host_ingest import (IngestClient,
                                                     IngestServer)
  from agents_tpu.specs import array_spec

  spec = array_spec.ArraySpec((2,), np.float32, "x")
  name = f"rl_test_{time.time_ns() & 0xffffffff:x}"
  server = IngestServer(name, spec, capacity=8)
  client = IngestClient(name, spec)
  try:
    frames = np.arange(16, dtype=np.float32).reshape(8, 2)
    assert client.push(frames) == 8            # fill the ring
    # Non-blocking push on a full ring drops (and counts it).
    assert client.push(frames[:1]) == 0
    assert server.dropped() == 1

    sent = []

    def producer():
      sent.append(client.push_blocking(frames[:4], timeout=5.0))

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.05)
    assert not sent                            # blocked on full ring
    out = server.drain(max_frames=4)
    assert out is not None
    t.join(timeout=5.0)
    assert sent == [4]
    assert server.dropped() == 1               # blocking path never drops
    # Timeout path: ring is full again (8 - 4 drained + 4 pushed) and
    # there is no consumer, so a bounded wait accepts nothing.
    assert client.push_blocking(frames[:2], timeout=0.05) == 0
  finally:
    client.close()
    server.close()
