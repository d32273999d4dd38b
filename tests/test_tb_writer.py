"""TensorBoard event-writer: on-disk format validated by reading the
file back with the official tensorboard loader (available in the test
image; NOT a runtime dependency of the framework)."""
import numpy as np
import pytest

from agents_tpu.utils.tb_writer import (MultiWriter, TensorBoardEventWriter,
                                        _masked_crc)


def test_masked_crc_known_value():
  # crc32c("123456789") == 0xE3069283 (Castagnoli check value);
  # mask: ((c>>15)|(c<<17)) + 0xa282ead8 (mod 2^32).
  c = 0xE3069283
  want = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
  assert _masked_crc(b"123456789") == want


def test_events_file_readable_by_tensorboard(tmp_path):
  tb = pytest.importorskip("tensorboard.backend.event_processing."
                           "event_accumulator")

  w = TensorBoardEventWriter(str(tmp_path))
  for step in range(5):
    w.scalar("loss", 1.0 / (step + 1), step)
    w.scalar("return", 10.0 * step, step)
  w.close()

  acc = tb.EventAccumulator(str(tmp_path))
  acc.Reload()
  tags = set(acc.Tags()["scalars"])
  assert {"loss", "return"} <= tags
  loss = acc.Scalars("loss")
  assert [e.step for e in loss] == list(range(5))
  np.testing.assert_allclose([e.value for e in loss],
                             [1.0 / (s + 1) for s in range(5)], rtol=1e-6)
  ret = acc.Scalars("return")
  np.testing.assert_allclose([e.value for e in ret],
                             [10.0 * s for s in range(5)], rtol=1e-6)


def test_multi_writer_fans_out(tmp_path):
  from agents_tpu.train import JsonlSummaryWriter

  jsonl_path = tmp_path / "log.jsonl"
  w = MultiWriter(JsonlSummaryWriter(str(jsonl_path)),
                  TensorBoardEventWriter(str(tmp_path / "tb")))
  w.scalar("x", 3.0, 7)
  w.close()
  assert '"x": 3.0' in jsonl_path.read_text()
  assert any(f.name.startswith("events.out.tfevents")
             for f in (tmp_path / "tb").iterdir())


def test_histogram_readable_by_tensorboard(tmp_path):
  tb = pytest.importorskip("tensorboard.backend.event_processing."
                           "event_accumulator")

  w = TensorBoardEventWriter(str(tmp_path))
  rng = np.random.RandomState(0)
  vals = rng.normal(2.0, 1.0, size=1000)
  w.histogram("weights", vals, step=3, bins=20)
  w.histogram_from_counts("actions", [5, 0, 12], step=3)
  w.close()

  acc = tb.EventAccumulator(
      str(tmp_path),
      size_guidance={tb.HISTOGRAMS: 0})
  acc.Reload()
  tags = set(acc.Tags()["histograms"])
  assert {"weights", "actions"} <= tags

  hw = acc.Histograms("weights")[0].histogram_value
  assert hw.num == 1000
  np.testing.assert_allclose(hw.min, vals.min())
  np.testing.assert_allclose(hw.max, vals.max())
  np.testing.assert_allclose(hw.sum, vals.sum())
  np.testing.assert_allclose(sum(hw.bucket), 1000)

  ha = acc.Histograms("actions")[0].histogram_value
  np.testing.assert_allclose(list(ha.bucket), [5, 0, 12])
  np.testing.assert_allclose(list(ha.bucket_limit), [0, 1, 2])
  assert ha.num == 17
  assert ha.sum == 0 * 5 + 1 * 0 + 2 * 12


def test_multiwriter_histogram_skips_scalar_only(tmp_path):
  class ScalarOnly:
    def __init__(self):
      self.calls = []

    def scalar(self, name, value, step):
      self.calls.append((name, value, step))

    def close(self):
      pass

  so = ScalarOnly()
  w = MultiWriter(so, TensorBoardEventWriter(str(tmp_path)))
  w.histogram("h", [1.0, 2.0], 0)
  w.histogram_from_counts("c", [1, 2], 0)
  w.scalar("s", 1.0, 0)
  w.close()
  assert so.calls == [("s", 1.0, 0)]
