"""TB event writer round-trip against the official TensorBoard reader."""

import glob
import os

import pytest

from transformer_tts_tpu.train.tb_writer import TBEventWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes([0] * 32)) == 0x8A9136AA


def test_events_readable_by_tensorboard(tmp_path):
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss_total": 3.5, "loss_f0": 1.25})
    w.add_scalars(2, {"loss_total": 2.0})
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(loader_mod.EventFileLoader(files[0]).Load())
    # file_version header + 2 scalar events
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            # EventFileLoader migrates legacy simple_value events to
            # tensor form (data_compat); accept either
            if v.HasField("tensor"):
                scalars[(ev.step, v.tag)] = v.tensor.float_val[0]
            else:
                scalars[(ev.step, v.tag)] = v.simple_value
    assert scalars[(1, "loss_total")] == 3.5
    assert scalars[(1, "loss_f0")] == 1.25
    assert scalars[(2, "loss_total")] == 2.0


def test_metrics_logger_writes_both(tmp_path):
    from transformer_tts_tpu.utils import MetricsLogger
    m = MetricsLogger(str(tmp_path))
    m.log(5, loss_total=1.0, steps_per_sec=2.0)
    m.close()
    assert os.path.exists(os.path.join(str(tmp_path), "train.jsonl"))
    assert glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
