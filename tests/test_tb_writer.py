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


def test_png_gray_roundtrip():
    import struct
    import zlib

    import numpy as np

    from transformer_tts_tpu.train.tb_writer import encode_png_gray
    img = (np.arange(12, dtype=np.float32).reshape(3, 4)) / 11.0
    png = encode_png_gray(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks, decode IDAT
    off, chunks = 8, {}
    while off < len(png):
        ln = struct.unpack(">I", png[off:off + 4])[0]
        kind = png[off + 4:off + 8]
        chunks[kind] = png[off + 8:off + 8 + ln]
        off += 12 + ln
    w, h, depth, color = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert (w, h, depth, color) == (4, 3, 8, 0)
    raw = zlib.decompress(chunks[b"IDAT"])
    rows = [raw[r * 5 + 1: r * 5 + 5] for r in range(3)]  # skip filter 0
    decoded = np.frombuffer(b"".join(rows), np.uint8).reshape(3, 4)
    expected = np.round(img * 255).astype(np.uint8)
    assert (decoded == expected).all()


def test_image_events_readable_by_tensorboard(tmp_path):
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    import numpy as np
    w = TBEventWriter(str(tmp_path))
    img = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    w.add_image(5, "attention/enc", img)
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    events = list(loader_mod.EventFileLoader(files[0]).Load())
    # the loader migrates legacy image summaries to tensor events:
    # string_val = [height, width, png_bytes]
    imgs = []
    for ev in events:
        for v in ev.summary.value:
            if v.HasField("image"):
                imgs.append((ev.step, v.tag, v.image.height,
                             v.image.width, v.image.encoded_image_string))
            elif v.HasField("tensor") and v.tensor.string_val:
                sv = v.tensor.string_val
                imgs.append((ev.step, v.tag, int(sv[0]), int(sv[1]),
                             sv[2]))
    assert len(imgs) == 1
    step, tag, h, w_, png = imgs[0]
    assert step == 5 and tag == "attention/enc"
    assert (h, w_) == (8, 8)
    assert png.startswith(b"\x89PNG")
