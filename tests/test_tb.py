"""TensorBoard event emitter (io/tb.py) — wire-format round trip.

The reference gates TB image summaries behind `use_tb`
(`/root/reference/spnet/callbacks.py:88-90,239-248`); ours writes the
event files without importing TensorFlow, so the framing + protobuf
encoding are pinned here (CRC-verified round trip, and a TensorFlow
cross-read when TF is importable in this environment).
"""

import numpy as np

from spnet_tpu.io.tb import TBWriter, read_events


def test_tb_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalar("loss/train", 0.125, 3)
    w.add_scalar("metrics/ring_acc", 96.5, 3)
    img = (np.arange(32 * 48, dtype=np.uint8).reshape(32, 48) % 251)
    w.add_image("val/overlay", img, 3)
    w.close()

    events = list(read_events(w.path))
    scalars = {(t, s): v for s, t, k, v in events if k == "scalar"}
    assert abs(scalars[("loss/train", 3)] - 0.125) < 1e-6
    assert abs(scalars[("metrics/ring_acc", 3)] - 96.5) < 1e-4
    images = [(s, t, v) for s, t, k, v in events if k == "image"]
    assert len(images) == 1
    step, tag, png = images[0]
    assert (step, tag) == (3, "val/overlay")
    # decode the PNG payload and compare pixels
    import io as _io

    from PIL import Image

    arr = np.asarray(Image.open(_io.BytesIO(png)))
    np.testing.assert_array_equal(arr, img)


def test_tb_readable_by_tensorflow(tmp_path):
    """Cross-check with the real TF record reader when available."""
    try:
        from tensorflow.core.util import event_pb2
        from tensorflow.python.lib.io import tf_record
    except Exception:
        import pytest

        pytest.skip("tensorflow not importable")
    w = TBWriter(str(tmp_path))
    w.add_scalar("x", 1.5, 7)
    w.close()
    recs = list(tf_record.tf_record_iterator(w.path))
    assert len(recs) == 2  # file_version + scalar
    ev = event_pb2.Event.FromString(recs[0])
    assert ev.file_version == "brain.Event:2"
    ev = event_pb2.Event.FromString(recs[1])
    assert ev.step == 7
    assert ev.summary.value[0].tag == "x"
    assert abs(ev.summary.value[0].simple_value - 1.5) < 1e-6
