"""TensorBoard event-file writer: crc32c vectors + full frame/proto round-trip."""
import glob
import os
import struct

import numpy as np

from ealdm_tpu.training.tensorboard import TBEventWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            records.append(payload)
    return records


def _parse_fields(buf):
    """Minimal proto wire-format parser -> {field: [raw values]}."""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            v = buf[i : i + 8]
            i += 8
        elif wire == 5:  # 32-bit
            v = buf[i : i + 4]
            i += 4
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i : i + ln]
            i += ln
        else:
            raise AssertionError(f"wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_scalar_and_image_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.125, step=7)
    w.add_scalars({"a": 1.0, "b": 2.0}, step=8, prefix="val/")
    img = (np.random.RandomState(0).rand(16, 12, 3) * 255).astype(np.uint8)
    w.add_image("train/samples", img, step=9)
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 4  # file_version + 3 events

    head = _parse_fields(records[0])
    assert head[3][0] == b"brain.Event:2"

    ev = _parse_fields(records[1])
    assert ev[2][0] == 7  # step
    summary = _parse_fields(ev[5][0])
    val = _parse_fields(summary[1][0])
    assert val[1][0] == b"train/loss"
    assert struct.unpack("<f", val[2][0])[0] == 0.125

    ev2 = _parse_fields(records[2])
    vals = [_parse_fields(v) for v in _parse_fields(ev2[5][0])[1]]
    assert {v[1][0] for v in vals} == {b"val/a", b"val/b"}

    ev3 = _parse_fields(records[3])
    val3 = _parse_fields(_parse_fields(ev3[5][0])[1][0])
    assert val3[1][0] == b"train/samples"
    image = _parse_fields(val3[4][0])
    assert image[1][0] == 16 and image[2][0] == 12 and image[3][0] == 3
    assert image[4][0][:8] == b"\x89PNG\r\n\x1a\n"  # real PNG payload


def test_metric_logger_writes_tb(tmp_path):
    from ealdm_tpu.training.callbacks import MetricLogger

    ml = MetricLogger(str(tmp_path))
    ml.log(3, {"loss": 0.5, "skipme": "str"}, prefix="train/")
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 2
    ev = _parse_fields(records[1])
    assert ev[2][0] == 3
