"""dnnlib-style support utilities (ealdm_tpu/utils/dnn.py)."""
import io
import os
import sys

import jax.numpy as jnp
import pytest

from ealdm_tpu.utils.dnn import (
    EasyDict, Logger, format_time, open_url, print_module_summary,
)


def test_easydict_attribute_access():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a


def test_logger_tees_to_file(tmp_path, capsys):
    log = tmp_path / "log.txt"
    with Logger(str(log)):
        print("hello tee")
    assert "hello tee" in log.read_text()
    assert sys.stdout is not None  # restored


def test_format_time():
    assert format_time(5) == "5s"
    assert format_time(65) == "1m 05s"
    assert format_time(3725) == "1h 02m 05s"
    assert format_time(90061) == "1d 01h 01m"


def test_open_url_local_and_cached(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"abc")
    assert open_url(str(f)).read() == b"abc"
    assert open_url(f"file://{f}", return_filename=True) == str(f)

    import hashlib
    url = "https://example.com/weights.pkl"
    cache = tmp_path / "cache"
    cache.mkdir()
    md5 = hashlib.md5(url.encode()).hexdigest()
    (cache / f"{md5}_weights.pkl").write_bytes(b"W")
    assert open_url(url, cache_dir=str(cache)).read() == b"W"
    with pytest.raises(FileNotFoundError):
        open_url("https://example.com/missing", cache_dir=str(cache))


def test_print_module_summary_counts_params():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8, name="d1")(x)
            return nn.Dense(2, name="d2")(x)

    buf = io.StringIO()
    out = print_module_summary(M(), (jnp.zeros((1, 4)),), file=buf)
    assert "TOTAL" in out
    # 4*8+8 + 8*2+2 = 58
    assert "58" in out.replace(",", "")
    assert "d1" in out and "d2" in out
