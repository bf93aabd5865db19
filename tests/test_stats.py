"""training_stats collector."""
import numpy as np
import pytest

from ealdm_tpu.training import stats


def test_report_and_collect():
    stats._counters.clear()
    stats.report("loss/a", [1.0, 2.0, 3.0])
    stats.report("loss/a", 4.0)
    stats.report("acc", [0.5, 0.5])
    c = stats.Collector(regex="loss/.*")
    assert c.num("loss/a") == 4
    assert c.mean("loss/a") == pytest.approx(2.5)
    assert c.std("loss/a") == pytest.approx(np.std([1, 2, 3, 4]))
    # counters reset after update
    stats.report("loss/a", 10.0)
    c.update()
    assert c.num("loss/a") == 1
    assert c.mean("loss/a") == pytest.approx(10.0)


def test_report0_and_dict():
    stats._counters.clear()
    stats.report0("x", 1.0, process_index=0)
    stats.report0("x", 1.0, process_index=1)  # ignored
    c = stats.Collector()
    d = c.as_dict()
    assert d["x"]["num"] == 1
