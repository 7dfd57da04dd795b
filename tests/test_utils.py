import json

import numpy as np
import pandas as pd
import pytest

from aihab_clip_tpu.utils import RunLogger, StepTimer, device_memory_stats
from aihab_clip_tpu.utils.logging import _jsonable


def test_jsonable():
    assert _jsonable(np.float32(1.5)) == 1.5
    assert _jsonable(np.array([1, 2])) == [1, 2]
    assert _jsonable("x") == "x"


def test_stdout_logger_writes_jsonl(tmp_path, capsys):
    logger = RunLogger(project=None, run_name="t", config={"a": 1},
                       mode="stdout", run_dir=str(tmp_path / "run"))
    logger.log({"loss": 0.5, "acc": np.float32(0.75)})
    logger.log({"loss": 0.25})
    logger.finish()

    out = capsys.readouterr().out
    assert '"loss": 0.5' in out
    lines = (tmp_path / "run" / "log.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0])["acc"] == 0.75
    cfg = json.loads((tmp_path / "run" / "config.json").read_text())
    assert cfg["a"] == 1


def test_logger_table_and_cm(tmp_path):
    logger = RunLogger(project=None, run_name="t2", mode="stdout",
                       run_dir=str(tmp_path / "run"))
    df = pd.DataFrame({"x": [1, 2], "y": ["a", "b"]})
    logger.log_table("My Table", df)
    assert (tmp_path / "run" / "My_Table.csv").is_file()

    cm = np.array([[5, 1], [2, 7]])
    logger.log_confusion_matrix(cm, ["c0", "c1"])
    assert (tmp_path / "run" / "confusion_matrix.csv").is_file()
    assert (tmp_path / "run" / "confusion_matrix.png").is_file()
    assert (tmp_path / "run" / "confusion_matrix_norm.png").is_file()


def test_logger_off_mode(tmp_path, capsys):
    logger = RunLogger(project=None, run_name="t3", mode="off",
                       run_dir=str(tmp_path / "run"))
    logger.log({"x": 1})
    assert not logger.active
    assert capsys.readouterr().out == ""
    assert not (tmp_path / "run").exists()


def test_step_timer():
    import time

    t = StepTimer(window=10)
    for _ in range(5):
        t.tick(items=32)
        time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_step_ms"] >= 9.0
    assert s["items_per_sec"] > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    # CPU backend may not expose memory stats; both outcomes valid
    if stats is not None:
        assert "bytes_in_use" in stats


def test_assert_finite_and_nan_debugging():
    import jax.numpy as jnp
    import pytest as _pytest

    from aihab_clip_tpu.utils.debugging import (
        assert_finite,
        finite_or_raise,
        nan_debugging,
    )

    assert_finite({"a": np.ones(3), "b": {"c": np.zeros(2)}})
    with _pytest.raises(FloatingPointError, match="a.*non-finite"):
        assert_finite({"a": np.array([1.0, np.nan])}, name="grads")

    # in-jit guard
    import jax

    @jax.jit
    def f(x):
        return finite_or_raise(x, "x") * 2

    np.testing.assert_array_equal(np.asarray(f(jnp.ones(4))), 2 * np.ones(4))
    with _pytest.raises(Exception):
        f(jnp.array([1.0, np.inf]))
        jax.effects_barrier()

    with nan_debugging(True):
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans


def test_dispatch_backend_honors_default_device():
    """Fast-path dispatch gates must follow `jax.default_device` overrides
    (a Pallas kernel lowered for CPU is a hard error): the helper returns
    the override's platform inside the context and the default backend
    outside it."""
    import jax

    from aihab_clip_tpu.backend import dispatch_backend

    assert dispatch_backend() == jax.default_backend()
    with jax.default_device(jax.devices("cpu")[0]):
        assert dispatch_backend() == "cpu"
    assert dispatch_backend() == jax.default_backend()
