"""Observer subsystem: JSONL default, TensorBoard via TENSORBOARD_DIR, Mongo
gating via DB_URI/DB_NAME (reference Sacred gating: train.py:28-32)."""

import json
import os

import pytest

from blp_tpu import observers


def test_jsonl_observer_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    obs = observers.JsonlObserver(path)
    obs.log(1, loss=0.5)
    obs.log(2, mrr=0.25, note=3)
    rows = [json.loads(line) for line in open(path)]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 0.5
    assert rows[1]["mrr"] == 0.25 and "time" in rows[1]


def test_observer_set_from_env_default(tmp_path, monkeypatch):
    monkeypatch.delenv("TENSORBOARD_DIR", raising=False)
    monkeypatch.delenv("DB_URI", raising=False)
    obs = observers.ObserverSet.from_env(str(tmp_path), "run0")
    assert len(obs.observers) == 1
    obs.log(0, x=1.0)
    obs.log_config({"dim": 128})
    obs.close()
    assert os.path.exists(tmp_path / "metrics-run0.jsonl")


def test_tensorboard_observer_attached(tmp_path, monkeypatch):
    pytest.importorskip("torch.utils.tensorboard")
    monkeypatch.setenv("TENSORBOARD_DIR", str(tmp_path / "tb"))
    monkeypatch.delenv("DB_URI", raising=False)
    obs = observers.ObserverSet.from_env(str(tmp_path), "run1")
    assert len(obs.observers) == 2
    obs.log(3, loss=1.25)
    obs.log_config({"model": "blp"})
    obs.close()
    # SummaryWriter creates an events file under <dir>/<run_id>.
    files = list((tmp_path / "tb" / "run1").iterdir())
    assert files, "TensorBoard observer wrote no events file"


def test_mongo_observer_raises_cleanly(monkeypatch):
    try:
        import pymongo  # noqa: F401
        pytest.skip("pymongo installed; gating error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="pymongo"):
        observers.MongoObserver("mongodb://x", "db", "run")


def test_optional_sink_failure_is_nonfatal(tmp_path):
    class Boom:
        def log(self, step, **kw):
            raise RuntimeError("sink down")

        def log_config(self, c):
            raise RuntimeError("sink down")

        def close(self):
            raise RuntimeError("sink down")

    primary = observers.JsonlObserver(str(tmp_path / "m.jsonl"))
    obs = observers.ObserverSet([primary, Boom()])
    obs.log(1, loss=2.0)  # must not raise
    obs.log_config({})
    obs.close()
    assert json.loads(open(tmp_path / "m.jsonl").readline())["loss"] == 2.0


def test_primary_sink_failure_raises(tmp_path):
    """The primary JSONL sink must not fail silently — from log() OR
    log_config() (a run with an unwritable output dir should die loudly at
    config time, not log nothing)."""

    class DeadPrimary:
        def log(self, step, **kw):
            raise OSError("disk full")

        def log_config(self, c):
            raise OSError("disk full")

    obs = observers.ObserverSet([DeadPrimary()])
    with pytest.raises(OSError):
        obs.log(1, loss=2.0)
    with pytest.raises(OSError):
        obs.log_config({"dim": 128})
