"""Runtime facade tests: rank gating, metrics JSONL sink, wandb-disabled
mode (the reference tests its runtime by monkeypatching globals —
tests/test_training_utils.py; same technique here)."""

import json

import pytest

import whisper_finetune_tpu.runtime as rt


@pytest.fixture(autouse=True)
def _reset_runtime():
    yield
    rt.cleanup()
    rt.IS_MAIN = True
    rt.RANK = 0


def test_print_once_gated(capsys, monkeypatch):
    rt.print_once("hello")
    assert "hello" in capsys.readouterr().out
    monkeypatch.setattr(rt, "IS_MAIN", False)
    rt.print_once("hidden")
    assert "hidden" not in capsys.readouterr().out


def test_metrics_jsonl_sink(tmp_path):
    rt.setup_wandb(config={"save_dir": str(tmp_path)}, mode="disabled")
    rt.log({"Train loss": 1.5, "Learning rate": 1e-4}, step=3)
    rt.log({"val/macro_wer": 0.25}, step=4)
    rt.cleanup()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["_step"] == 3 and lines[0]["Train loss"] == 1.5
    assert lines[1]["val/macro_wer"] == 0.25


def test_log_noop_on_non_main(tmp_path, monkeypatch):
    rt.setup_wandb(config={"save_dir": str(tmp_path)}, mode="disabled")
    monkeypatch.setattr(rt, "IS_MAIN", False)
    rt.log({"x": 1}, step=0)
    rt.cleanup()
    assert open(tmp_path / "metrics.jsonl").read() == ""


def test_non_jsonable_values_coerced(tmp_path):
    import numpy as np

    rt.setup_wandb(config={"save_dir": str(tmp_path)}, mode="disabled")
    rt.log({"arr_scalar": np.float32(2.5)}, step=0)
    rt.cleanup()
    rec = json.loads(open(tmp_path / "metrics.jsonl").readline())
    assert rec["arr_scalar"] == 2.5


def test_barrier_noop_single_process():
    rt.barrier()  # must not raise without distributed init


def test_wandb_wrappers_safe_without_wandb():
    rt.save_wandb_file("/nonexistent")
    rt.update_wandb_config({"a": 1})
    rt.set_wandb_summary("k", "v")
    rt.finish_wandb()
