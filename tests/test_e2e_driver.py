"""End-to-end driver test: full config -> main() -> checkpoints + metrics.

Slow (XLA CPU compiles the full-vocab train step in minutes), so it runs
only with WFT_RUN_SLOW=1; the fast path to the same coverage is the DEBUG
config smoke run documented in the verify skill. Mirrors the reference's
manual sc_debug.sh smoke test (SURVEY.md section 4d)."""

import json
import os

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("WFT_RUN_SLOW"),
        reason="set WFT_RUN_SLOW=1 to run the slow end-to-end driver test",
    ),
]


def test_debug_config_end_to_end(tmp_path):
    import jax

    from tools.make_debug_dataset import main as make_ds
    from whisper_finetune_tpu.models import ModelDimensions, init_params, save_checkpoint
    from whisper_finetune_tpu.scripts.finetune import main
    from whisper_finetune_tpu.utils import read_config

    ds_dir = str(tmp_path / "ds")
    make_ds(ds_dir, n=8)

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_head=2,
        n_text_state=64, n_text_layer=1,
    )
    ckpt = str(tmp_path / "mini.pt")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), dims), dims)

    config = read_config("configs/DEBUG.yaml")
    config["model"]["init_name"] = ckpt
    config["dataset"]["train_datasets"] = [ds_dir]
    config["dataset"]["val_datasets"] = [ds_dir]
    config["dataset"]["batch_size"] = 1
    config["dataset"]["batch_size_eval"] = 2
    config["dataset"]["select_n_per_v_ds"] = [4]
    config["training"]["epochs"] = 1
    config["training"]["eval_steps"] = 1
    config["save_dir"] = str(tmp_path / "out")

    main(config)

    runs = os.listdir(config["save_dir"])
    assert len(runs) == 1
    run_dir = os.path.join(config["save_dir"], runs[0])
    assert os.path.exists(os.path.join(run_dir, "last_model.pt"))
    metrics = [
        json.loads(line)
        for line in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert any("Train loss" in m for m in metrics)
    assert any("val/macro_wer" in m for m in metrics)
