"""Ungated driver smoke test: the default suite executes ``main()`` once.

A 2-optimizer-step run of the full driver (config validation, dataset
pipeline, tokenizer, train loop, eval, checkpoint save) on the smallest
model that exercises every stage — the CI-sized version of the env-gated
``WFT_RUN_SLOW`` end-to-end test (test_e2e_driver.py) and of the
reference's sc_debug.sh smoke flow (SURVEY.md section 4d)."""

import json
import os


def test_driver_main_smoke(tmp_path):
    import jax

    from tools.make_debug_dataset import main as make_ds
    from whisper_finetune_tpu.models import (
        ModelDimensions,
        init_params,
        save_checkpoint,
    )
    from whisper_finetune_tpu.scripts.finetune import main
    from whisper_finetune_tpu.utils import read_config

    # batch_size is per-device and the conftest mesh has 8 CPU devices ->
    # host batch 8; 16 samples = 2 optimizer steps per epoch at accum 1
    ds_dir = str(tmp_path / "ds")
    make_ds(ds_dir, n=16)

    # smallest dims that keep the real tokenizer's vocab (the dataset
    # pipeline emits multilingual token ids); 1 layer, width 32
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_head=2,
        n_text_state=32, n_text_layer=1,
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
    config["dataset"]["train_num_workers"] = 0
    # DEBUG.yaml's accum_grad_steps=8 is the GLOBAL window: local accum 1 on
    # the 8-device conftest mesh; 16 samples / host batch 8 -> 2 steps
    config["training"]["epochs"] = 1
    config["training"]["eval_steps"] = 1.0  # final eval only
    # remat off: halves the XLA-CPU compile of the tiny train step
    config["training"]["gradient_checkpointing_encoder"] = False
    config["training"]["gradient_checkpointing_decoder"] = False
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
    train_losses = [m["Train loss"] for m in metrics if "Train loss" in m]
    assert train_losses, "no train-loss records in metrics.jsonl"
    import numpy as np

    assert all(np.isfinite(v) for v in train_losses)
