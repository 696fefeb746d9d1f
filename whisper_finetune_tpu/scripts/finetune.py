"""Training driver: ``python -m whisper_finetune_tpu.scripts.finetune --config x.yaml``.

The TPU-native counterpart of the reference's orchestration script
(src/whisper_finetune/scripts/finetune.py:310-762) with the identical YAML
schema and run flow: distributed setup, seeding (seed + process index,
reference :325), global->local accumulation mapping (:327-330), model build
and surgery (:388-512), dataset processing (:514-576), step math (:578-588),
samplers (:594-629), optimizer/scheduler (:680-688), observability (:712-723),
the train/eval/checkpoint loop (:126-229) and the peak-memory report
(:737-744).

Structural differences, all TPU-first:
* no DDP wrap / GradScaler / autocast — parallelism is a ``shard_map`` over a
  device mesh inside one jitted step; precision policy is the model's
  (fp32 params, bf16 compute),
* gradient checkpointing / stochastic depth / deep SpecAugment / LoRA are
  trace-time features of the functional model, not module surgery,
* the "world size" for step math is the total device count (chips), not the
  process count — one JAX process drives many chips,
* mel + SpecAugment run on device inside the train step (ops/spec_augment.py).
"""

from __future__ import annotations

import filecmp
import json
import math
import os
import time
from functools import partial
from pprint import pprint
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import whisper_finetune_tpu.runtime as rt
from whisper_finetune_tpu.config import validate_config
from whisper_finetune_tpu.data import (
    BatchLoader,
    SampleBuilder,
    SampleDataset,
    ShardedSampler,
    WarmupDatasetSampler,
    get_dataset_boundary_indices,
    infinite_batches,
    process_dataset,
    stack_microbatches,
)
from whisper_finetune_tpu.data.augment import (
    Compose,
    get_audio_augments_advanced,
    get_audio_augments_baseline,
    get_audio_augments_office,
)
from whisper_finetune_tpu.eval import (
    evaluate_multiple_datasets,
    log_metrics_to_wandb,
    make_eval_step,
)
from whisper_finetune_tpu.models import (
    ForwardConfig,
    load_model,
    resize_whisper_layers,
    resolve_model_architecture,
    save_checkpoint,
)
from whisper_finetune_tpu.models.lora import (
    LoRAUpdateTracker,
    apply_lora,
    get_lora_param_stats,
    lora_scale,
)
from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
from whisper_finetune_tpu.optim import get_optimizer, get_schedule
from whisper_finetune_tpu.parallel import get_data_mesh
from whisper_finetune_tpu.tokenizer import get_tokenizer
from whisper_finetune_tpu.train.step import (
    TrainState,
    combine_params,
    make_train_step,
    partition_params,
    shard_batch,
)
from whisper_finetune_tpu.utils import (
    apply_platform_env,
    calculate_training_steps,
    calculate_val_steps,
    get_unique_base_path,
    print_trainable_parameters,
    read_config,
    resolve_local_accum_grad_steps,
    set_seed,
)


# ---------------------------------------------------------------------------
# Config -> model/feature configuration
# ---------------------------------------------------------------------------

def _compute_dtype(t_config: Dict) -> str:
    if not t_config["mixed_precision_training"]:
        return "float32"
    mp = t_config["mp_dtype"]
    if mp == "fp16":
        rt.print_once(
            "mp_dtype=fp16 requested; TPUs compute mixed precision in bfloat16 "
            "(no GradScaler needed). Using bf16."
        )
        return "bfloat16"
    if mp in ("bf16", "bfloat16"):
        return "bfloat16"
    return "float32"


def build_forward_config(config: Dict, is_lora_run: bool) -> ForwardConfig:
    t = config["training"]
    aug = config["augmentation"]
    dsa = aug["deep_spec_augment"]
    # train_only_* zeroes stochastic depth on the frozen side
    # (reference finetune.py:423-425).
    sd = float(t["stochastic_depth"])
    sd_encoder = 0.0 if t["train_only_decoder"] else sd
    sd_decoder = 0.0 if t["train_only_encoder"] else sd
    lora_cfg = _lora_hparams(config["model"].get("lora_config", {}) or {})
    attn_impl = str(t.get("attn_impl", "auto"))
    if attn_impl == "auto":
        from whisper_finetune_tpu.ops.attention import resolve_auto_impls

        attn_kwargs = resolve_auto_impls()
    else:
        attn_kwargs = {"attn_impl": attn_impl}
    return ForwardConfig(
        compute_dtype=_compute_dtype(t),
        remat_encoder=bool(t["gradient_checkpointing_encoder"]),
        remat_encoder_last_only=bool(t["gradient_checkpointing_encoder_last_only"]),
        remat_decoder=bool(t["gradient_checkpointing_decoder"]),
        remat_policy=str(t.get("remat_policy", "full")),
        stochastic_depth=sd,
        stochastic_depth_encoder=sd_encoder,
        stochastic_depth_decoder=sd_decoder,
        dsa_apply=bool(dsa["apply"]),
        dsa_time_mask_param=int(dsa["time_mask_param"]),
        dsa_freq_mask_param=int(dsa["freq_mask_param"]),
        dsa_p=float(dsa.get("p", 1.0)),
        dsa_layer_indices=(
            tuple(dsa["layer_indices"]) if dsa.get("layer_indices") else None
        ),
        lora_scale=(
            lora_scale(lora_cfg["rank"], lora_cfg["alpha"]) if is_lora_run else 0.0
        ),
        lora_dropout=lora_cfg["dropout"] if is_lora_run else 0.0,
        **attn_kwargs,
    )


def _lora_hparams(lcfg: Dict) -> Dict:
    """Accept both the reference's key spelling (rank / lora_alpha /
    lora_dropout, configs/config_turbo_best.yaml:8-11) and the bare names."""
    return {
        "rank": int(lcfg.get("rank", 16)),
        "alpha": float(lcfg.get("lora_alpha", lcfg.get("alpha", 32))),
        "dropout": float(lcfg.get("lora_dropout", lcfg.get("dropout", 0.0))),
    }


def build_featurize_config(config: Dict, n_mels: int) -> FeaturizeConfig:
    aug = config["augmentation"]
    sa = aug["spec_augment"]
    ex = aug["extremes_spec_augment"]
    return FeaturizeConfig(
        n_mels=n_mels,
        spec_augment=bool(sa["apply"]),
        time_mask_param=int(sa["time_mask_param"]),
        freq_mask_param=int(sa["freq_mask_param"]),
        time_warp_w=int(sa["time_warp_w"]),
        p=float(sa.get("p", 1.0)),
        extremes=bool(ex["apply"]),
        low_freq_range=int(ex["low_freq_range"]),
        high_freq_range=int(ex["high_freq_range"]),
    )


def build_audio_augment(config: Dict):
    aud = config["augmentation"]["audio_augment"]
    pipelines = []
    if aud["apply_baseline_aug"]:
        ts = aud.get("time_stretch", {})
        pipelines.append(
            get_audio_augments_baseline(
                min_rate=ts.get("min_rate", 0.8), max_rate=ts.get("max_rate", 1.25)
            )
        )
    if aud["apply_office_aug"]:
        pipelines.append(get_audio_augments_office())
    if aud.get("apply_advanced_aug", False):
        pipelines.append(get_audio_augments_advanced())
    return Compose(pipelines) if pipelines else None


def build_trainable_mask(params, t_config: Dict, lora_mask=None):
    """Compose the frozen-parameter mask: LoRA freezes everything but
    adapters (lora.py:14-27); train_only_{decoder,encoder} freeze whole sides
    (finetune.py:468-471, utils.py:138-140)."""
    if lora_mask is not None:
        mask = lora_mask
    else:
        mask = jax.tree_util.tree_map(lambda _: True, params)
    if t_config["train_only_decoder"]:
        mask = dict(mask)
        mask["encoder"] = jax.tree_util.tree_map(lambda _: False, mask["encoder"])
    if t_config["train_only_encoder"]:
        mask = dict(mask)
        mask["decoder"] = jax.tree_util.tree_map(lambda _: False, mask["decoder"])
    return mask


# ---------------------------------------------------------------------------
# LR telemetry (reference _build_lr_log_dict, finetune.py:232-307)
# ---------------------------------------------------------------------------

def _build_lr_log_dict(group_metadata, schedule_factor: float, train_loss: float) -> Dict:
    log_data = {"Train loss": train_loss}
    current_lrs = [m["base_lr"] * schedule_factor for m in group_metadata]
    if len(current_lrs) == 1:
        log_data["Learning rate"] = current_lrs[0]
        return log_data

    log_data["Learning rate/min"] = min(current_lrs)
    log_data["Learning rate/max"] = max(current_lrs)
    log_data["Learning rate/mean"] = sum(current_lrs) / len(current_lrs)
    log_data["Learning rate/schedule_factor"] = schedule_factor

    grouped: Dict[str, list] = {}
    grouped_base: Dict[str, list] = {}
    for idx, (meta, lr) in enumerate(zip(group_metadata, current_lrs)):
        label = str(meta.get("lr_log_label", "group"))
        grouped.setdefault(label, []).append(lr)
        grouped_base.setdefault(label, []).append(meta.get("base_lr_unscaled", lr))
        log_data[f"Learning rate/{label}_group_{idx}"] = lr

    if "muon" in grouped:
        vals = grouped["muon"]
        log_data["Learning rate/muon_actual_min"] = min(vals)
        log_data["Learning rate/muon_actual_max"] = max(vals)
        log_data["Learning rate/muon_actual_mean"] = sum(vals) / len(vals)
        base = grouped_base["muon"]
        log_data["Learning rate/muon"] = (sum(base) / len(base)) * schedule_factor
    if "aux_adamw" in grouped:
        vals = grouped["aux_adamw"]
        log_data["Learning rate/aux_adamw_actual"] = sum(vals) / len(vals)
        base = grouped_base["aux_adamw"]
        log_data["Learning rate/aux_adamw"] = (sum(base) / len(base)) * schedule_factor

    if "Learning rate/muon" in log_data:
        log_data["Learning rate"] = log_data["Learning rate/muon"]
    elif "Learning rate/aux_adamw" in log_data:
        log_data["Learning rate"] = log_data["Learning rate/aux_adamw"]
    else:
        log_data["Learning rate"] = current_lrs[0]
    return log_data


def _np_histogram_record(counts, lo: float, hi: float) -> Dict:
    """Serialize a fixed-range histogram as the logging record runtime.log
    understands (rendered as wandb.Histogram when W&B is live, stored as-is
    in metrics.jsonl)."""
    import numpy as np

    counts = np.asarray(counts).astype(int)
    if hi <= lo:
        hi = lo + 1e-12
    edges = np.linspace(lo, hi, counts.size + 1)
    return {
        "_type": "histogram",
        "counts": counts.tolist(),
        "edges": [float(e) for e in edges],
    }


@partial(jax.jit, static_argnames=("bins",))
def _jit_param_histograms(trainable, bins: int):
    # Module-level jit: caching keys on function identity, so the histogram
    # program compiles once per tree shape rather than re-tracing the full
    # parameter tree at every eval step (a fresh lambda per call defeats
    # the cache).
    from whisper_finetune_tpu.train.step import grad_histograms

    return grad_histograms(trainable, bins)


def _param_histograms(trainable, bins: int = 64) -> Dict[str, Dict]:
    """``params_hist/<side>.<module>`` 64-bin histograms of the trainable
    tree — with the step's gradient histograms, the full wandb.watch(model,
    log="all") telemetry (reference finetune.py:151). Ranges and counts are
    reduced on device per leaf (no concatenation of the 1.5B-param tree);
    only the (bins,) count vectors come to host."""
    hists = _jit_param_histograms(trainable, bins)
    return {
        f"params_hist/{name}": _np_histogram_record(
            jax.device_get(counts), float(lo), float(hi)
        )
        for name, (counts, lo, hi) in hists.items()
    }


def _param_norms_by_module(trainable) -> Dict[str, float]:
    """``params/<side>.<module>`` L2 norms over the trainable tree — the
    pytree equivalent of ``wandb.watch(model, log="all")`` parameter
    histograms (reference finetune.py:151), logged at eval steps."""
    import collections

    groups: Dict[str, list] = collections.defaultdict(list)
    for path, leaf in jax.tree_util.tree_flatten_with_path(trainable)[0]:
        if leaf is None:
            continue
        keys = [
            p.key if hasattr(p, "key") else str(p)
            for p in path[:2]
        ]
        groups[".".join(keys)].append(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
    return {
        f"params/{name}": float(jnp.sqrt(sum(sq)))
        for name, sq in groups.items()
    }


# ---------------------------------------------------------------------------
# Eval + checkpoint (reference _evaluate_and_maybe_checkpoint, finetune.py:97-123)
# ---------------------------------------------------------------------------

def _evaluate_and_maybe_checkpoint(
    params,
    dims,
    eval_step,
    dev_loaders: Dict,
    tokenizer,
    save_dir: str,
    step: int,
    min_wer: float,
    save_checkpoints: bool,
    mesh=None,
) -> float:
    dataset_metrics, macro_metrics = evaluate_multiple_datasets(
        eval_step, params, dev_loaders, tokenizer, mesh=mesh
    )
    eval_wer = macro_metrics["macro_wer"]
    if step == 0:
        rt.print_once(f"Initial Macro WER: {eval_wer:.4f}")
    else:
        rt.print_once(f"Step {step}: Macro WER={eval_wer:.4f}")
    log_metrics_to_wandb(dataset_metrics, macro_metrics, step=step, prefix="val")

    # Every process computes identical metrics (the gathered stats are
    # host-complete everywhere), so min_wer stays consistent; only rank 0
    # touches the filesystem.
    if step > 0 and eval_wer < min_wer:
        min_wer = eval_wer
        if rt.IS_MAIN:
            save_checkpoint(f"{save_dir}/best_model.pt", params, dims)
            print(f"  Saved new best model (WER: {min_wer:.4f})")
    if step > 0 and save_checkpoints and rt.IS_MAIN:
        save_checkpoint(f"{save_dir}/step{step}.pt", params, dims)
    return min(min_wer, eval_wer)


# ---------------------------------------------------------------------------
# Main loop (reference main_loop, finetune.py:126-229)
# ---------------------------------------------------------------------------

def main_loop(
    state: TrainState,
    step_fn,
    mesh,
    train_stream,
    accum_local: int,
    dev_loaders: Dict,
    eval_step,
    dims,
    save_dir: str,
    t_config: Dict,
    group_metadata,
    schedule,
    tokenizer,
    base_rng: jnp.ndarray,
) -> TrainState:
    lora_tracker = None
    if t_config.get("is_lora_run", False):
        lora_tracker = LoRAUpdateTracker(
            combine_params(state.trainable, state.frozen)
        )
        rt.print_once("LoRA debug logging enabled - tracking parameter and update norms")

    min_wer = float("inf")
    if dev_loaders:
        # ALL processes run the SPMD mesh eval (saves/logs inside are
        # rank-0-gated); the reference's rank-0-only eval is a single-GPU
        # design (finetune.py:161-173).
        rt.print_once("\nRunning initial evaluation...")
        min_wer = _evaluate_and_maybe_checkpoint(
            combine_params(state.trainable, state.frozen),
            dims, eval_step, dev_loaders, tokenizer, save_dir,
            step=0, min_wer=min_wer, save_checkpoints=False, mesh=mesh,
        )
    rt.barrier()

    # Profiling hook (the reference's CUDA-memory-history equivalent,
    # finetune.py:49,350-352): set WFT_PROFILE_DIR to capture an XLA device
    # trace of steps 3-8, viewable in TensorBoard/Perfetto.
    profile_dir = os.environ.get("WFT_PROFILE_DIR")

    train_steps = t_config["train_steps"]
    val_steps = t_config["val_steps"]

    def next_device_batch():
        micro = [next(train_stream) for _ in range(accum_local)]
        return shard_batch(mesh, stack_microbatches(micro))

    # Resume: the restored state.step is the number of optimizer steps already
    # taken, so run only the remainder (steps start_step+1 .. train_steps) —
    # keeping step numbers, checkpoint names, and the restored optax schedule
    # count all on the same global clock.
    start_step = int(jax.device_get(state.step))
    if start_step >= train_steps:
        rt.print_once(
            f"Resumed state is already at step {start_step} >= "
            f"train_steps {train_steps}; nothing to train."
        )

    # Progress bar on the main process (reference finetune.py:175); falls
    # back to periodic prints when tqdm is unavailable.
    try:
        from tqdm import tqdm

        pbar = tqdm(
            total=train_steps,
            initial=start_step,
            disable=not rt.IS_MAIN,
            dynamic_ncols=True,
        )
    except ImportError:
        pbar = None

    batch = next_device_batch() if start_step < train_steps else None
    last_step_time = None
    for step in range(start_step + 1, train_steps + 1):
        if profile_dir and step == 3 and rt.IS_MAIN:
            jax.profiler.start_trace(profile_dir)
        out = step_fn(state, batch, base_rng)
        # 3rd output (present when the step was built with grad_hist_every):
        # wandb.watch-parity gradient histograms, non-zero on eval steps.
        state, loss = out[0], out[1]
        ghists = out[2] if len(out) > 2 else None
        # Overlap: the step is dispatched asynchronously; build + upload the
        # next batch while the device computes, then sync on the loss (the
        # H2D/host-build analogue of the reference's pin_memory +
        # non_blocking copies, model_utils.py:60-62). The build is timed
        # separately (perf/host_batch_build_s): it runs concurrently with
        # the device step, so the pipeline is host-starved exactly when
        # this approaches perf/step_time_s — the e2e side-by-side
        # tools/bench_e2e.py reports.
        host_build_s = 0.0
        if step < train_steps:
            t_build = time.time()
            batch = next_device_batch()
            host_build_s = time.time() - t_build
        train_loss = float(loss)

        if profile_dir and step == 8 and rt.IS_MAIN:
            jax.profiler.stop_trace()
            rt.print_once(f"Profiler trace for steps 3-8 written to {profile_dir}")

        schedule_factor = float(schedule(step - 1)) if schedule is not None else 1.0
        log_data = _build_lr_log_dict(group_metadata, schedule_factor, train_loss)

        # Throughput telemetry (per optimizer step, incl. host pipeline).
        now = time.time()
        if last_step_time is not None:
            dt = now - last_step_time
            samples_per_step = accum_local * jax.device_count() * int(
                t_config.get("_per_device_batch", 0) or 0
            )
            log_data["perf/step_time_s"] = dt
            log_data["perf/host_batch_build_s"] = host_build_s
            if samples_per_step:
                log_data["perf/samples_per_sec"] = samples_per_step / dt
                log_data["perf/audio_hours_per_sec"] = (
                    samples_per_step * 30 / 3600 / dt
                )
        last_step_time = now
        is_eval_step = (step % val_steps) == 0 or step == train_steps
        if is_eval_step:
            # parameter-magnitude telemetry (the wandb.watch(model, log="all")
            # analogue, reference finetune.py:151): one global norm plus a
            # params/<module> norm per top-level module, all computed on
            # device and fetched as scalars
            log_data["params/trainable_global_norm"] = float(
                optax.global_norm(state.trainable)
            )
            log_data.update(_param_norms_by_module(state.trainable))
            # wandb.watch(log="all") parity: parameter histograms computed
            # here, gradient histograms from the step's third output (the
            # step's lax.cond produced real counts on this step)
            log_data.update(_param_histograms(state.trainable))
            # (the step's cond fires on step % val_steps == 0; the
            # forced final-step eval has no fresh grad histogram)
            if ghists is not None and (step % val_steps) == 0:
                log_data.update(
                    {
                        f"grads_hist/{name}": _np_histogram_record(
                            jax.device_get(counts), float(lo), float(hi)
                        )
                        for name, (counts, lo, hi) in ghists.items()
                    }
                )
        if lora_tracker is not None and is_eval_step:
            params_now = combine_params(state.trainable, state.frozen)
            log_data.update(get_lora_param_stats(params_now))
            log_data.update(lora_tracker.update_and_stats(params_now))
        rt.log(log_data, step=step)
        if pbar is not None:
            pbar.update(1)
            pbar.set_postfix({"loss": f"{train_loss:.4f}"})
        elif rt.IS_MAIN and step % 10 == 0:
            print(f"step {step}/{train_steps} loss={train_loss:.4f}")

        # Divergence kill-switch (reference finetune.py:193-195).
        assert train_loss < t_config["max_train_loss"], (
            f"Train loss is above {t_config['max_train_loss']}, "
            "the loss is unable to converge."
        )

        if is_eval_step:
            if rt.IS_MAIN and t_config.get("save_train_state"):
                from whisper_finetune_tpu.train.state_io import save_train_state

                save_train_state(os.path.join(save_dir, "train_state"), state)
            if dev_loaders:
                min_wer = _evaluate_and_maybe_checkpoint(
                    combine_params(state.trainable, state.frozen),
                    dims, eval_step, dev_loaders, tokenizer, save_dir,
                    step=step, min_wer=min_wer,
                    save_checkpoints=t_config["save_all_checkpoints"],
                    mesh=mesh,
                )
            rt.barrier()

    if pbar is not None:
        pbar.close()
    if rt.IS_MAIN:
        save_checkpoint(
            f"{save_dir}/last_model.pt",
            combine_params(state.trainable, state.frozen),
            dims,
        )

    if rt.IS_MAIN and t_config.get("upload_models_to_wandb", False):
        last_path = f"{save_dir}/last_model.pt"
        best_path = f"{save_dir}/best_model.pt"
        if os.path.exists(best_path) and filecmp.cmp(last_path, best_path, shallow=False):
            print("Last model and best model are identical. Uploading only best_model.pt.")
            rt.save_wandb_file(best_path)
        else:
            print("Uploading both last_model.pt and best_model.pt.")
            rt.save_wandb_file(last_path)
            if os.path.exists(best_path):
                rt.save_wandb_file(best_path)
    rt.barrier()
    return state


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main(config: Dict) -> None:
    config = validate_config(config)
    rt.setup_distributed()
    set_seed(int(config["seed"]) + rt.RANK)

    n_devices = jax.device_count()
    local_devices = jax.local_device_count()

    global_accum_grad_steps = int(config["training"]["accum_grad_steps"])
    local_accum_grad_steps = resolve_local_accum_grad_steps(
        global_accum_grad_steps, n_devices
    )
    config["training"]["global_accum_grad_steps"] = global_accum_grad_steps
    config["training"]["accum_grad_steps"] = local_accum_grad_steps

    rt.print_once(
        f"Runtime: processes={jax.process_count()}, rank={rt.RANK}, "
        f"devices={n_devices} ({jax.devices()[0].platform}), "
        f"local_devices={local_devices}"
    )
    rt.print_once(
        "Gradient accumulation: "
        f"global_accum_grad_steps={global_accum_grad_steps}, "
        f"local_accum_grad_steps={local_accum_grad_steps}, "
        f"data-parallel width={n_devices}"
    )

    config["save_dir"] = os.path.join(config["save_dir"], get_unique_base_path())
    if rt.IS_MAIN:
        os.makedirs(config["save_dir"], exist_ok=True)
    rt.barrier()

    is_lora_run = bool(config["model"].get("lora", False))
    config["training"]["is_lora_run"] = is_lora_run
    if rt.IS_MAIN and is_lora_run:
        with open(
            os.path.join(config["save_dir"], "lora_config.json"), "w", encoding="utf-8"
        ) as handle:
            json.dump(config["model"].get("lora_config", {}), handle, indent=2, sort_keys=True)

    if rt.IS_MAIN and "SLURM_JOB_ID" in os.environ:
        print(f"SLURM job: {os.environ['SLURM_JOB_ID']} on {os.environ.get('SLURMD_NODENAME', '?')}")
    rt.print_once("JAX version:", jax.__version__)

    # -- model ---------------------------------------------------------------
    arch = resolve_model_architecture(config["model"])
    if arch["base_init_name"] != arch["init_name"]:
        rt.print_once(
            f"Model alias '{arch['init_name']}' resolved to base model "
            f"'{arch['base_init_name']}'."
        )
    params, dims = load_model(arch["base_init_name"])

    if config["model"].get("bfloat16"):
        rt.print_once(
            "WARNING: config['model']['bfloat16'] is deprecated and ignored. "
            "Params stay fp32; compute precision comes from "
            "training.mixed_precision_training / mp_dtype."
        )

    params, dims, changed = resize_whisper_layers(
        params,
        dims,
        target_encoder_layers=arch["encoder_layers"],
        target_decoder_layers=arch["decoder_layers"],
    )
    if changed:
        rt.print_once(
            f"Whisper architecture override active: encoder={dims.n_audio_layer}, "
            f"decoder={dims.n_text_layer}"
        )

    lora_mask = None
    if is_lora_run:
        rt.print_once("Applying LoRA adapters...")
        print_trainable_parameters(params)
        lcfg = _lora_hparams(config["model"].get("lora_config", {}) or {})
        params, lora_mask = apply_lora(
            params,
            rank=lcfg["rank"],
            alpha=lcfg["alpha"],
            dropout=lcfg["dropout"],
            encoder_only=bool(config["training"]["train_only_encoder"]),
            decoder_only=bool(config["training"]["train_only_decoder"]),
            key=jax.random.PRNGKey(int(config["seed"])),
        )

    trainable_mask = build_trainable_mask(params, config["training"], lora_mask)
    print_trainable_parameters(params, trainable_mask)

    fcfg = build_forward_config(config, is_lora_run)
    feat_cfg = build_featurize_config(config, dims.n_mels)

    # -- data ----------------------------------------------------------------
    ds_config = config["dataset"]
    warmup_dataset_idx = ds_config.get("warmup_dataset_idx")
    data_rng = np.random.default_rng(int(config["seed"]) + rt.RANK)
    if warmup_dataset_idx is not None:
        train_hf, dataset_sizes = process_dataset(
            ds_config["train_datasets"],
            ds_config["select_n_per_t_ds"],
            ds_config["train_split_name"],
            ds_config["groupby_col"],
            select_language_tag=ds_config.get("select_language_tag"),
            return_sizes=True,
            rng=data_rng,
        )
        rt.print_once(f"\nDataset sizes: {dataset_sizes}")
    else:
        train_hf = process_dataset(
            ds_config["train_datasets"],
            ds_config["select_n_per_t_ds"],
            ds_config["train_split_name"],
            ds_config["groupby_col"],
            select_language_tag=ds_config.get("select_language_tag"),
            rng=data_rng,
        )
        dataset_sizes = None

    # Validation datasets are built on EVERY process: mesh-parallel eval is
    # SPMD, so all processes must iterate identical eval batches (the
    # reference builds them rank-0 only because its eval runs on one GPU,
    # finetune.py:543; a rank-0-only build here would deadlock the
    # multi-host eval step).
    val_datasets_dict = {}
    val_config = ds_config.get("val_datasets", []) or []
    if isinstance(val_config, str):
        val_config = [val_config]
    val_names = ds_config.get("val_dataset_names")
    if val_names is None:
        val_names = [v.split("/")[-1] if "/" in v else v for v in val_config]
    for i, (val_ds, val_name) in enumerate(zip(val_config, val_names)):
        select_n = (
            ds_config["select_n_per_v_ds"][i]
            if i < len(ds_config["select_n_per_v_ds"])
            else None
        )
        # rank-INDEPENDENT rng: every process must subsample identical val
        # rows or the SPMD eval batches would diverge across hosts
        val_datasets_dict[val_name] = process_dataset(
            [val_ds],
            [select_n],
            ds_config["valid_split_name"],
            [None],
            rng=np.random.default_rng(int(config["seed"]) + 10_000 + i),
        )

    # -- step math -----------------------------------------------------------
    train_drop_last = bool(ds_config.get("drop_last", True))
    config["training"]["train_steps"] = calculate_training_steps(
        config, len(train_hf), world_size=n_devices, drop_last=train_drop_last
    )
    config["training"]["val_steps"] = calculate_val_steps(config)
    if config["lr_scheduler"]["warmup_steps"] < 1.0:
        config["lr_scheduler"]["warmup_steps"] = int(
            config["lr_scheduler"]["warmup_steps"] * config["training"]["train_steps"]
        )

    tokenizer = get_tokenizer(multilingual=True, language="de", task="transcribe")

    # -- loaders -------------------------------------------------------------
    # One process feeds all its devices: the host batch is
    # batch_size * local_device_count, sharded over the mesh in shard_batch.
    per_device_batch = int(ds_config["batch_size"])
    host_batch = per_device_batch * local_devices
    config["training"]["_per_device_batch"] = per_device_batch

    builder = SampleBuilder(
        tokenizer,
        no_timestamp_training=bool(ds_config["no_timestamp_training"]),
        max_prompt_length=int(ds_config["max_prompt_length"]),
        prompt_use_rate=float(ds_config["prompt_use_rate"]),
        no_timestamps_rate=float(ds_config["no_timestamp_rate"]),
        bpe_dropout=float(config["augmentation"]["bpe_dropout"]),
        audio_augment=build_audio_augment(config),
    )
    train_ds = SampleDataset(train_hf, builder, seed=int(config["seed"]))

    sampler = None
    if jax.process_count() > 1 and warmup_dataset_idx is not None:
        raise ValueError(
            "dataset.warmup_dataset_idx is not supported with multi-host data "
            "sharding yet."
        )
    if warmup_dataset_idx is not None and dataset_sizes is not None:
        boundaries = get_dataset_boundary_indices(dataset_sizes)
        warmup_start, warmup_end = boundaries[warmup_dataset_idx]
        sampler = WarmupDatasetSampler(
            warmup_indices=list(range(warmup_start, warmup_end)),
            all_indices=list(range(len(train_ds))),
            warmup_steps=int(config["lr_scheduler"]["warmup_steps"]),
            batch_size=host_batch,
            shuffle=True,
            seed=int(config["seed"]),
        )
    else:
        sampler = ShardedSampler(
            len(train_ds),
            rank=jax.process_index(),
            world_size=jax.process_count(),
            shuffle=True,
            seed=int(config["seed"]),
            drop_last=train_drop_last,
        )

    train_num_workers = ds_config.get("train_num_workers")
    if train_num_workers is None:
        train_num_workers = min(os.cpu_count() or 1, 8)
    eval_num_workers = int(ds_config.get("eval_num_workers") or 0)
    rt.print_once(f"Train loader workers: {train_num_workers}, eval workers: {eval_num_workers}")

    pad_buckets = ds_config.get("decoder_pad_buckets")
    pad_to = tuple(pad_buckets) if pad_buckets else 448
    train_loader = BatchLoader(
        train_ds,
        batch_size=host_batch,
        sampler=sampler,
        num_workers=int(train_num_workers),
        drop_last=train_drop_last,
        seed=int(config["seed"]),
        pad_to=pad_to,
    )
    train_stream = infinite_batches(train_loader)

    eval_builder = SampleBuilder(
        tokenizer,
        no_timestamp_training=True,
        prompt_use_rate=0.0,
        no_timestamps_rate=0.0,
    )
    dev_loaders = {}
    for val_name, val_hf in val_datasets_dict.items():
        val_ds = SampleDataset(val_hf, eval_builder, seed=int(config["seed"]))
        loader = BatchLoader(
            val_ds,
            batch_size=int(ds_config["batch_size_eval"]),
            shuffle=False,
            num_workers=eval_num_workers,
        )
        dev_loaders[val_name] = (lambda l: (lambda: iter(l)))(loader)

    # -- optimizer / scheduler -------------------------------------------------
    schedule = get_schedule(config["lr_scheduler"], config["training"]["train_steps"])
    trainable, frozen = partition_params(params, trainable_mask)
    from whisper_finetune_tpu.parallel.mesh import DATA_AXIS

    zero_shard = bool(config["training"].get("zero_shard_optimizer")) and n_devices > 1
    opt, group_metadata = get_optimizer(
        trainable,
        config["optimizer"],
        schedule=schedule,
        is_lora_run=is_lora_run,
        # Distributed Muon: Newton-Schulz sharded over the data axis inside
        # the shard_map step (reference MuonWithAuxAdam behaviour). Under
        # ZeRO the update itself is already sharded — no double slicing.
        data_shard_axis=None if zero_shard else DATA_AXIS,
        data_axis_size=1 if zero_shard else n_devices,
    )
    # Gradient clipping happens inside the step on full synchronized grads
    # (required for correct norms under ZeRO sharding).
    tx = opt
    state = TrainState(
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )

    if rt.IS_MAIN:
        pprint(config)

    mesh = get_data_mesh()
    # Place the state on the mesh up front so the first step compiles with
    # the same input shardings as every later step (otherwise step 2
    # recompiles when the donated outputs come back mesh-placed). ZeRO-1
    # distributes the optimizer state across the data axis.
    from jax.sharding import NamedSharding, PartitionSpec

    if zero_shard:
        from whisper_finetune_tpu.train.step import zero_state_sharding

        rt.print_once("ZeRO-1: optimizer state sharded over the data axis")
        state = jax.device_put(state, zero_state_sharding(mesh, state))
    else:
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    if config["training"].get("resume_from"):
        from whisper_finetune_tpu.train.state_io import load_train_state

        state = load_train_state(config["training"]["resume_from"], state)
        # Re-place with the SAME sharding as the fresh state: under ZeRO the
        # optimizer state must stay sharded over the data axis, or resuming
        # would replicate it on every chip and undo the memory savings.
        if zero_shard:
            state = jax.device_put(state, zero_state_sharding(mesh, state))
        else:
            state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        rt.print_once(
            f"Resumed training state from {config['training']['resume_from']} "
            f"at step {int(jax.device_get(state.step))}"
        )
    split_update = config["training"].get("split_optimizer_step", "auto")
    if split_update == "auto":
        # Muon's per-leaf fp32 Newton-Schulz temps don't fit next to the
        # fwd/bwd workspace in one program on 16 GB chips; everything else
        # keeps the single fused program (one dispatch, fused clip/update).
        split_update = bool(config["optimizer"].get("muon"))
    full_tree = all(jax.tree_util.tree_leaves(trainable_mask)) and not lora_mask
    zero_active = zero_shard and mesh.devices.size > 1
    if split_update and zero_active:
        # ZeRO already shards the update across devices; make_train_step
        # keeps the single-program step there, so an explicit true would be
        # silently inert — surface it instead.
        rt.print_once(
            "split_optimizer_step is inert under zero_shard_optimizer on a "
            "multi-device mesh (ZeRO keeps the single-program step); "
            "continuing without it."
        )
        split_update = False
    manual_backward = config["training"].get("manual_backward", "auto")
    if manual_backward == "auto":
        # The hand-written accumulating backward (train/manual_grad.py) is
        # what fits full-model split-update training with real
        # accum_grad_steps on a 16 GB chip; it only supports the full tree.
        manual_backward = bool(split_update) and full_tree
    elif manual_backward and not (split_update and full_tree):
        raise ValueError(
            "training.manual_backward=true requires split_optimizer_step "
            "(unavailable under zero_shard_optimizer on a multi-device "
            "mesh) and full fine-tuning (no LoRA / train_only_*)"
        )
    step_fn = make_train_step(
        mesh,
        dims,
        fcfg,
        tx,
        label_smoothing=float(config["training"]["label_smoothing"]),
        feat_cfg=feat_cfg,
        max_grad_norm=float(config["training"]["max_grad_norm"]),
        zero_shard=zero_shard,
        zero_opt_state=state.opt_state if zero_shard else None,
        zero_params=state.trainable if zero_shard else None,
        accum_dtype=config["training"].get("grad_accum_dtype"),
        grad_hist_every=int(config["training"]["val_steps"]),
        split_update=bool(split_update),
        manual_backward=bool(manual_backward),
        manual_precast=bool(
            config["training"].get("manual_precast_weights", False)
        ),
        compiler_options=config["training"].get("compiler_options"),
    )
    eval_step = make_eval_step(dims, fcfg, n_mels=dims.n_mels)

    # -- observability ---------------------------------------------------------
    wandb_conf = dict(config.get("wandb") or {})
    wandb_enabled = bool(wandb_conf.pop("enabled", True))
    if not wandb_enabled:
        wandb_conf.setdefault("mode", "disabled")
    rt.setup_wandb(config=config, metrics_dir=config["save_dir"], **wandb_conf)
    slurm_job_id = os.environ.get("SLURM_JOB_ID")
    if slurm_job_id:
        rt.update_wandb_config({"slurm_job_id": slurm_job_id}, allow_val_change=True)
        rt.set_wandb_summary("slurm_job_id", slurm_job_id)

    # -- train -----------------------------------------------------------------
    base_rng = jax.random.PRNGKey(int(config["seed"]))
    main_loop(
        state,
        step_fn,
        mesh,
        train_stream,
        local_accum_grad_steps,
        dev_loaders,
        eval_step,
        dims,
        config["save_dir"],
        config["training"],
        group_metadata,
        schedule,
        tokenizer,
        base_rng,
    )

    # Peak device memory report (reference finetune.py:737-744).
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    if peak is not None:
        rt.print_once(f"Peak memory usage: {peak / 1024**2:.2f} MB")
    rt.finish_wandb()


def cli() -> None:
    import argparse

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Script Configuration")
    parser.add_argument("--config", type=str, required=True, help="Path to the configuration YAML file")
    args = parser.parse_args()
    config = read_config(args.config)
    config["path_to_config"] = args.config
    try:
        main(config)
    finally:
        rt.cleanup()


if __name__ == "__main__":
    cli()
