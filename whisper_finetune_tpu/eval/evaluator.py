"""Multi-dataset teacher-forced evaluator.

Behavioural parity with the reference evaluator
(src/whisper_finetune/eval/evaluator.py): teacher-forced forward (no
autoregressive decode, evaluator.py:69-73), argmax predictions, special/-100
token stripping, v0 text normalization, per-utterance WER/CER + token
metrics, per-dataset aggregation, unweighted macro average, and the
``val/{name}_{metric}`` logging namespace (evaluator.py:186-221).

TPU-first split: one jitted eval step computes logits AND all per-token
statistics (NLL, predicted log-prob, entropy, confidence, correctness) on
device — only (B, T) scalars cross to the host, never the (B, T, vocab)
logits. Text handling and aggregation run host-side on process 0.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import whisper_finetune_tpu.runtime as rt
from whisper_finetune_tpu.eval.metrics import (
    DatasetMetrics,
    PerUtteranceMetrics,
    aggregate_dataset_metrics,
    compute_macro_average,
)
from whisper_finetune_tpu.eval.text_norm import VOCAB_SPECS, normalize_text
from whisper_finetune_tpu.eval.wer import char_error_rate, word_error_rate
from whisper_finetune_tpu.models.dims import ModelDimensions
from whisper_finetune_tpu.models.whisper import ForwardConfig, forward_impl
from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig, featurize_impl


def eval_forward_config(fcfg: ForwardConfig) -> ForwardConfig:
    """Derive the teacher-forced eval ForwardConfig from the train one:
    keep everything that changes the math at inference (compute dtype, LoRA
    scale, the full attention-impl mix incl. per-site overrides — with
    ``attn_impl: auto`` the measured TPU mix is base xla + encoder/cross
    splash, ops/attention.py, and the 1500-frame encoder eval forward is
    exactly where the splash win matters) and strip train-only features
    (remat, stochastic depth, deep SpecAugment, LoRA dropout)."""
    return ForwardConfig(
        compute_dtype=fcfg.compute_dtype,
        remat_encoder=False,
        remat_encoder_last_only=False,
        remat_decoder=False,
        stochastic_depth=0.0,
        dsa_apply=False,
        lora_scale=fcfg.lora_scale,
        attn_impl=fcfg.attn_impl,
        attn_impl_encoder=fcfg.attn_impl_encoder,
        attn_impl_decoder=fcfg.attn_impl_decoder,
        attn_impl_cross=fcfg.attn_impl_cross,
    )


def make_eval_step(
    dims: ModelDimensions, fcfg: ForwardConfig, n_mels: Optional[int] = None
) -> Callable:
    """Jitted eval step: (params, batch) -> per-token stats.

    ``batch`` carries either precomputed ``mel`` or raw ``audio`` +
    ``crop_frames`` (featurized on device, no augmentation). Returns arrays
    of shape (B, T): predicted ids, NLL vs targets, log-prob of predictions,
    entropy, max-prob confidence. Masking by -100 happens host-side (the
    mask is data, the stats are device math).
    """
    eval_fcfg = eval_forward_config(fcfg)
    feat_cfg = FeaturizeConfig(n_mels=n_mels or dims.n_mels)

    @jax.jit
    def step(params, batch):
        if "mel" in batch:
            mel = batch["mel"]
        else:
            mel = featurize_impl(
                batch["audio"], batch["crop_frames"], None, feat_cfg, train=False
            )
        dec_in, dec_out = batch["dec_input"], batch["dec_output"]
        logits = forward_impl(params, mel, dec_in, dims, eval_fcfg, train=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        pred = jnp.argmax(logits, axis=-1)
        safe_t = jnp.where(dec_out == -100, 0, dec_out)
        nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
        pred_lp = jnp.take_along_axis(logp, pred[..., None], axis=-1)[..., 0]
        entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
        conf = jnp.exp(jnp.max(logp, axis=-1))
        return pred, nll, pred_lp, entropy, conf

    return step


def _pad_rows(batch: Dict, multiple: int) -> Dict:
    """Pad the batch dimension to a multiple so it shards evenly over the
    mesh. Padding rows carry all -100 targets, so the per-utterance loop
    skips them (empty reference)."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if k == "dec_output":
            fill = -100
        elif k == "crop_frames":
            fill = 3000  # keep the featurize crop valid for padding rows
        else:
            fill = 0
        widths = [(0, pad)] + [(0, 0)] * (np.ndim(v) - 1)
        out[k] = np.pad(np.asarray(v), widths, constant_values=fill)
    return out


def evaluate_single_dataset(
    eval_step: Callable,
    params,
    batches: Iterable,
    dataset_name: str,
    tokenizer,
    mesh=None,
) -> DatasetMetrics:
    """Evaluate one dataset. ``batches`` yields dicts with ``mel``,
    ``dec_input``, ``dec_output`` (same contract as the train pipeline but
    without prompts/timestamps — reference finetune.py:669-678).

    With ``mesh`` given, each batch is sharded over the data axis and the
    teacher-forced forward runs SPMD across every chip (the reference
    evaluates on rank 0's single GPU)."""
    special_ids = set(tokenizer.special_tokens.values())
    per_utterance: List[PerUtteranceMetrics] = []
    spec = VOCAB_SPECS["v0"]

    for batch in batches:
        keys = ("mel",) if "mel" in batch else ("audio", "crop_frames")
        device_batch = {
            k: batch[k] for k in keys + ("dec_input", "dec_output")
        }
        multiprocess = jax.process_count() > 1
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            device_batch = _pad_rows(device_batch, mesh.devices.size)
            sharding = NamedSharding(mesh, PartitionSpec("data"))
            if multiprocess:
                # Every process holds the SAME host batch (eval loaders are
                # deterministic and built on all processes); each process
                # materializes exactly the shards its local devices own, so
                # the SPMD eval step runs on the full global mesh.
                host = {k: np.asarray(v) for k, v in device_batch.items()}
                device_batch = {
                    k: jax.make_array_from_callback(
                        v.shape, sharding, lambda idx, v=v: v[idx]
                    )
                    for k, v in host.items()
                }
            else:
                device_batch = {
                    k: jax.device_put(v, sharding)
                    for k, v in device_batch.items()
                }
        pred, nll, pred_lp, entropy, conf = eval_step(params, device_batch)
        if multiprocess and mesh is not None and mesh.devices.size > 1:
            # Bring the (B, T) stats back host-complete on every process so
            # the text/WER pass below stays lockstep across hosts.
            from jax.experimental import multihost_utils

            pred, nll, pred_lp, entropy, conf = (
                multihost_utils.process_allgather(x, tiled=True)
                for x in (pred, nll, pred_lp, entropy, conf)
            )
            device_batch["dec_output"] = np.asarray(
                host["dec_output"]
            )  # already host-complete
        pred = np.asarray(pred)
        nll = np.asarray(nll)
        pred_lp = np.asarray(pred_lp)
        entropy = np.asarray(entropy)
        conf = np.asarray(conf)
        # use the (possibly row-padded) device batch so indices align; padded
        # rows are all -100 and fall through the empty-reference skip
        targets = np.asarray(device_batch["dec_output"])

        for i in range(pred.shape[0]):
            t_ids = targets[i]
            mask = t_ids != -100

            pred_tokens = [
                int(t)
                for t in pred[i].tolist()
                if t not in special_ids and t != -100
            ]
            true_tokens = [
                int(t)
                for t in t_ids.tolist()
                if t not in special_ids and t != -100
            ]
            true_text = tokenizer.decode(true_tokens)
            if true_text.strip() == "":
                continue  # reference skips empty references (evaluator.py:96-97)
            pred_text = tokenizer.decode(pred_tokens)

            pred_norm = normalize_text(pred_text, **spec)
            true_norm = normalize_text(true_text, **spec)

            if mask.sum() == 0:
                tok_stats = (0.0, 0.0, 0.0, [], [])
            else:
                tok_stats = (
                    float(nll[i][mask].mean()),
                    float(pred_lp[i][mask].mean()),
                    float(entropy[i][mask].mean()),
                    conf[i][mask].tolist(),
                    (pred[i][mask] == t_ids[mask]).tolist(),
                )

            per_utterance.append(
                PerUtteranceMetrics(
                    prediction=pred_norm,
                    reference=true_norm,
                    wer=word_error_rate(true_norm, pred_norm)
                    if true_norm
                    else (0.0 if not pred_norm else 1.0),
                    cer=char_error_rate(true_norm, pred_norm)
                    if true_norm
                    else (0.0 if not pred_norm else 1.0),
                    token_nll=tok_stats[0],
                    avg_log_prob=tok_stats[1],
                    token_entropy=tok_stats[2],
                    token_confidences=tok_stats[3],
                    token_correct=tok_stats[4],
                )
            )

    return aggregate_dataset_metrics(per_utterance, dataset_name)


def evaluate_multiple_datasets(
    eval_step: Callable,
    params,
    dataloaders: Dict[str, Callable[[], Iterable]],
    tokenizer,
    mesh=None,
) -> Tuple[List[DatasetMetrics], Dict[str, float]]:
    """Evaluate every validation dataset and macro-average
    (reference evaluator.py:134-183). ``dataloaders`` maps name -> a callable
    returning a fresh batch iterator."""
    all_metrics: List[DatasetMetrics] = []
    for name, make_batches in dataloaders.items():
        rt.print_once(f"\n{'=' * 60}\nEvaluating dataset: {name}\n{'=' * 60}")
        dm = evaluate_single_dataset(
            eval_step, params, make_batches(), name, tokenizer, mesh=mesh
        )
        all_metrics.append(dm)
        rt.print_once(
            f"\nResults for {name}:\n"
            f"  Samples: {dm.num_samples}\n"
            f"  WER: {dm.wer:.4f}\n  CER: {dm.cer:.4f}\n"
            f"  Mean Token NLL: {dm.mean_token_nll:.4f}\n"
            f"  Avg Log Prob: {dm.avg_log_prob:.4f}\n"
            f"  Mean Token Entropy: {dm.mean_token_entropy:.4f}\n"
            f"  ECE: {dm.ece:.4f}"
        )
    macro = compute_macro_average(all_metrics)
    rt.print_once(f"\n{'=' * 60}\nMACRO AVERAGES (unweighted across datasets)\n{'=' * 60}")
    for k, v in macro.items():
        rt.print_once(f"  {k}: {v:.4f}")
    return all_metrics, macro


def log_metrics_to_wandb(
    dataset_metrics: List[DatasetMetrics],
    macro_metrics: Dict[str, float],
    step: int,
    prefix: str = "val",
) -> None:
    """Flatten into the reference's metric namespace (evaluator.py:186-221);
    rt.log fans out to W&B (if enabled) and the local metrics JSONL."""
    log_dict: Dict[str, float] = {}
    for dm in dataset_metrics:
        base = f"{prefix}/{dm.dataset_name}"
        log_dict[f"{base}_wer"] = dm.wer
        log_dict[f"{base}_cer"] = dm.cer
        log_dict[f"{base}_loss"] = dm.mean_token_nll
        log_dict[f"{base}_mean_token_nll"] = dm.mean_token_nll
        log_dict[f"{base}_avg_log_prob"] = dm.avg_log_prob
        log_dict[f"{base}_mean_token_entropy"] = dm.mean_token_entropy
        log_dict[f"{base}_ece"] = dm.ece
        log_dict[f"{base}_num_samples"] = dm.num_samples
    for k, v in macro_metrics.items():
        log_dict[f"{prefix}/{k}"] = v
    rt.log(log_dict, step=step)
