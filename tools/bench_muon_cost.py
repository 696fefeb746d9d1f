"""Decompose the Muon flagship accum-8 step: where do the ~2.4s/opt-step of
optimizer time go (Newton-Schulz MXU work vs momentum/update overhead)?

Times the REAL accum-8 train step (bench.py's _bench_model) with:

  * sgd                — the fwd/bwd floor,
  * muon ns_steps=0    — momentum + normalize + update, no NS matmuls,
  * muon ns_steps=1..5 — per-iteration NS cost on top.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_muon_cost.py
"""

import optax

import bench
from whisper_finetune_tpu.optim.muon import scale_by_muon
from whisper_finetune_tpu.optim.optimizers import muon_param_labels


def muon_tx(ns_steps):
    def factory(trainable):
        labels = muon_param_labels(trainable, 2)
        return optax.multi_transform(
            {
                "muon": scale_by_muon(
                    learning_rate=2e-5,
                    momentum=0.95,
                    weight_decay=0.01,
                    ns_steps=ns_steps,
                    momentum_dtype="bfloat16",
                ),
                "adamw": optax.adamw(2e-5, b1=0.9, b2=0.98, eps=1e-6,
                                     weight_decay=0.01),
            },
            labels,
        )

    return factory


def main():
    ACCUM = 8
    results = {}
    cases = [("sgd", lambda trainable: optax.sgd(2e-5))] + [
        (f"muon_ns{k}", muon_tx(k)) for k in (0, 1, 3, 5)
    ]
    for label, factory in cases:
        _, dt, value, _times = bench._bench_model(
            "large-v3", 6, steps=3, warmup=1, accum=ACCUM, tx_factory=factory
        )
        results[label] = dt
        print(
            f"{label:12s} accum-8 step {dt:7.3f} s "
            f"({dt / ACCUM * 1e3:6.1f} ms/microbatch, {value:.4f} audio-h/s)",
            flush=True,
        )
    if "sgd" in results and "muon_ns0" in results:
        print(
            f"muon non-NS overhead: {results['muon_ns0'] - results['sgd']:.3f} s/opt-step"
        )
    if "muon_ns5" in results and "muon_ns0" in results:
        print(
            f"NS 5-iter cost:       {results['muon_ns5'] - results['muon_ns0']:.3f} s/opt-step"
        )


if __name__ == "__main__":
    main()
