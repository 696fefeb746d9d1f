"""whisper_finetune_tpu: TPU-native Whisper fine-tuning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
i4Ds/whisper-finetune PyTorch stack: Whisper encoder-decoder training with
LoRA, SpecAugment (including deep and extremes variants), stochastic depth,
gradient checkpointing, Muon/AdamW optimizers, multi-dataset evaluation with
WER/CER/NLL/entropy/ECE metrics, and OpenAI-format checkpoint export.
"""

__version__ = "0.1.0"
