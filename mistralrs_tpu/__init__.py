"""mistralrs_tpu — a TPU-native quantized LLM inference framework.

Built from scratch in JAX/XLA/Pallas with the capability envelope of
EricLBuehler/mistral.rs (see SURVEY.md): GGUF k-quants, GPTQ/AWQ, HQQ, FP8,
ISQ, paged-attention KV cache with continuous batching, tensor sharding over
TPU meshes, and an OpenAI-compatible serving front end.
"""

__version__ = "0.1.0"
