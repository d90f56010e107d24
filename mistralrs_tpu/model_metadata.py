"""Supported-models/doc generation (the analog of
`render_supported_models_markdown`, `mistralrs-core/src/model_metadata.rs:532`
— doc-as-test: the committed docs table must match this generator's output).
"""

from __future__ import annotations

from .models.config import HF_ARCH_MAP

# arch tag → (display name, notes)
_ARCH_NOTES = {
    "llama": ("Llama 2/3/3.1/3.2", "GGUF + safetensors; RoPE scaling (llama3)"),
    "mistral": ("Mistral 7B family", "sliding window"),
    "mixtral": ("Mixtral 8x7B/8x22B", "MoE (softmax-then-topk routing)"),
    "gemma": ("Gemma 1", "gelu-tanh MLP, sqrt(hidden) embed scale, +1 norms"),
    "phi2": ("Phi-2", "parallel attn+MLP residual, partial rotary, LN biases"),
    "glm": ("GLM-4 (9B)", "interleaved partial rotary"),
    "glm4": ("GLM-4 0414", "interleaved partial rotary, sandwich norms"),
    "granite": ("Granite 3.x", "embedding/residual/attention/logits multipliers"),
    "qwen2": ("Qwen 2/2.5", "attention biases"),
    "qwen2moe": ("Qwen 1.5/2 MoE", "shared expert with sigmoid gate"),
    "glm4moe": ("GLM-4.5/4.6 MoE", "noaux-tc sigmoid routing, dense prefix"),
    "gpt_oss": ("gpt-oss 20B/120B", "attention sinks, clamped-swiglu MoE, YaRN"),
    "hunyuan": ("HunYuan dense", "post-rotary q/k norm"),
    "hunyuan_moe": ("HunYuan MoE", "shared MLP + softmax-topk routing"),
    "stablelm": ("StableLM 2", "partial rotary, biased LayerNorms"),
    "cohere": ("Command R", "parallel residual, interleaved rope, logit scale"),
    "qwen3": ("Qwen 3", "q/k RMSNorm"),
    "qwen3moe": ("Qwen 3 MoE", "MoE + q/k norm"),
    "gemma2": ("Gemma 2", "pre/post norms, logit softcaps, alt. sliding window"),
    "gemma3": ("Gemma 3", "dual RoPE base, q/k norm, 5:1 sliding pattern"),
    "phi3": ("Phi-3/3.5", "fused qkv/gate_up"),
    "smollm3": ("SmolLM 3", "NoPE layers"),
    "starcoder2": ("StarCoder 2", "LayerNorm + gateless MLP"),
}

_FORMATS = "GGUF (Q2_K–Q8_0 k-quants), safetensors (bf16/f16/f32), GPTQ, AWQ, UQFF-TPU"


def render_supported_models_markdown() -> str:
    lines = [
        "# Supported models",
        "",
        "All architectures load from: " + _FORMATS + ".",
        "ISQ (in-situ quantization) applies to any safetensors checkpoint.",
        "",
        "| Architecture | HF class | Notes |",
        "|---|---|---|",
    ]
    by_tag = {}
    for hf_class, tag in HF_ARCH_MAP.items():
        by_tag.setdefault(tag, []).append(hf_class)
    for tag, (name, notes) in _ARCH_NOTES.items():
        classes = ", ".join(f"`{c}`" for c in sorted(by_tag.get(tag, [])))
        lines.append(f"| {name} | {classes} | {notes} |")
    lines.append("")
    lines.append("Standalone modules (non-uniform layer stacks):")
    lines.append("")
    lines.append("| Architecture | HF class | Notes |")
    lines.append("|---|---|---|")
    lines.append("| DeepSeek V2/V3 | `DeepseekV2ForCausalLM`, `DeepseekV3ForCausalLM`"
                 " | MLA attention, noaux-tc MoE (`models/deepseek.py`) |")
    lines.append("| LFM2 | `Lfm2ForCausalLM` | hybrid short-conv/attention,"
                 " conv-state cache (`models/lfm2.py`) |")
    lines.append("| Qwen3-Next | `Qwen3NextForCausalLM` | gated DeltaNet (GDN)"
                 " linear attention + gated attention + MoE (`models/qwen3next.py`) |")
    lines.append("| LLaVA | `LlavaForConditionalGeneration` | CLIP/SigLIP tower"
                 " + projector (`models/llava.py`) |")
    lines.append("")
    lines.append("Verified by exact logit parity against the HF `transformers`")
    lines.append("reference implementations (`tests/test_arch_parity.py`,")
    lines.append("`tests/test_lfm2.py`, `tests/test_qwen3next.py`,")
    lines.append("`tests/test_deepseek.py`).")
    lines.append("")
    return "\n".join(lines)


def render_cli_reference_markdown() -> str:
    """Generate the CLI reference from the argparse tree (docs-as-test, the
    analog of the reference's generated CLI docs)."""
    import io
    from contextlib import redirect_stdout

    from . import cli

    lines = ["# CLI reference", ""]
    for cmd in ("run", "serve", "bench", "quantize", "imatrix", "mcp-serve",
                "tune", "doctor"):
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                cli.main([cmd, "--help"])
        except SystemExit:
            pass
        lines.append(f"## `{cmd}`")
        lines.append("")
        lines.append("```")
        lines.append(buf.getvalue().strip())
        lines.append("```")
        lines.append("")
    return "\n".join(lines)
