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
    "phimoe": ("Phi-3.5-MoE", "sparsemixer top-2 routing, LayerNorms"),
}

# standalone modules (non-uniform layer stacks): (name, classes, notes)
_STANDALONE = [
    ("DeepSeek V2/V3", "`DeepseekV2ForCausalLM`, `DeepseekV3ForCausalLM`",
     "MLA attention, noaux-tc MoE (`models/deepseek.py`)"),
    ("GLM-4 MoE Lite", "`Glm4MoeLiteForCausalLM`",
     "DeepSeek-family MLA + sigmoid noaux-tc group-limited routing"
     " (`models/deepseek.py`; reference models/glm4_moe_lite.rs)"),
    ("LFM2", "`Lfm2ForCausalLM`",
     "hybrid short-conv/attention, conv-state cache (`models/lfm2.py`)"),
    ("Qwen3-Next", "`Qwen3NextForCausalLM`",
     "gated DeltaNet (GDN) linear attention + gated attention + MoE"
     " (`models/qwen3next.py`)"),
    ("Gemma 3n", "`Gemma3nForCausalLM`",
     "AltUp streams, Laurel residuals, per-layer inputs, KV-shared planes,"
     " MatFormer slicing (`models/gemma3n.py`)"),
    ("Gemma 4", "(reference-spec)",
     "per-type head geometry, proportional partial RoPE, k=v layers,"
     " parallel MoE, double-wide KV-shared MLPs (`models/gemma4.py`);"
     " vision tower + unified embedder (`vision/gemma4.py`), USM conformer"
     " audio (`audio/gemma4.py`), MTP draft heads over donor KV"
     " (`models/gemma4_mtp.py`)"),
    ("Llama 4", "`Llama4ForCausalLM`",
     "chunked attention, input-scaled MoE (`models/llama4.py`)"),
]

# vision / audio families: (name, classes, notes)
_MULTIMODAL = [
    ("LLaVA / LLaVA-NeXT", "`Llava(Next)ForConditionalGeneration`",
     "CLIP tower (+anyres unpad/newline)"),
    ("Idefics2 / Idefics3", "`Idefics*ForConditionalGeneration`",
     "perceiver resampler / pixel shuffle"),
    ("Gemma 3 VL", "`Gemma3ForConditionalGeneration`",
     "SigLIP + mean-pool projector"),
    ("Gemma 3n audio", "`Gemma3nAudioEncoder`",
     "USM conformer, cumulative group norm"),
    ("Gemma 3n vision", "(reference-spec)",
     "native MobileNetV5 tower: UIB/MQA stages, multi-scale fusion"
     " (`vision/mobilenetv5.py`)"),
    ("Qwen2-VL / Qwen2.5-VL", "`Qwen2(_5)_VLForConditionalGeneration`",
     "M-RoPE; windowed tower (2.5)"),
    ("Qwen3-VL (+MoE)", "`Qwen3VL(Moe)ForConditionalGeneration`",
     "DeepStack injection, interleaved M-RoPE"),
    ("Qwen2.5-Omni thinker", "`Qwen2_5OmniThinkerForConditionalGeneration`",
     "chunked audio tower + image"),
    ("Qwen3-Omni thinker", "`Qwen3OmniMoeThinkerForConditionalGeneration`",
     "/8 conv2d audio tower + MoE text"),
    ("Qwen3.5", "(reference-spec)",
     "hybrid GDN text + DeepStack tower (`models/qwen3_5.py`)"),
    ("Qwen3.5-MoE", "(reference-spec)",
     "hybrid GDN + mixed MoE/dense MLPs incl. `mlp_only_layers` "
     "(`models/qwen3_5.py`; HF-parity-tested via Qwen3Next)"),
    ("GLM-4V / GLM-4.5V", "`Glm4v(Moe)ForConditionalGeneration`",
     "bicubic pos grid, partial M-RoPE"),
    ("Mllama (Llama 3.2 V)", "`MllamaForConditionalGeneration`",
     "cross-attention, per-slot cross-K/V"),
    ("Llama 4 VL", "`Llama4ForConditionalGeneration`", "pixel-shuffle tower"),
    ("Mistral 3 / Pixtral", "`Mistral3ForConditionalGeneration`",
     "packed crops, 2D rope, patch merger"),
    ("Phi-4-multimodal", "`Phi4MultimodalForCausalLM`",
     "HD crops, causal SigLIP tower; AUDIO via NeMo-subsampled conformer "
     "+ speech projection (`audio/phi4mm.py`, HF-parity-tested)"),
    ("Phi-3-vision", "(reference-spec)",
     "HD sub_glb assembly (`models/phi3v.py`)"),
    ("LFM2-VL", "`Lfm2VlForConditionalGeneration`",
     "SigLIP2-NaFlex, pixel unshuffle"),
    ("MiniCPM-O", "(reference-spec)",
     "learned-query resampler (`models/minicpmo.py`)"),
    ("Voxtral", "`VoxtralForConditionalGeneration`",
     "Whisper-style audio understanding"),
]

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
    for name, classes, notes in _STANDALONE:
        lines.append(f"| {name} | {classes} | {notes} |")
    lines.append("")
    lines.append("Vision / audio (all engine-served through the prompt-embeds"
                 " path with")
    lines.append("OpenAI `image_url` / `input_audio` chat parts; HF greedy"
                 " parity where a")
    lines.append("transformers class exists):")
    lines.append("")
    lines.append("| Family | HF class | Notes |")
    lines.append("|---|---|---|")
    for name, classes, notes in _MULTIMODAL:
        lines.append(f"| {name} | {classes} | {notes} |")
    lines.append("")
    lines.append("Verified by exact logit / greedy parity against the HF"
                 " `transformers`")
    lines.append("reference implementations (`tests/test_arch_parity.py` and"
                 " the per-family")
    lines.append("`tests/test_*.py`); reference-spec families (no HF class in"
                 " this")
    lines.append("environment) are verified structurally against the"
                 " mistral.rs algorithms")
    lines.append("plus torch-module parity where possible.")
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
