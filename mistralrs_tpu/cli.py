"""Command-line interface (the analog of `mistralrs-cli`: run / serve /
bench / quantize / doctor — `mistralrs-cli/src/main.rs:34-80`)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("model", nargs="?", default=None,
                   help="path to a .gguf/.uqff file or HF model directory")
    p.add_argument("-c", "--config", default=None,
                   help="TOML config file (CLI flags override it)")
    p.add_argument("--isq", default=None, help="in-situ quantization (q4k, q8_0, ...)")
    p.add_argument("--from-uqff", default=None,
                   help="overlay a mistral.rs UQFF artifact onto the checkpoint")
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--kv-quant", choices=["int8", "fp8"], default=None)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--num-kv-blocks", type=int, default=None)
    p.add_argument("--block-size", type=int, default=64,
                   help="paged KV block tokens; bigger blocks mean fewer, "
                        "longer DMA stripes in the fused decode kernel "
                        "(r5 probe: eff 0.59@64 -> 0.74@256 isolated) at "
                        "coarser prefix-cache granularity")
    p.add_argument("--chat-template", default=None, help="jinja template override file")
    p.add_argument("--draft-model", default=None,
                   help="draft model path → speculative decoding (greedy)")
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative draft tokens per verification step")
    # multi-chip / multi-host (the analog of the reference's TP session,
    # mistralrs-core/src/distributed.rs:431 begin_tensor_parallel_session)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (chips per model replica)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel replicas (each tp chips wide)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of the jax.distributed coordinator "
                        "(multi-host pod slice; every host runs this command)")
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=None,
                   help="this host's rank (0 owns the public server)")
    p.add_argument("--replicator-port", type=int, default=19777,
                   help="TCP port for host-0 request replication")


def _apply_toml_config(args):
    """Config-first TOML (the analog of mistralrs-cli's cli-toml-config):
    [model] path/isq/chat_template, [engine] max_batch/block_size/..., and
    per-command sections ([serve] host/port, [run] temperature, ...)."""
    if not getattr(args, "config", None):
        return args
    import tomllib

    with open(args.config, "rb") as f:
        cfg = tomllib.load(f)
    model = cfg.get("model", {})
    if args.model is None:
        args.model = model.get("path")
    if args.isq is None:
        args.isq = model.get("isq")
    if args.chat_template is None and model.get("chat_template"):
        args.chat_template = model["chat_template"]
    eng = cfg.get("engine", {})
    for key, attr in (
        ("max_batch", "max_batch"), ("block_size", "block_size"),
        ("num_kv_blocks", "num_kv_blocks"), ("max_seq_len", "max_seq_len"),
        ("kv_quant", "kv_quant"),
    ):
        if key in eng and parser_default(args, attr):
            setattr(args, attr, eng[key])
    for section in ("serve", "run", "bench"):
        for key, val in cfg.get(section, {}).items():
            if hasattr(args, key) and parser_default(args, key):
                setattr(args, key, val)
    return args


_ARG_DEFAULTS = {
    "max_batch": 8, "block_size": 64, "num_kv_blocks": None, "max_seq_len": None,
    "kv_quant": None, "host": "0.0.0.0", "port": 8080, "temperature": 0.7,
    "max_tokens": 512,
}


def parser_default(args, attr) -> bool:
    """True if the user left the flag at its parser default."""
    return getattr(args, attr, None) == _ARG_DEFAULTS.get(attr, None)


def _multihost_args(args) -> bool:
    return getattr(args, "coordinator", None) is not None


def _build_mesh(args, cfg):
    """Resolve --tp/--dp into a device mesh (with auto TP step-down), or
    None for the single-chip default."""
    tp, dp = getattr(args, "tp", 1), getattr(args, "dp", 1)
    if tp * dp <= 1:
        return None
    from .parallel.tp import build_mesh, resolve_tp

    tcfg = getattr(cfg, "text", None) or cfg
    eff = resolve_tp(tp, tcfg.num_heads, tcfg.num_kv_heads, tcfg.vocab_size,
                     getattr(tcfg, "intermediate_size", 0) or 0)
    if eff != tp:
        print(f"warning: tp={tp} does not divide model dims; stepping down "
              f"to tp={eff}", file=sys.stderr)
        tp = eff
    if tp * dp <= 1:
        return None
    if _multihost_args(args):
        from .parallel.multihost import build_pod_mesh

        return build_pod_mesh(tp=tp, dp=dp)
    return build_mesh(tp=tp, dp=dp)


def _build_engine(args):
    _apply_toml_config(args)
    if _multihost_args(args):
        # must run before ANY jax backend initialization
        if args.host_id is None:
            print("error: --coordinator needs --host-id", file=sys.stderr)
            raise SystemExit(2)
        from .parallel.multihost import initialize_multihost

        initialize_multihost(args.coordinator, args.num_hosts, args.host_id)
    import jax.numpy as jnp

    from .engine.engine import Engine
    from .pipeline import load_pipeline

    if not args.model:
        print("error: no model path (argument or [model].path in --config)",
              file=sys.stderr)
        raise SystemExit(2)

    override = None
    if args.chat_template:
        with open(args.chat_template) as f:
            override = f.read()
    pipe = load_pipeline(args.model, isq=args.isq, chat_template_override=override,
                         from_uqff=getattr(args, "from_uqff", None))
    from .models.llama import fuse_projections
    from .pipeline import make_adapter

    adapter = make_adapter(pipe.cfg, pipe.weights)
    wants_mesh = getattr(args, "tp", 1) * getattr(args, "dp", 1) > 1
    if adapter is None and not wants_mesh:
        # merged QKV / gate+up: single-chip perf win; the TP sharding specs
        # address the unfused layout (column shards of a concatenated QKV
        # would need per-shard interleaving)
        pipe.weights = fuse_projections(pipe.weights, pipe.cfg)
    max_len = args.max_seq_len or min(pipe.cfg.max_position_embeddings, 8192)
    num_blocks = args.num_kv_blocks
    if num_blocks is None:
        # HBM-utilization-driven sizing (calculate_cache_config analog):
        # fill free device memory with KV blocks after the weights
        from .kv.paged import calculate_cache_config

        kv_cfg = getattr(pipe.cfg, "text", None) or pipe.cfg
        try:
            num_blocks = calculate_cache_config(
                kv_cfg, block_size=args.block_size, max_model_len=max_len,
                max_batch=args.max_batch, kv_quant=args.kv_quant is not None,
                tp_shards=max(1, getattr(args, "tp", 1) or 1),
            )
        except (AttributeError, TypeError):  # bespoke adapter configs
            num_blocks = (max_len // args.block_size) * max(2, args.max_batch // 2)
    draft = None
    if getattr(args, "draft_model", None):
        dpipe = load_pipeline(args.draft_model)
        dpipe.weights = fuse_projections(dpipe.weights, dpipe.cfg)
        draft = (dpipe.cfg, dpipe.weights)
    mesh = _build_mesh(args, pipe.cfg)
    max_batch = args.max_batch
    if mesh is not None:
        dp = int(mesh.shape.get("data", 1))
        if max_batch % dp:  # engine requires equal per-group slot planes
            max_batch += dp - max_batch % dp
            print(f"warning: rounding --max-batch up to {max_batch} "
                  f"(divisible by dp={dp})", file=sys.stderr)
    eng = Engine(
        pipe.cfg,
        pipe.weights,
        num_blocks=num_blocks,
        block_size=args.block_size,
        max_batch=max_batch,
        max_model_len=max_len,
        kv_quant=args.kv_quant,
        tokenizer=pipe.tokenizer,
        draft=draft,
        gamma=getattr(args, "gamma", 4),
        adapter=adapter,
        mesh=mesh,
    )
    return pipe, eng


def cmd_run(args):
    from .engine.sampler import SamplingParams

    pipe, eng = _build_engine(args)
    if pipe.tokenizer is None:
        print("error: model has no tokenizer; `run` needs one", file=sys.stderr)
        return 1
    print(f"loaded {pipe.model_id} ({pipe.cfg.arch}); empty line to exit", flush=True)
    history = []
    while True:
        try:
            line = input("> ")
        except EOFError:
            break
        if not line.strip():
            break
        history.append({"role": "user", "content": line})
        prompt = pipe.chat_template.render(history, add_generation_prompt=True)
        ids = pipe.tokenizer.encode(prompt)
        detok = pipe.tokenizer.detokenizer()

        def on_tokens(toks, fin):
            text = detok.push(toks)
            if fin:
                text += detok.flush()
            if text:
                print(text, end="", flush=True)

        seq = eng.add_request(
            ids,
            SamplingParams(temperature=args.temperature, max_tokens=args.max_tokens),
            on_tokens=on_tokens,
        )
        eng.run_to_completion()
        print()
        history.append(
            {"role": "assistant", "content": pipe.tokenizer.decode(seq.generated_ids)}
        )
    return 0


def cmd_serve(args):
    from .serving.server import ServerState, serve

    pipe, eng = _build_engine(args)
    if pipe.tokenizer is None:
        print("error: model has no tokenizer; `serve` needs one", file=sys.stderr)
        return 1
    driver = None
    if _multihost_args(args) and args.num_hosts > 1:
        from .parallel.multihost import (
            LockstepDriver, RequestReplicator, default_decode_request,
        )

        host0 = args.coordinator.rsplit(":", 1)[0]
        rep = RequestReplicator(args.host_id, args.num_hosts,
                                port=args.replicator_port, host0_address=host0)
        if args.host_id != 0:
            # worker host: no HTTP server — admit replicated requests and
            # step in lockstep with host 0 (daemon loop analog, §3.4)
            rep.connect(timeout=300.0)
            print(f"worker host {args.host_id}: lockstep loop", flush=True)
            LockstepDriver(rep, eng, default_decode_request).run_worker()
            return 0
        rep.start_server()
        driver = LockstepDriver(rep, eng)
    state = ServerState(eng, pipe.tokenizer, pipe.chat_template, pipe.model_id,
                        vlm=pipe.vlm, driver=driver)
    print(f"serving {pipe.model_id} on {args.host}:{args.port}", flush=True)
    try:
        serve(state, host=args.host, port=args.port)
    finally:
        if driver is not None:
            driver.shutdown()
    return 0


def cmd_bench(args):
    """Latency/throughput sweep (the analog of `mistralrs bench`,
    mistralrs-cli/src/commands/bench.rs:79)."""
    import numpy as np

    from .engine.sampler import SamplingParams

    pipe, eng = _build_engine(args)
    rng = np.random.default_rng(0)
    results = []
    for plen in args.prompt_lens:
        gen = args.gen_tokens
        prompts = [
            [int(x) for x in rng.integers(4, pipe.cfg.vocab_size - 1, plen)]
            for _ in range(args.concurrency)
        ]
        for warm in (True, False):
            t0 = time.perf_counter()
            ttft = [None] * len(prompts)

            seqs = []
            for i, p in enumerate(prompts):
                def cb(toks, fin, i=i):
                    if ttft[i] is None:
                        ttft[i] = time.perf_counter() - t0
                seqs.append(
                    eng.add_request(
                        p,
                        SamplingParams(temperature=0.0, max_tokens=gen),
                        on_tokens=cb,
                    )
                )
            eng.run_to_completion()
            dt = time.perf_counter() - t0
            if warm:
                continue
            n_gen = sum(len(s.generated_ids) for s in seqs)
            valid_ttft = [t for t in ttft if t is not None]
            worst_ttft = max(valid_ttft) if valid_ttft else None
            results.append(
                {
                    "prompt_len": plen,
                    "concurrency": args.concurrency,
                    "prefill_tps": (
                        round(plen * len(prompts) / worst_ttft, 1) if worst_ttft else None
                    ),
                    "decode_tps": round(n_gen / dt, 1),
                    "ttft_s": round(worst_ttft, 3) if worst_ttft else None,
                    "total_s": round(dt, 3),
                }
            )
    print(json.dumps(results, indent=2))
    return 0


def cmd_quantize(args):
    """HF safetensors → quantized GGUF (the analog of `mistralrs quantize`)."""
    from .convert import convert_hf_to_gguf
    from .models.config import config_from_hf
    from .models.hf_loader import load_safetensors_dir
    from .pipeline import parse_isq

    import json as _json
    from pathlib import Path

    src = Path(args.model)
    with open(src / "config.json") as f:
        cfg = config_from_hf(_json.load(f))
    sd = load_safetensors_dir(src)
    t = parse_isq(args.quant)
    tok_md = None
    tok_path = src / "tokenizer.json"
    if tok_path.exists():
        from tokenizers import Tokenizer

        from .convert import tokenizer_metadata_from_hf

        tok_md = tokenizer_metadata_from_hf(Tokenizer.from_file(str(tok_path)))
    im = None
    if getattr(args, "imatrix", None):
        from .imatrix import load_imatrix

        im = load_imatrix(args.imatrix)
    if str(args.output).endswith(".uqff"):
        # mistral.rs-interoperable UQFF artifact instead of GGUF
        from .uqff import save_reference_uqff

        save_reference_uqff(args.output, sd, t)
    else:
        convert_hf_to_gguf(
            sd, cfg, args.output, quant=t, tokenizer_metadata=tok_md, imatrix=im
        )
    print(f"wrote {args.output}")
    return 0


def cmd_imatrix(args):
    """Collect an importance matrix over calibration text (the analog of the
    reference's imatrix collection pass)."""
    import json as _json
    from pathlib import Path

    import numpy as np

    from .imatrix import ImatrixCollector, save_imatrix
    from .models.config import config_from_hf
    from .models.hf_loader import load_safetensors_dir, weights_from_state_dict


    src = Path(args.model)
    with open(src / "config.json") as f:
        cfg = config_from_hf(_json.load(f))
    sd = load_safetensors_dir(src)
    import jax.numpy as jnp

    weights = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    from .tokenizer import from_file as _tok_from_file

    tok = _tok_from_file(src / "tokenizer.json")
    coll = ImatrixCollector(cfg)
    chunk = args.chunk
    with open(args.text) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            ids = tok.encode(line)[: chunk]
            if len(ids) < 2:
                continue
            coll.update(weights, np.asarray(ids, np.int32)[None])
    save_imatrix(args.output, coll.finalize())
    print(f"wrote {args.output} ({coll.tokens} calibration tokens)")
    return 0


def cmd_perplexity(args):
    """Sliding-window perplexity over a text file (quality validation; the
    analog of llama.cpp's `perplexity` tool — the reference validates its
    quants against it, `releases/v0.8.2/report.md:47`)."""
    import json as _json

    import jax.numpy as jnp

    from .perplexity import compute_perplexity
    from .pipeline import load_pipeline

    compute_dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]
    results = {}
    quants = [None] + [q for q in (args.compare_isq or "").split(",") if q]
    with open(args.text) as f:
        text = f.read()
    for q in quants:
        pipe = load_pipeline(args.model, isq=q, dtype=compute_dtype)
        if pipe.tokenizer is None:
            print("error: model has no tokenizer", file=sys.stderr)
            return 1
        ids = pipe.tokenizer.encode(text)
        if args.max_tokens:
            ids = ids[: args.max_tokens]
        r = compute_perplexity(
            pipe.weights, pipe.cfg, ids, window=args.window,
            batch_size=args.batch_size, compute_dtype=compute_dtype,
            progress=not args.quiet,
        )
        label = q or "base"
        results[label] = r
        line = {"model": pipe.model_id, "quant": label, **r}
        if q is not None:
            line["delta_ppl"] = r["ppl"] - results["base"]["ppl"]
        print(_json.dumps({k: round(v, 6) if isinstance(v, float) else v
                           for k, v in line.items()}))
    return 0


def cmd_mcp_serve(args):
    from .chat_template import resolve_chat_template
    from .serving.mcp_server import McpModelServer
    from .serving.registry import ModelInstance

    pipe, eng = _build_engine(args)
    inst = ModelInstance(
        model_id=pipe.model_id, engine=eng, tokenizer=pipe.tokenizer,
        chat_template=pipe.chat_template,
    )
    McpModelServer(inst, name=pipe.model_id).serve_stdio()
    return 0


def cmd_tune(args):
    """Quant fit/recommendation report (the analog of `mistralrs tune`)."""
    import json as _json
    from pathlib import Path

    from .models.config import config_from_gguf, config_from_hf
    from .tuning import V5E_HBM_BYTES, V5P_HBM_BYTES, V6E_HBM_BYTES, auto_tune

    p = Path(args.model)
    if p.is_file() and p.suffix == ".gguf":
        from .gguf.reader import GGUFContent

        cfg = config_from_gguf(GGUFContent.open(str(p)).metadata)
    else:
        with open(p / "config.json") as f:
            cfg = config_from_hf(_json.load(f))
    hbm = {"v5e": V5E_HBM_BYTES, "v5p": V5P_HBM_BYTES, "v6e": V6E_HBM_BYTES}[args.chip]
    report = auto_tune(
        cfg, hbm_bytes=hbm, context_len=args.context_len, batch=args.batch
    )
    if getattr(args, "chips", 1) and args.chips > 1:
        from .tuning import QUANT_LEVELS, recommend_mesh

        bpw = {n: b for n, b, _ in QUANT_LEVELS}.get(
            report["recommended"] or "q4k", 4.8
        )
        report["mesh"] = recommend_mesh(
            cfg, args.chips, hbm_bytes=hbm, context_len=args.context_len,
            batch=args.batch, quant_bpw=bpw,
        )
    print(_json.dumps(report, indent=2))
    return 0


def cmd_doctor(args):
    """Environment health check (the analog of `mistralrs doctor`,
    mistralrs-core/src/diagnostics.rs:408)."""
    import platform

    info = {"python": sys.version.split()[0], "platform": platform.platform()}
    try:
        import jax

        info["jax"] = jax.__version__
        info["backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
        import jax.numpy as jnp

        x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
        jax.block_until_ready(x)
        info["matmul_check"] = "ok"
    except Exception as e:  # noqa: BLE001
        info["jax_error"] = str(e)
    for mod in ("flax", "tokenizers", "safetensors", "aiohttp", "jinja2"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "present")
        except ImportError:
            info[mod] = "MISSING"
    print(json.dumps(info, indent=2))
    return 0


def cmd_uqff_inspect(args):
    """Print a UQFF artifact's inventory (ours or mistral.rs v1.x) without
    materializing tensors — the `uqff-inspect` analog."""
    from safetensors import safe_open

    from .uqff import _UQFF_GGML_CODES, is_reference_uqff

    out = {"path": args.path, "format": None, "tensors": []}
    with safe_open(args.path, framework="np") as f:
        keys = list(f.keys())
        meta = f.metadata() or {}
        if is_reference_uqff(args.path):
            out["format"] = "mistral.rs-uqff"
            prefixes = sorted({k.rsplit(".", 1)[0] for k in keys
                               if k.endswith(".weight")})
            for p in prefixes:
                entry = {"name": p}
                for field in ("format", "dtype", "shape"):
                    k = f"{p}.{field}"
                    if k in keys:
                        v = f.get_tensor(k)
                        if field == "format":
                            code = int(v.reshape(-1)[0])
                            entry["quant"] = str(
                                _UQFF_GGML_CODES.get(code, code)
                            )
                        elif field == "shape":
                            entry["shape"] = [int(x) for x in v.reshape(-1)]
                        else:
                            entry["dtype_code"] = int(v.reshape(-1)[0])
                out["tensors"].append(entry)
        else:
            out["format"] = "mistralrs_tpu-uqff"
            out["metadata"] = {k: meta[k] for k in sorted(meta)} if meta else {}
            for k in sorted(keys):
                sl = f.get_slice(k)
                out["tensors"].append(
                    {"name": k, "shape": list(sl.get_shape()),
                     "dtype": str(sl.get_dtype())}
                )
    out["tensor_count"] = len(out["tensors"])
    print(json.dumps(out, indent=2))
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="mistralrs_tpu", description="TPU-native quantized LLM inference"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("run", help="interactive chat REPL")
    _add_model_args(p)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--max-tokens", type=int, default=512)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("serve", help="OpenAI-compatible HTTP server")
    _add_model_args(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="latency/throughput sweep")
    _add_model_args(p)
    p.add_argument("--prompt-lens", type=int, nargs="+", default=[128, 512])
    p.add_argument("--gen-tokens", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=1)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("quantize", help="HF safetensors → quantized GGUF")
    p.add_argument("model", help="HF model directory")
    p.add_argument("--quant", default="q4k")
    p.add_argument("--imatrix", help="imatrix .npz from the `imatrix` command")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("imatrix", help="collect an importance matrix (calibration)")
    p.add_argument("model", help="HF model directory")
    p.add_argument("--text", required=True, help="calibration text file (one prompt per line)")
    p.add_argument("--chunk", type=int, default=512, help="max tokens per line")
    p.add_argument("-o", "--output", required=True, help="output .npz")
    p.set_defaults(fn=cmd_imatrix)

    p = sub.add_parser("perplexity", help="sliding-window perplexity (quality check)")
    p.add_argument("model", help="model path (.gguf or HF dir)")
    p.add_argument("text", help="evaluation text file")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-tokens", type=int, default=0, help="limit eval tokens")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument(
        "--compare-isq", default="",
        help="comma list of ISQ types to also evaluate (prints delta_ppl vs base)",
    )
    p.add_argument("-q", "--quiet", action="store_true")
    p.set_defaults(fn=cmd_perplexity)

    p = sub.add_parser("mcp-serve", help="expose the model as an MCP tool server (stdio)")
    _add_model_args(p)
    p.set_defaults(fn=cmd_mcp_serve)

    p = sub.add_parser("tune", help="quantization fit/recommendation report")
    p.add_argument("model", help="model path (.gguf or HF dir)")
    p.add_argument("--chip", choices=["v5e", "v5p", "v6e"], default="v5e")
    p.add_argument("--context-len", type=int, default=4096)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chips", type=int, default=1,
                   help="chip count: adds a (tp, dp) mesh recommendation "
                        "(the auto-device-map analog)")
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("doctor", help="environment health check")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser("uqff-inspect", help="list a UQFF artifact's contents")
    p.add_argument("path")
    p.set_defaults(fn=cmd_uqff_inspect)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
