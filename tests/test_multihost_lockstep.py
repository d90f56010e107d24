"""Two-process lockstep serving determinism — the analog of the reference's
daemon replication + lockstep scheduling (`distributed.rs:174-345`):
a REAL worker process mirrors host 0's request stream step-by-step and must
produce byte-identical token streams for every request."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.parallel.multihost import LockstepDriver, RequestReplicator

CFG_KW = dict(
    arch="llama", vocab_size=128, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    max_position_embeddings=256,
)
ENG_KW = dict(num_blocks=24, block_size=4, max_batch=3, prefill_chunk=8)

WORKER_SRC = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models import ModelConfig, init_random_weights
    from mistralrs_tpu.parallel.multihost import LockstepDriver, RequestReplicator

    port = int(sys.argv[1])
    cfg = ModelConfig(**{cfg_kw})
    weights = init_random_weights(cfg, seed=11)
    eng = Engine(cfg, weights, backend="xla", compute_dtype=jnp.float32,
                 **{eng_kw})
    rep = RequestReplicator(host_id=1, num_hosts=2, port=port)
    rep.connect()

    def decode_request(req):
        return req["prompt_ids"], SamplingParams(**req["params"])

    drv = LockstepDriver(rep, eng, decode_request)
    fin = drv.run_worker()
    out = {{seq.request_id: seq.generated_ids for seq in fin}}
    print("RESULT " + json.dumps(out), flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_lockstep_determinism(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(
        WORKER_SRC.format(cfg_kw=repr(CFG_KW), eng_kw=repr(ENG_KW))
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, str(script), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        cfg = ModelConfig(**CFG_KW)
        weights = init_random_weights(cfg, seed=11)
        eng = Engine(cfg, weights, backend="xla", compute_dtype=jnp.float32,
                     **ENG_KW)
        rep = RequestReplicator(host_id=0, num_hosts=2, port=port)
        rep.start_server()
        drv = LockstepDriver(rep, eng)

        rng = np.random.default_rng(2)
        seqs = {}

        def submit(i, n_prompt, max_tokens, temperature):
            rid = f"req-{i}"
            prompt = [int(x) for x in rng.integers(1, 128, n_prompt)]
            params = {"temperature": temperature, "max_tokens": max_tokens}
            seqs[rid] = drv.submit(
                {"request_id": rid, "prompt_ids": prompt, "params": params},
                prompt, SamplingParams(**params),
            )

        # staggered arrivals (mid-stream submissions exercise the coupling),
        # mixed greedy + sampled, more requests than slots (preemption on
        # both ranks must also be identical)
        submit(0, 5, 8, 0.0)
        submit(1, 11, 6, 0.8)
        drv.step()
        drv.step()
        submit(2, 3, 10, 0.0)
        submit(3, 7, 6, 0.9)
        drv.step()
        submit(4, 9, 8, 0.0)
        while eng.has_work:
            drv.step()
        drv.shutdown()

        out, err = proc.communicate(timeout=180)
        result_lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert result_lines, f"worker produced no result\nstdout={out}\nstderr={err[-2000:]}"
        worker_tokens = json.loads(result_lines[-1][len("RESULT "):])

        assert len(worker_tokens) == 5
        for rid, seq in seqs.items():
            assert worker_tokens[rid] == seq.generated_ids, (
                rid, worker_tokens[rid], seq.generated_ids
            )
    finally:
        if proc.poll() is None:
            proc.kill()


DIST_SRC = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mistralrs_tpu.parallel.multihost import initialize_multihost

    coord, pid = sys.argv[1], int(sys.argv[2])
    initialize_multihost(coord, 2, pid)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    assert jax.device_count() == 2 and jax.process_count() == 2
    mesh = Mesh(jax.devices(), ("data",))

    def f(x):
        return jax.lax.psum(x, "data")

    local = jnp.asarray([float(pid + 1)])
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (2,)
    )
    out = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())
    )(arr)
    got = float(jax.device_get(out.addressable_shards[0].data)[0])
    assert got == 3.0, got
    print(f"DIST_OK {pid} {got}", flush=True)
    """
)


def test_two_process_jax_distributed_psum(tmp_path):
    """Real jax.distributed bring-up: 2 CPU processes, one global mesh,
    cross-process psum (the NCCL-id-exchange + collective path analog)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "dist.py"
    script.write_text(DIST_SRC)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    # conftest forces an 8-device virtual CPU mesh; these processes need 1
    # local device each so the GLOBAL mesh is the 2 processes
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        if rc != 0 and ("UNIMPLEMENTED" in err or "not supported" in err):
            pytest.skip(f"cross-process CPU collectives unavailable: {err[-200:]}")
        assert rc == 0, f"rc={rc}\nstdout={out}\nstderr={err[-2000:]}"
        assert "DIST_OK" in out


MM_WORKER_SRC = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models import ModelConfig, init_random_weights
    from mistralrs_tpu.parallel.multihost import (
        LockstepDriver, RequestReplicator, default_decode_request,
    )

    port = int(sys.argv[1])
    cfg = ModelConfig(**{cfg_kw})
    weights = init_random_weights(cfg, seed=11)
    eng = Engine(cfg, weights, backend="xla", compute_dtype=jnp.float32,
                 **{eng_kw})
    rep = RequestReplicator(host_id=1, num_hosts=2, port=port)
    rep.connect()
    drv = LockstepDriver(rep, eng, default_decode_request)
    fin = drv.run_worker()
    out = {{seq.request_id: seq.generated_ids for seq in fin}}
    print("RESULT " + json.dumps(out), flush=True)
    """
)


def test_two_process_lockstep_multimodal(tmp_path):
    """Multimodal requests on the lockstep wire: merged VLM embeds + M-RoPE
    streams base64-replicate to the worker, whose token stream must be
    byte-identical (round-4 'multimodal on multi-host' exclusion, lifted;
    reference replicates full multimodal requests to daemons,
    distributed.rs:174)."""
    from mistralrs_tpu.parallel.multihost import encode_payload

    mm_cfg = dict(CFG_KW, mrope_section=(2, 1, 1))
    port = _free_port()
    script = tmp_path / "worker_mm.py"
    script.write_text(
        MM_WORKER_SRC.format(cfg_kw=repr(mm_cfg), eng_kw=repr(ENG_KW))
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, str(script), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        cfg = ModelConfig(**mm_cfg)
        weights = init_random_weights(cfg, seed=11)
        eng = Engine(cfg, weights, backend="xla", compute_dtype=jnp.float32,
                     **ENG_KW)
        rep = RequestReplicator(host_id=0, num_hosts=2, port=port)
        rep.start_server()
        drv = LockstepDriver(rep, eng)

        rng = np.random.default_rng(5)
        T = 6
        embeds = rng.standard_normal((T, cfg.hidden_size)).astype(np.float32) * 0.05
        pos3 = np.stack(
            [np.arange(T), np.arange(T) // 2, np.arange(T) % 3]
        ).astype(np.int32)
        seqs = {}

        def submit(i, prompt, params_d, mm):
            rid = f"mm-{i}"
            req = {"request_id": rid, "prompt_ids": list(prompt),
                   "params": params_d}
            if mm:
                req["mm"] = {k: encode_payload(v) for k, v in mm.items()}
            seqs[rid] = drv.submit(req, list(prompt),
                                   SamplingParams(**params_d), **mm)

        submit(0, [7] * T, {"temperature": 0.0, "max_tokens": 6},
               {"prompt_embeds": embeds, "mrope_positions": pos3})
        submit(1, [1, 5, 9], {"temperature": 0.0, "max_tokens": 6}, {})
        drv.step()
        submit(2, [3] * T, {"temperature": 0.0, "max_tokens": 4},
               {"prompt_embeds": embeds * 2.0, "mrope_positions": pos3})
        while eng.has_work:
            drv.step()
        drv.shutdown()

        out, err = proc.communicate(timeout=180)
        result_lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert result_lines, f"worker produced no result\nstdout={out}\nstderr={err[-2000:]}"
        worker_tokens = json.loads(result_lines[-1][len("RESULT "):])
        assert len(worker_tokens) == 3
        for rid, seq in seqs.items():
            assert worker_tokens[rid] == seq.generated_ids, (
                rid, worker_tokens[rid], seq.generated_ids
            )
        # the media payload actually matters: the two embed requests diverge
        assert seqs["mm-0"].generated_ids != seqs["mm-2"].generated_ids
    finally:
        if proc.poll() is None:
            proc.kill()
