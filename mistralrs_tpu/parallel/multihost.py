"""Multi-host serving scaffolding — the analog of the reference's
multi-process/multi-node TP driver (`mistralrs-core/src/distributed.rs`:
daemon replicator loops :174-345, IPC request replication §3.4 of SURVEY.md),
mapped onto multi-controller JAX.

Model: every host runs the SAME engine loop (SPMD). Host 0 owns the public
server; requests are broadcast to all hosts over a TCP side channel (the
analog of `ipc_name()` local sockets), each host's scheduler makes identical
decisions on the identical request stream, and the jitted step's collectives
keep ranks in lockstep. Only host 0's responses reach users.

On a real pod slice:

    initialize_multihost(coordinator, num_hosts, host_id)
    mesh = build_pod_mesh(tp=8, dp=num_hosts)         # model axis within a
                                                      # host (ICI), data across
    replicator = RequestReplicator(host_id, num_hosts, port)
    # host 0: replicator.broadcast(request) before scheduling it
    # hosts >0: for req in replicator.recv_loop(): engine.add_request(req)
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Any, Callable, Iterator, Optional

import jax


def initialize_multihost(
    coordinator_address: str, num_processes: int, process_id: int
) -> None:
    """jax.distributed bring-up (NCCL-id-exchange analog)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def build_pod_mesh(tp: int, dp: int):
    """(data, model) mesh over all pod devices: model axis contiguous within
    a host so TP collectives ride ICI, data axis spans hosts over DCN."""
    from jax.sharding import Mesh
    import numpy as np

    devs = np.asarray(jax.devices())
    if devs.size != tp * dp:
        raise ValueError(f"need {tp * dp} devices, have {devs.size}")
    return Mesh(devs.reshape(dp, tp), ("data", "model"))


def _send_msg(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack("<I", len(payload)) + payload)


def _recv_msg(sock: socket.socket) -> Optional[bytes]:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = struct.unpack("<I", hdr)
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


class RequestReplicator:
    """TCP fan-out of serialized requests from host 0 to every other host
    (the analog of `replicate_request_to_daemons`, engine/mod.rs:962)."""

    def __init__(self, host_id: int, num_hosts: int, port: int = 19777,
                 host0_address: str = "127.0.0.1"):
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.port = port
        self.host0_address = host0_address
        self._conns: list[socket.socket] = []
        self._server: Optional[socket.socket] = None
        self._client: Optional[socket.socket] = None
        self._lock = threading.Lock()

    # -- host 0 --------------------------------------------------------------

    def start_server(self) -> None:
        assert self.host_id == 0
        self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._server.bind(("0.0.0.0", self.port))
        self._server.listen(self.num_hosts)
        for _ in range(self.num_hosts - 1):
            conn, _ = self._server.accept()
            self._conns.append(conn)

    def broadcast(self, request: dict[str, Any]) -> None:
        """Send a request to every worker host (call before scheduling it
        locally, so all ranks observe the same order)."""
        payload = json.dumps(request).encode()
        with self._lock:
            for conn in self._conns:
                _send_msg(conn, payload)

    # -- workers -------------------------------------------------------------

    def connect(self, timeout: float = 60.0) -> None:
        assert self.host_id != 0
        self._client = socket.create_connection(
            (self.host0_address, self.port), timeout=timeout
        )

    def recv_loop(self) -> Iterator[dict[str, Any]]:
        """Yield replicated requests (daemon replicator loop analog)."""
        assert self._client is not None
        while True:
            msg = _recv_msg(self._client)
            if msg is None:
                return
            yield json.loads(msg)

    def close(self) -> None:
        for c in self._conns:
            c.close()
        if self._server:
            self._server.close()
        if self._client:
            self._client.close()


def encode_params(params) -> dict:
    """SamplingParams → JSON-safe dict for request replication. Grammar
    constraints and logprobs are host-0-only state that cannot ride the wire;
    they do not change scheduling, so workers sample unconstrained (their
    outputs are dropped — only host 0's responses reach users)."""
    import dataclasses

    d = dataclasses.asdict(params)
    d.pop("constraint", None)
    d["logit_bias"] = {str(k): v for k, v in (d.get("logit_bias") or {}).items()}
    for key in ("stop_token_ids", "stop_strings", "dry_sequence_breaker_ids"):
        d[key] = list(d.get(key) or ())
    return d


def decode_params(d: dict):
    """Inverse of :func:`encode_params`."""
    from ..engine.sampler import SamplingParams

    d = dict(d)
    d["logit_bias"] = {int(k): float(v) for k, v in (d.get("logit_bias") or {}).items()}
    for key in ("stop_token_ids", "stop_strings", "dry_sequence_breaker_ids"):
        d[key] = tuple(d.get(key) or ())
    return SamplingParams(**d)


def encode_payload(obj):
    """JSON-encode a request kwarg tree, tagging ndarray leaves as
    {"__nd__": {dtype, shape, b64}} — media tensors (merged VLM embeds,
    M-RoPE streams, DeepStack rows, mllama cross-K/V) replicate over the
    wire so every rank runs the identical SPMD forward (the analog of the
    reference replicating full multimodal requests to its daemon ranks,
    `mistralrs-core/src/distributed.rs:174`)."""
    import base64

    import numpy as _np

    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, (list, tuple)):
        return [encode_payload(v) for v in obj]
    if isinstance(obj, dict):
        return {str(k): encode_payload(v) for k, v in obj.items()}
    arr = _np.asarray(obj)
    return {
        "__nd__": {
            "dtype": str(arr.dtype),
            "shape": list(arr.shape),
            "b64": base64.b64encode(arr.tobytes()).decode("ascii"),
        }
    }


def decode_payload(obj):
    """Inverse of :func:`encode_payload`."""
    import base64

    import numpy as _np

    if isinstance(obj, dict):
        nd = obj.get("__nd__")
        if nd is not None and len(obj) == 1:
            return _np.frombuffer(
                base64.b64decode(nd["b64"]), dtype=_np.dtype(nd["dtype"])
            ).reshape(nd["shape"]).copy()
        return {k: decode_payload(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [decode_payload(v) for v in obj]
    return obj


def default_decode_request(req: dict) -> tuple:
    """Standard wire format: {"request_id", "prompt_ids", "params"[, "mm"]}.
    Returns (prompt_ids, params, mm_kwargs)."""
    mm = {k: decode_payload(v) for k, v in (req.get("mm") or {}).items()}
    return list(req["prompt_ids"]), decode_params(req.get("params") or {}), mm


class LockstepDriver:
    """Deterministic multi-host engine stepping (the analog of the
    reference's daemon replicator + lockstep scheduling,
    `mistralrs-core/src/distributed.rs:174-345`).

    Admission is COUPLED to stepping: host 0 drains its pending submissions,
    broadcasts them in one STEP message, admits them locally, then steps;
    workers block on the STEP message, admit the identical batch in the
    identical order, then step. Every rank's scheduler therefore sees the
    same request stream at the same step boundary — the free-running
    feeder-thread race is gone, and the jitted step's collectives stay in
    lockstep. Aborts replicate through the same channel.
    """

    def __init__(self, replicator: RequestReplicator, engine,
                 decode_request: Optional[Callable[[dict], tuple]] = None):
        self.rep = replicator
        self.engine = engine
        self.decode_request = decode_request
        self._pending: list[dict] = []
        self._pending_aborts: list[str] = []
        self._lock = threading.Lock()
        self.step_id = 0

    # -- host 0 --------------------------------------------------------------

    def submit(self, request: dict, prompt_ids, params, **local_kwargs) -> Any:
        """Queue a request (admitted at the next step on ALL ranks).
        Returns the local Sequence for response streaming. ``local_kwargs``
        (on_tokens, priority, ...) apply only to host 0's engine — they don't
        affect scheduling, so ranks stay in lockstep."""
        with self._lock:
            self._pending.append(dict(request))
        seq = self.engine.add_request(
            prompt_ids, params, request_id=request.get("request_id"),
            **local_kwargs,
        )
        return seq

    def abort(self, request_id: str) -> None:
        with self._lock:
            self._pending_aborts.append(request_id)
        self.engine.abort(request_id)

    def step(self) -> list:
        """One lockstep engine step on host 0: broadcast, then step."""
        with self._lock:
            new, aborts = self._pending, self._pending_aborts
            self._pending, self._pending_aborts = [], []
        self.rep.broadcast(
            {"kind": "step", "step_id": self.step_id, "requests": new,
             "aborts": aborts}
        )
        self.step_id += 1
        return self.engine.step()

    def shutdown(self) -> None:
        self.rep.broadcast({"kind": "stop"})

    # -- workers -------------------------------------------------------------

    def run_worker(self) -> list:
        """Blocking worker loop: admit each STEP message's batch, step.
        Returns every sequence finished over the session."""
        assert self.decode_request is not None
        finished = []
        for msg in self.rep.recv_loop():
            if msg.get("kind") == "stop":
                return finished
            for req in msg.get("requests", ()):
                decoded = self.decode_request(req)
                prompt_ids, params = decoded[0], decoded[1]
                mm = decoded[2] if len(decoded) > 2 else {}
                self.engine.add_request(
                    prompt_ids, params, request_id=req.get("request_id"),
                    priority=int(req.get("priority", 0)), **mm,
                )
            for rid in msg.get("aborts", ()):
                seq = self.engine.abort(rid)
                if seq is not None:
                    finished.append(seq)
            self.step_id = msg["step_id"] + 1
            finished.extend(self.engine.step())
        return finished
