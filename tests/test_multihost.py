"""Request replication over the loopback side channel (the multi-host SPMD
request-fanout path, SURVEY.md §3.4; the reference has no such test)."""

import threading

from mistralrs_tpu.parallel.multihost import RequestReplicator


def test_request_replication_loopback():
    import socket as _socket

    _s = _socket.socket()
    _s.bind(("127.0.0.1", 0))
    port = _s.getsockname()[1]
    _s.close()
    host0 = RequestReplicator(0, 3, port=port)
    w1 = RequestReplicator(1, 3, port=port)
    w2 = RequestReplicator(2, 3, port=port)

    t = threading.Thread(target=host0.start_server)
    t.start()
    w1.connect()
    w2.connect()
    t.join(timeout=5)

    reqs = [{"request_id": f"r{i}", "prompt": [1, 2, i]} for i in range(5)]
    got1, got2 = [], []

    def drain(w, out, n):
        it = w.recv_loop()
        for _ in range(n):
            out.append(next(it))

    t1 = threading.Thread(target=drain, args=(w1, got1, 5))
    t2 = threading.Thread(target=drain, args=(w2, got2, 5))
    t1.start(); t2.start()
    for r in reqs:
        host0.broadcast(r)
    t1.join(timeout=5); t2.join(timeout=5)
    assert got1 == reqs  # ordered, complete
    assert got2 == reqs
    host0.close(); w1.close(); w2.close()
