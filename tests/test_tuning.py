

def test_recommend_mesh():
    """Mesh recommendation (the auto-device-map analog): smallest fitting
    TP wins, divisibility rules hold, and over-budget configs escalate."""
    from mistralrs_tpu.models import ModelConfig
    from mistralrs_tpu.tuning import recommend_mesh

    small = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8, head_dim=128,
    )
    r = recommend_mesh(small, 8, context_len=4096, batch=8)
    assert r["fits"] and r["recommended"] == {"tp": 1, "dp": 8}

    big = ModelConfig(
        arch="llama", vocab_size=128256, hidden_size=8192,
        intermediate_size=28672, num_layers=80, num_heads=64,
        num_kv_heads=8, head_dim=128,
    )  # ~70B: q4k ≈ 40 GB → needs tp ≥ 4 on 16 GB chips
    r = recommend_mesh(big, 8, context_len=2048, batch=8)
    assert r["fits"] and r["recommended"]["tp"] >= 4
    # tp must divide kv heads (8): every candidate obeys
    assert all(8 % c["tp"] == 0 for c in r["candidates"])

    r1 = recommend_mesh(big, 1)
    assert not r1["fits"]  # one chip can't hold 70B q4k
