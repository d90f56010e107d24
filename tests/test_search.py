"""Search/extract tools with injected fetchers + RAG rerank (analog of
mistralrs-core/src/search tests)."""

import json

import numpy as np

from mistralrs_tpu.search import SearchTools, html_to_text


def _fake_fetch_json(url):
    assert "format=json" in url and "q=tpu%20inference" in url
    return {
        "results": [
            {"title": "Cooking pasta", "url": "http://a", "content": "boil water"},
            {"title": "TPU inference guide", "url": "http://b",
             "content": "serving LLMs on TPU v5e"},
            {"title": "Gardening", "url": "http://c", "content": "plant seeds"},
        ]
    }


def _fake_embed(texts):
    # toy embedding: count of overlap with 'tpu'/'inference'
    out = []
    for t in texts:
        tl = t.lower()
        out.append([tl.count("tpu") + tl.count("inference"), 1.0])
    return np.asarray(out, np.float32)


def test_search_with_rag_rerank():
    st = SearchTools(fetch_json=_fake_fetch_json, fetch_text=lambda u: "",
                     embed_fn=_fake_embed)
    res = st.search("tpu inference", n_results=2)
    assert res[0].url == "http://b"  # reranked to the top
    assert len(res) == 2


def test_extract_and_html_to_text():
    html = """<html><head><style>x{}</style></head>
    <body><h1>Title</h1><p>Hello <b>world</b> &amp; friends</p>
    <script>bad()</script></body></html>"""
    st = SearchTools(fetch_text=lambda u: html, fetch_json=lambda u: {})
    text = st.extract("http://x")
    assert "Title" in text and "Hello world & friends" in text
    assert "bad()" not in text and "style" not in text


def test_tool_callbacks_shapes():
    st = SearchTools(fetch_json=_fake_fetch_json, fetch_text=lambda u: "<p>hi</p>")
    cbs = st.tool_callbacks()
    out = json.loads(cbs["web_search"]({"query": "tpu inference"}))
    assert out and {"title", "url", "snippet"} <= set(out[0])
    assert cbs["web_extract"]({"url": "http://x"}) == "hi"
    names = [s["function"]["name"] for s in st.tool_schemas()]
    assert names == ["web_search", "web_extract"]
