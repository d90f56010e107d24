"""Web search + extract tools (the analog of `mistralrs-core/src/search/`:
SearxNG-compatible search with embedding-based RAG reranking of results,
`get_search_tools` mod.rs:158, rag.rs).

Networking is injected (``fetch_json`` / ``fetch_text`` callables) so the
tools are testable offline and deployable against any SearxNG instance.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import numpy as np

SEARCH_TOOL_SCHEMA = {
    "type": "function",
    "function": {
        "name": "web_search",
        "description": "Search the web. Returns titles, URLs and snippets.",
        "parameters": {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "n_results": {"type": "integer", "default": 5},
            },
            "required": ["query"],
        },
    },
}

EXTRACT_TOOL_SCHEMA = {
    "type": "function",
    "function": {
        "name": "web_extract",
        "description": "Fetch a URL and return its readable text content.",
        "parameters": {
            "type": "object",
            "properties": {"url": {"type": "string"}},
            "required": ["url"],
        },
    },
}


def _default_fetch_json(url: str) -> dict:
    import urllib.request

    with urllib.request.urlopen(url, timeout=20) as r:
        return json.loads(r.read())


def _default_fetch_text(url: str) -> str:
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "mistralrs-tpu/0.1"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read().decode("utf-8", errors="replace")


def html_to_text(html: str) -> str:
    """Crude readable-text extraction (script/style strip + tag removal)."""
    html = re.sub(r"(?is)<(script|style|noscript)[^>]*>.*?</\1>", " ", html)
    html = re.sub(r"(?i)<br\s*/?>|</p>|</div>|</h[1-6]>", "\n", html)
    text = re.sub(r"<[^>]+>", " ", html)
    text = re.sub(r"&nbsp;", " ", text)
    text = re.sub(r"&amp;", "&", text)
    text = re.sub(r"&lt;", "<", text)
    text = re.sub(r"&gt;", ">", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n\s*\n+", "\n\n", text)
    return text.strip()


@dataclass
class SearchResult:
    title: str
    url: str
    content: str
    score: float = 0.0


@dataclass
class SearchTools:
    """SearxNG client + optional embedding reranker."""

    searx_url: str = "http://localhost:8888"
    fetch_json: Callable[[str], dict] = field(default=None)  # type: ignore[assignment]
    fetch_text: Callable[[str], str] = field(default=None)  # type: ignore[assignment]
    # optional RAG reranker: (query, [texts]) → scores
    embed_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None
    max_extract_chars: int = 20000

    def __post_init__(self):
        if self.fetch_json is None:
            self.fetch_json = _default_fetch_json
        if self.fetch_text is None:
            self.fetch_text = _default_fetch_text

    def search(self, query: str, n_results: int = 5) -> list[SearchResult]:
        from urllib.parse import quote

        data = self.fetch_json(
            f"{self.searx_url}/search?q={quote(query)}&format=json"
        )
        results = [
            SearchResult(
                title=r.get("title", ""),
                url=r.get("url", ""),
                content=r.get("content", "") or "",
            )
            for r in data.get("results", [])
        ]
        if self.embed_fn is not None and results:
            # RAG rerank: cosine similarity of snippet embeddings to query
            texts = [query] + [f"{r.title}\n{r.content}" for r in results]
            vecs = np.asarray(self.embed_fn(texts), np.float32)
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=-1, keepdims=True), 1e-12
            )
            sims = vecs[1:] @ vecs[0]
            for r, s in zip(results, sims):
                r.score = float(s)
            results.sort(key=lambda r: r.score, reverse=True)
        return results[:n_results]

    def extract(self, url: str) -> str:
        text = html_to_text(self.fetch_text(url))
        return text[: self.max_extract_chars]

    # -- agentic-loop integration -------------------------------------------

    def tool_callbacks(self) -> dict:
        def web_search(args: dict) -> str:
            res = self.search(args["query"], int(args.get("n_results", 5)))
            return json.dumps(
                [{"title": r.title, "url": r.url, "snippet": r.content} for r in res]
            )

        def web_extract(args: dict) -> str:
            return self.extract(args["url"])

        return {"web_search": web_search, "web_extract": web_extract}

    def tool_schemas(self) -> list[dict]:
        return [SEARCH_TOOL_SCHEMA, EXTRACT_TOOL_SCHEMA]
