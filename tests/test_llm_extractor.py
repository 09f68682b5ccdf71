"""End-to-end exercise of the LLM tuple-extraction seam (pipeline/kg.py
llm_extractor — the reference's OllamaTupleStreamer.cpp/VLLMTupleStreamer.cpp
surface) against a local deterministic fake endpoint: proves the
executor-side HTTP batching, the retry/backoff path, and the output schema
contract without any LLM runtime in the container."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from jasminegraph_spark.pipeline.kg import extract_triples, llm_extractor

TRIPLE_RE = re.compile(r"[a-z]+ [a-z]+ [a-z]+")


class _FakeLLMHandler(BaseHTTPRequestHandler):
    """Deterministic stand-in for an Ollama/vLLM tuple streamer: extracts
    greedy non-overlapping lowercase token triples — the same semantics as
    the regex extractor, so Spark-side results are directly comparable."""

    fail_first = 0  # class-level: number of requests to 500 before serving
    seen_batches: list = []

    def do_POST(self):  # noqa: N802 (stdlib naming)
        cls = type(self)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        with cls.lock:
            if cls.fail_first > 0:
                cls.fail_first -= 1
                self.send_response(500)
                self.end_headers()
                return
            cls.seen_batches.append(len(body["documents"]))
        triples = []
        for doc in body["documents"]:
            for m in TRIPLE_RE.findall(doc["text"]):
                s, p, o = m.split(" ")
                triples.append({"doc_id": doc["doc_id"], "s": s, "p": p, "o": o})
        payload = json.dumps({"triples": triples}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def fake_llm():
    _FakeLLMHandler.lock = threading.Lock()
    _FakeLLMHandler.fail_first = 0
    _FakeLLMHandler.seen_batches = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeLLMHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/extract"
    srv.shutdown()
    srv.server_close()


def _docs(spark, n=10):
    rows = [(i, f"alpha{i % 3} beats gamma and x y z end") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_llm_extractor_matches_deterministic_path(spark, fake_llm):
    docs = _docs(spark).coalesce(1)
    via_http = llm_extractor(docs, fake_llm).collect()
    via_regex = extract_triples(docs).collect()
    key = lambda r: (r["doc_id"], r["s"], r["p"], r["o"])  # noqa: E731
    assert sorted(map(key, via_http)) == sorted(map(key, via_regex))
    assert len(via_http) > 0


def test_llm_extractor_batches_requests(spark, fake_llm):
    docs = _docs(spark, n=10).coalesce(1)
    llm_extractor(docs, fake_llm, batch_size=4).collect()
    # 10 docs in one partition at batch_size 4 → 4+4+2
    assert sorted(_FakeLLMHandler.seen_batches) == [2, 4, 4]


def test_llm_extractor_retries_transient_failures(spark, fake_llm):
    _FakeLLMHandler.fail_first = 2  # first two attempts 500 → retry succeeds
    docs = _docs(spark, n=3).coalesce(1)
    out = llm_extractor(docs, fake_llm, batch_size=8, max_retries=4).collect()
    assert len(out) == 3 * 2  # two triples per doc


def test_llm_extractor_exhausted_retries_raise(spark, fake_llm):
    _FakeLLMHandler.fail_first = 10**6
    docs = _docs(spark, n=2).coalesce(1)
    with pytest.raises(Exception):
        llm_extractor(docs, fake_llm, batch_size=8, max_retries=2).collect()
