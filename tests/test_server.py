"""HTTP serving frontend: OpenAI-style completions over the Engine.

Greedy determinism makes the API testable end-to-end: a completion served
over HTTP must be token-identical to the same prompt through the plain
Engine API, including when concurrent clients batch together and when the
response is streamed (SSE chunks concatenate to the non-streamed result).
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import init_params
from cxl_speckv_tpu.server import SpeckvServer

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine():
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=64, num_host_blocks=64,
                          kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=2),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  seed=0)


def post(port, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.status, json.loads(r.read())


def prompts(n=3, seed=11):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 18)).tolist()
            for _ in range(n)]


@pytest.fixture(scope="module")
def server():
    with SpeckvServer(make_engine(), port=0) as srv:
        yield srv


def test_health_and_stats(server):
    assert get(server.port, "/health") == (200, {"status": "ok"})
    code, stats = get(server.port, "/v1/stats")
    assert code == 200 and "directory" in stats and "engine" in stats


def test_prometheus_metrics(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    lines = [ln for ln in body.strip().splitlines() if ln]
    assert any(ln.startswith("speckv_engine_steps ") for ln in lines)
    assert any(ln.startswith("speckv_directory_hit_rate ") for ln in lines)
    for ln in lines:  # every line is "<name> <number>"
        name, val = ln.rsplit(" ", 1)
        assert " " not in name and "-" not in name
        float(val)


def test_completion_matches_engine_api(server):
    ps = prompts()
    want = make_engine().generate(ps, max_new_tokens=8)
    # concurrent clients -> continuous batching in the engine
    results = [None] * len(ps)

    def go(i):
        results[i] = post(server.port, "/v1/completions",
                          {"prompt": ps[i], "max_tokens": 8})
    threads = [threading.Thread(target=go, args=(i,)) for i in range(len(ps))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, (code, body) in enumerate(results):
        assert code == 200, body
        assert body["tokens"] == want[i]
        assert body["finish_reason"] == "length"
        assert body["usage"]["completion_tokens"] == 8


def test_streaming_concatenates_to_full_result(server):
    p = prompts(1, seed=23)[0]
    _, full = post(server.port, "/v1/completions",
                   {"prompt": p, "max_tokens": 8})
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({"prompt": p, "max_tokens": 8,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    toks, done = [], False
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            toks.extend(json.loads(payload)["tokens"])
    assert done
    assert toks == full["tokens"]


def test_sampled_completion(server):
    p = prompts(1, seed=31)[0]
    code, body = post(server.port, "/v1/completions",
                      {"prompt": p, "max_tokens": 8, "temperature": 0.8,
                       "top_p": 0.9})
    assert code == 200 and len(body["tokens"]) == 8


def test_bad_requests(server):
    code, body = post(server.port, "/v1/completions", {"prompt": []})
    assert code == 400 and "error" in body
    code, body = post(server.port, "/v1/completions", {"prompt": "text"})
    assert code == 400  # no tokenizer configured
    code, body = post(server.port, "/v1/completions",
                      {"prompt": [1, 2, 3], "max_tokens": 100000})
    assert code == 400  # beyond max_seq_len and streaming capacity
    code, body = post(server.port, "/nope", {})
    assert code == 404


def test_tokenizer_round_trip():
    """String prompts work when a tokenizer is provided."""
    class Tok:
        def encode(self, s):
            return [ord(c) % 250 + 1 for c in s]

        def decode(self, ids):
            return "".join(chr(i) for i in ids)

    with SpeckvServer(make_engine(), port=0, tokenizer=Tok()) as srv:
        code, body = post(srv.port, "/v1/completions",
                          {"prompt": "hello speckv", "max_tokens": 4})
        assert code == 200 and len(body["tokens"]) == 4
        assert isinstance(body["text"], str)


def test_chat_completions():
    """OpenAI chat endpoint: messages -> templated prompt -> assistant
    message (non-streamed and SSE delta chunks)."""
    class Tok:
        def encode(self, s):
            return [ord(c) % 250 + 1 for c in s]

        def decode(self, ids):
            return "".join(chr(i) for i in ids)

        def apply_chat_template(self, messages, add_generation_prompt=False):
            text = "".join(f"<{m['role']}>{m['content']}" for m in messages)
            return self.encode(text + ("<assistant>" if add_generation_prompt
                                       else ""))

    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    with SpeckvServer(make_engine(), port=0, tokenizer=Tok()) as srv:
        code, body = post(srv.port, "/v1/chat/completions",
                          {"messages": msgs, "max_tokens": 4})
        assert code == 200
        assert body["object"] == "chat.completion"
        ch = body["choices"][0]
        assert ch["message"]["role"] == "assistant"
        assert isinstance(ch["message"]["content"], str)
        assert ch["finish_reason"] in ("length", "eos")
        # validation
        code, _ = post(srv.port, "/v1/chat/completions", {"messages": []})
        assert code == 400
        code, _ = post(srv.port, "/v1/chat/completions",
                       {"messages": [{"role": "user"}]})
        assert code == 400

    # no tokenizer -> clean rejection
    with SpeckvServer(make_engine(), port=0) as srv:
        code, _ = post(srv.port, "/v1/chat/completions",
                       {"messages": msgs})
        assert code == 400


def test_chat_stream_delta_chunks():
    class Tok:
        def encode(self, s):
            return [ord(c) % 250 + 1 for c in s]

        def decode(self, ids):
            return "".join(chr(i) for i in ids)

    import http.client
    import json as _json
    with SpeckvServer(make_engine(), port=0, tokenizer=Tok()) as srv:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.request("POST", "/v1/chat/completions",
                     _json.dumps({"messages": [{"role": "user",
                                                "content": "hello"}],
                                  "max_tokens": 5, "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        raw = resp.read().decode()
        chunks = [l[6:] for l in raw.splitlines()
                  if l.startswith("data: ") and l != "data: [DONE]"]
        assert raw.strip().endswith("data: [DONE]")
        toks = []
        for c in chunks:
            d = _json.loads(c)
            assert d["object"] == "chat.completion.chunk"
            assert "content" in d["choices"][0]["delta"]
            toks += d["tokens"]
        assert len(toks) == 5
        conn.close()


def test_n_choices():
    """OpenAI `n`: multiple sampled completions batch in the engine and
    return as a choices list; invalid combinations reject cleanly."""
    with SpeckvServer(make_engine(), port=0) as srv:
        code, body = post(srv.port, "/v1/completions",
                          {"prompt": [3, 5, 7, 9], "max_tokens": 6,
                           "temperature": 0.9, "n": 3})
        assert code == 200 and len(body["choices"]) == 3
        assert [c["index"] for c in body["choices"]] == [0, 1, 2]
        assert all(len(c["tokens"]) == 6 for c in body["choices"])
        # sampled choices should not all coincide on a 512-vocab model
        assert len({tuple(c["tokens"]) for c in body["choices"]}) > 1
        code, _ = post(srv.port, "/v1/completions",
                       {"prompt": [1, 2], "n": 2})          # greedy n>1
        assert code == 400
        code, _ = post(srv.port, "/v1/completions",
                       {"prompt": [1, 2], "n": 2, "stream": True,
                        "temperature": 0.5})
        assert code == 400
        code, _ = post(srv.port, "/v1/completions",
                       {"prompt": [1, 2], "n": 99, "temperature": 0.5})
        assert code == 400
