"""Stop-condition tests: stop_token_ids (EOS-like, token kept) and
stop_sequences (OpenAI stop-string semantics: matched suffix excluded from
the returned tokens, but kept in the request's internal output so session
history stays consistent with the KV already written)."""

import json
import urllib.error
import urllib.request

import jax
import numpy as np

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

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(ngram=False, seed=0):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=256,
                          num_host_blocks=256, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                            prefill_chunk=32),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  seed=seed, spec_ngram=ngram, spec_gamma=3)


def prompt(seed=0, n=12):
    rng = np.random.RandomState(seed)
    return rng.randint(1, CFG.vocab_size, n).tolist()


def reference_output(mnt=20, seed=0):
    eng = make_engine()
    rid = eng.add_request(prompt(seed), max_new_tokens=mnt)
    return {o.req_id: o for o in eng.run()}[rid].tokens


def test_stop_token_id_finishes_early():
    ref = reference_output()
    assert len(ref) >= 8
    stop_tok = ref[5]
    k = ref.index(stop_tok)  # first occurrence may be before index 5
    eng = make_engine()
    rid = eng.add_request(prompt(), max_new_tokens=20,
                          stop_token_ids=[stop_tok])
    out = {o.req_id: o for o in eng.run()}[rid]
    assert out.finish_reason == "stop"
    # EOS-like: the stop token is the last returned token
    assert out.tokens == ref[: k + 1]


def test_stop_sequence_trimmed_from_result():
    ref = reference_output()
    seq = ref[4:6]  # a 2-token stop sequence taken from the real output
    # find the first position where the suffix matches
    k = next(i for i in range(2, len(ref) + 1) if ref[i - 2:i] == seq)
    eng = make_engine()
    rid = eng.add_request(prompt(), max_new_tokens=20, stop_sequences=[seq])
    out = {o.req_id: o for o in eng.run()}[rid]
    assert out.finish_reason == "stop"
    # OpenAI semantics: matched suffix excluded from the returned tokens
    assert out.tokens == ref[: k - 2]


def test_stop_sequence_under_spec_decoding():
    """The spec tick emits several tokens per round; stop must cut at the
    exact same position as plain decoding."""
    ref = reference_output()
    seq = ref[4:6]
    k = next(i for i in range(2, len(ref) + 1) if ref[i - 2:i] == seq)
    eng = make_engine(ngram=True)
    rid = eng.add_request(prompt(), max_new_tokens=20, stop_sequences=[seq])
    out = {o.req_id: o for o in eng.run()}[rid]
    assert out.finish_reason == "stop"
    assert out.tokens == ref[: k - 2]


def test_stop_sequence_session_history_keeps_kv_consistent():
    """A session turn cut by a stop sequence keeps the matched tokens in
    its stored history (the KV for them is already written); the next turn
    restores and matches a fresh full-history request exactly."""
    eng = make_engine()
    p = prompt(3)
    rid = eng.add_request(p, max_new_tokens=12, session=True)
    out = {o.req_id: o for o in eng.run()}[rid]
    full = out.tokens
    assert len(full) >= 6
    seq = [full[3], full[4]]
    k = next(i for i in range(2, len(full) + 1) if full[i - 2:i] == seq)

    eng2 = make_engine()
    rid2 = eng2.add_request(p, max_new_tokens=12, session=True,
                            stop_sequences=[seq])
    out2 = {o.req_id: o for o in eng2.run()}[rid2]
    assert out2.tokens == full[: k - 2]
    follow = [7, 9, 11]
    cid = eng2.continue_session(out2.session_id, follow, max_new_tokens=6)
    cont = {o.req_id: o for o in eng2.run()}[cid].tokens

    # fresh engine, full history as one prompt (history INCLUDES the
    # trimmed stop tokens — they are real KV/context)
    eng3 = make_engine()
    rid3 = eng3.add_request(p + full[: k] + follow, max_new_tokens=6)
    want = {o.req_id: o for o in eng3.run()}[rid3].tokens
    assert cont == want


def test_empty_stop_sequence_rejected():
    import pytest

    eng = make_engine()
    with pytest.raises(ValueError):
        eng.add_request(prompt(), stop_sequences=[[]])


def test_server_stop_sequences_and_streaming():
    from cxl_speckv_tpu.server import SpeckvServer

    ref = reference_output()
    seq = ref[4:6]
    k = next(i for i in range(2, len(ref) + 1) if ref[i - 2:i] == seq)
    want = ref[: k - 2]
    eng = make_engine()
    with SpeckvServer(eng, port=0) as srv:
        url = f"http://127.0.0.1:{srv.port}/v1/completions"

        def post(payload):
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req, timeout=120)

        body = json.loads(post({"prompt": prompt(), "max_tokens": 20,
                                "stop_sequences": [seq]}).read())
        assert body["finish_reason"] == "stop"
        assert body["tokens"] == want

        # streamed: chunks concatenate to the SAME trimmed result (the
        # holdback must prevent emitting tokens the finish retracts)
        resp = post({"prompt": prompt(), "max_tokens": 20,
                     "stop_sequences": [seq], "stream": True})
        toks, done = [], False
        for line in resp:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[6:]
            if payload == "[DONE]":
                done = True
                break
            toks += json.loads(payload)["tokens"]
        assert done and toks == want

        # string stop without a tokenizer is a clean 400
        try:
            post({"prompt": prompt(), "max_tokens": 4, "stop": "foo"})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
