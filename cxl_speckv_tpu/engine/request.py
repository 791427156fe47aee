"""Request lifecycle.

The serving-side analog of the reference's per-request KV identity
(`req_id` in every KV address encoding, e.g. `vllm_speckv_backend.py:45-64`)
plus the request states a continuous-batching engine needs (the reference has
no scheduler; SURVEY.md section 2.6 lists this as a new first-class
component).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field


class RequestState(enum.Enum):
    QUEUED = 0
    PREFILLING = 1   # prompt partially processed (chunked prefill)
    RUNNING = 2      # decoding
    FINISHED = 3
    FAILED = 4


@dataclass
class Request:
    req_id: int
    prompt: list[int]
    max_new_tokens: int = 64
    temperature: float = 0.0     # 0 = greedy
    top_p: float = 1.0           # nucleus sampling mass; >= 1 or <= 0 = off
    eos_token_id: int | None = None  # overrides engine default if set
    # extra finish conditions (finish_reason "stop"): single token ids that
    # end generation like EOS (the token stays in the output), and
    # multi-token sequences with OpenAI stop-string semantics (the matched
    # suffix is excluded from the RETURNED tokens; it stays in `output` so
    # session history keeps matching the KV the engine already wrote)
    stop_token_ids: list[int] = field(default_factory=list)
    stop_sequences: list[list[int]] = field(default_factory=list)
    stop_trim: int = 0           # trailing tokens to drop from the result
    ignore_eos: bool = False     # benchmark knob: never finish on EOS
    # number of top alternative logprobs to return per generated token
    # (0 = off). Entries land in logprobs_data, one dict per output token:
    # {"logprob": chosen, "top_ids": [...], "top_logprobs": [...]} — raw
    # model distribution (log_softmax before temperature/top-p), OpenAI
    # semantics.
    logprobs: int = 0
    logprobs_data: list = field(default_factory=list)
    # sampling penalties (OpenAI frequency/presence semantics over OUTPUT
    # tokens; HF/vLLM repetition semantics over prompt + output). 0 (and
    # repetition 1.0) = off. Penalized requests own a row of the engine's
    # device-resident token-count plane (`engine/sampling.py` module
    # comment); pen_row is that row (-1 = unpenalized) and pen_reset_gen
    # records the `restarts` generation whose first prefill chunk already
    # reset the row (preemption restarts re-reset it in-graph).
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 0.0
    pen_row: int = -1
    pen_reset_gen: int = -1
    # echo/perplexity surface: per-PROMPT-token logprobs (OpenAI echo —
    # entry 0 is None, token i >= 1 scores log p(prompt[i] | prompt[:i])).
    # Prefill chunks re-feed one boundary token so every position is
    # covered; data accumulates in prompt_logprobs_data.
    prompt_logprobs: bool = False
    prompt_logprobs_data: list = field(default_factory=list)
    # session requests keep their KV allocated after finishing (demotable to
    # the host tier) so follow-up turns restore context instead of
    # re-prefilling — the reference's core serving pattern: per-request KV
    # persists in the CXL pool between accesses
    session: bool = False
    # for session continuations: tokens already materialized in the KV cache
    # (attention context); prompt then holds only the not-yet-processed tail
    context_len: int = 0
    state: RequestState = RequestState.QUEUED
    seq_slot: int = -1
    prefill_pos: int = 0         # tokens of the prompt already prefilled
    output: list[int] = field(default_factory=list)
    # bumped every time preemption clears `output` (the request restarts
    # from prefill). Lock-free streaming readers snapshot (restarts, output)
    # and discard stale prefixes when the counter moved — without it a
    # preempted sampled request would silently splice two different
    # generations into one stream.
    restarts: int = 0
    finish_reason: str = ""
    arrival_time: float = field(default_factory=time.monotonic)
    first_token_time: float = 0.0
    finish_time: float = 0.0
    last_scheduled_step: int = -1
    token_times: list[float] = field(default_factory=list)

    session_id: int = -1         # set by the engine for session requests
    # KV quantization scheme this request's blocks are encoded with —
    # captured from the engine's current scheme at submission
    # (`Engine.set_kv_dtype`, the speckv_set_compression_scheme analog);
    # None = the engine's construction-time scheme
    kv_dtype: object = None

    @property
    def num_tokens(self) -> int:
        """Total sequence length (restored context + processed prompt +
        generated tokens)."""
        return self.context_len + self.prefill_pos + len(self.output)

    @property
    def done_prefill(self) -> bool:
        return self.prefill_pos >= len(self.prompt)

    @property
    def ttft_ms(self) -> float:
        if not self.first_token_time:
            return 0.0
        return (self.first_token_time - self.arrival_time) * 1e3

    @property
    def tpot_ms(self) -> float:
        """Mean time-per-output-token after the first."""
        if len(self.token_times) < 2:
            return 0.0
        span = self.token_times[-1] - self.token_times[0]
        return span * 1e3 / (len(self.token_times) - 1)
