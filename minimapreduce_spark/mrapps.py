"""Ports of the reference's shipped Map/Reduce applications.

Each pair mirrors one Go plugin under /root/reference/mrapps/, with the
same tokenization, emission, and aggregation semantics — these drive the
compat layer's golden-diff tests against the DataFrame-native queries.
"""

from __future__ import annotations

import re

# unicode.IsLetter splitter of mrapps/wc.go:23-26, restricted to ASCII
# per the fixture corpus (FIXTURES.md §1: case-sensitive, non-letters split).
WORD_RE = re.compile(r"[A-Za-z]+")


def wc_map(name: str, contents: str) -> list[tuple[str, str]]:
    """mrapps/wc.go:21-38 — emit (word, "1") per token."""
    return [(w, "1") for w in WORD_RE.findall(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    """mrapps/wc.go:40-44 — count of occurrences."""
    return str(len(values))


def indexer_map(name: str, contents: str) -> list[tuple[str, str]]:
    """mrapps/indexer.go:20-31 — each distinct word once per document."""
    return [(w, name) for w in sorted(set(WORD_RE.findall(contents)))]


def indexer_reduce(key: str, values: list[str]) -> str:
    """mrapps/indexer.go:33-39 — "<n_docs> <sorted,comma,joined,docs>"."""
    vals = sorted(values)
    return f"{len(vals)} {','.join(vals)}"


def crash_map(name: str, contents: str) -> list[tuple[str, str]]:
    """mrapps/crash.go:34-44 (minus the injected crash, which tests the
    engine's retry — Spark config, not app logic)."""
    return [
        ("a", name),
        ("b", str(len(name))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def crash_reduce(key: str, values: list[str]) -> str:
    """mrapps/crash.go:46-55 — sorted, space-joined values."""
    return " ".join(sorted(values))


def _maybe_crash() -> None:
    """mrapps/crash.go:20-32 — with p≈1/3 kill the worker process
    outright, with p≈1/3 stall it (the straggler case); otherwise run
    normally. ``os._exit`` (not an exception) reproduces the plugin's
    ``os.Exit(1)``: the Python worker dies and Spark's task-retry
    machinery — the engine feature under test — must recover.

    Env knobs keep the e2e test inside a CI budget without changing the
    semantics: MR_CRASH_MAX_SLEEP caps the stall (reference: 10 s),
    MR_CRASH_DISABLE turns the chaos off (making crash ≡ nocrash, which
    is also the reference's relationship between the two plugins).
    """
    import os
    import random
    import time

    if os.environ.get("MR_CRASH_DISABLE"):
        return
    r = random.randint(0, 999)
    if r < 330:
        os._exit(1)
    elif r < 660:
        max_s = float(os.environ.get("MR_CRASH_MAX_SLEEP", "10"))
        time.sleep(random.random() * max_s)


def crash_chaos_map(name: str, contents: str) -> list[tuple[str, str]]:
    """mrapps/crash.go:34-44 — maybeCrash() then the nocrash emission."""
    _maybe_crash()
    return crash_map(name, contents)


def crash_chaos_reduce(key: str, values: list[str]) -> str:
    """mrapps/crash.go:46-55 — maybeCrash() then sorted space-join."""
    _maybe_crash()
    return crash_reduce(key, values)
