"""Round-12 (r11 verdict item 3): property-test the window-selection
automation ITSELF. scripts/window_select.py's closure walker is now
the single guard against stale driver records — these tests guard the
guard by synthetically touching real source files (restored in a
finally) and asserting the flag propagates through the ACTUAL
git-diff × AST-closure pipeline, not a mock of it:

  (a) an operator function body edit flags exactly that key;
  (b) a shared helper in ANOTHER module (prefix_sum.py) flags every
      dependent key across module boundaries;
  (c) a decorator-expression constant (an oracle-SQL f-string input)
      flags its key;
  (d) negative: a module-level comment outside every top-level
      definition span flags nothing new.

Mutations are plain text edits to the worktree file; each test
snapshots the original bytes, clears the selector's lru caches so the
fresh worktree is re-parsed/re-diffed, and restores bytes + caches in
a finally, so a mid-test crash cannot leave the tree dirty beyond a
re-run.
"""

from __future__ import annotations

import ast
import os
from contextlib import contextmanager

import scripts.window_select as ws

ROOT = ws.ROOT


def _clear_caches():
    ws._module_info.cache_clear()
    ws._changed_names.cache_clear()
    ws._closure.cache_clear()


def _baseline():
    _clear_caches()
    return set(ws.flagged_keys())


@contextmanager
def _mutated(relpath: str, old: str, new: str):
    path = os.path.join(ROOT, relpath)
    with open(path, "rb") as f:
        original = f.read()
    text = original.decode()
    assert text.count(old) >= 1, f"mutation anchor not found: {old!r}"
    try:
        with open(path, "w") as f:
            f.write(text.replace(old, new, 1))
        _clear_caches()
        yield
    finally:
        with open(path, "wb") as f:
            f.write(original)
        _clear_caches()


def test_operator_function_edit_flags_its_key():
    base = _baseline()
    # a value-level edit inside graph_pagerank's registered body: the
    # convergence comment anchor is stable; we alter an expression the
    # span covers by appending a no-op arithmetic identity
    with _mutated(
        "data_webhooks_spark/operators/graph.py",
        "def graph_pagerank(spark, sf_dir):",
        "def graph_pagerank(spark, sf_dir):\n    _ = 1 + 1",
    ):
        flagged = set(ws.flagged_keys())
    assert "graph_pagerank" in flagged
    # and the edit is attributed precisely: a body edit to one
    # registered function must not splash onto unrelated keys
    assert flagged - base <= {"graph_pagerank"}, (
        f"unrelated keys flagged: {flagged - base - {'graph_pagerank'}}"
    )


def test_shared_helper_edit_flags_all_dependents_cross_module():
    base = _baseline()
    with _mutated(
        "data_webhooks_spark/operators/prefix_sum.py",
        "def discrete_quantile_edges(values_df, value_col: str, bins: int):",
        "def discrete_quantile_edges(values_df, value_col: str, bins: int):\n"
        "    _ = 1 + 1",
    ):
        flagged = set(ws.flagged_keys())
    new = flagged - base
    # every key whose closure reaches the helper must be flagged —
    # derive the expectation from the closure itself so the test
    # tracks future adopters of the helper automatically
    dependents = set()
    for key, (rel, name) in ws._key_functions().items():
        if any(
            rp.endswith("prefix_sum.py") and nm == "discrete_quantile_edges"
            for rp, nm in ws._closure(rel, name)
        ):
            dependents.add(key)
    assert dependents, "closure lost track of discrete_quantile_edges users"
    missed = dependents - flagged
    assert not missed, f"cross-module dependents not flagged: {missed}"
    # and the flag is not a blanket everything-changed response
    assert new <= dependents | base, (
        f"unrelated keys flagged by a prefix_sum edit: {new - dependents}"
    )


def test_decorator_constant_edit_flags_its_key():
    base = _baseline()
    with _mutated(
        "data_webhooks_spark/operators/text.py",
        "_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000",
        "_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 51, 100_000",
    ):
        flagged = set(ws.flagged_keys())
    assert "quality_gopher_rules" in flagged, (
        "editing a tuple-assigned constant baked into the oracle "
        "f-string must flag the key"
    )
    del base  # baseline only computed to keep cache state symmetric


def test_comment_only_module_level_edit_flags_nothing():
    """A comment inserted OUTSIDE every top-level definition span (on
    the module's first line, before the docstring) must not flag any
    key: the span-overlap mapping is line-based, so this is the
    strongest comment-insensitivity the design claims. (A comment
    INSIDE a function body span conservatively flags — that is the
    documented, intended over-approximation.)"""
    relpath = "data_webhooks_spark/operators/prefix_sum.py"
    with open(os.path.join(ROOT, relpath)) as f:
        src = f.read()
    # the insertion anchor must precede every span — line 1 does,
    # provided no top-level definition starts there
    tree = ast.parse(src)
    spans = ws._top_level_spans(tree)
    assert all(lo > 1 for lo, _ in spans.values()), (
        "prefix_sum.py grew a line-1 definition; pick a new anchor"
    )
    base = _baseline()
    first_line = src.split("\n", 1)[0]
    with _mutated(
        relpath, first_line, "# comment-only edit (test)\n" + first_line
    ):
        flagged = set(ws.flagged_keys())
    assert flagged == base, (
        f"comment-only module-header edit changed the flag set: "
        f"{flagged.symmetric_difference(base)}"
    )


def test_fallback_walks_to_newest_certified_round(monkeypatch):
    """r11 ADVICE: when the newest CORRECTNESS artifact is untracked
    (mid-round state), changed_since_last_snapshot must diff against
    the newest round that HAS a snapshot commit instead of silently
    returning {} and degrading the adversarial gate."""
    real = ws._snapshot_commit.__wrapped__

    def no_snapshot_for_newest(rnd):
        from scripts.record_age import load_records

        newest = max(r for r, _ in load_records().values())
        if rnd == newest:
            return None
        return real(rnd)

    monkeypatch.setattr(
        ws, "_snapshot_commit", no_snapshot_for_newest
    )
    from scripts.record_age import load_records

    newest = max(r for r, _ in load_records().values())
    cert = ws._latest_certified_round()
    assert cert is not None and cert < newest
    # the returned set diffs against a REAL commit — it must at least
    # include everything the true newest snapshot flags (a superset,
    # because the older tree has seen more change)
    out = ws.changed_since_last_snapshot()
    assert all(f"r{cert}" in reason for reason in out.values())
