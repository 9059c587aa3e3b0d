"""Changed-after-record window selection (r10 verdict item 2, executed
in r11): compute — from data, not archaeology — which registry keys
have code that moved AFTER their latest official driver CORRECTNESS
record, so the per-round `_WINDOW` head in registry.py can never miss
one (the r10 failure: stream_stateful was refactored after its r9
record and omitted from the hand-curated 18-key head).

How a key is flagged:

1. latest record round N per key from CORRECTNESS_r*.json
   (scripts/record_age.py), and the round-N SNAPSHOT COMMIT = the
   commit that added CORRECTNESS_rN.json (the driver commits its
   artifacts after measuring the tree, touching no source, so that
   commit's tree is the certified one);
2. the key's implementing function (live registry introspection) plus
   the TRANSITIVE CLOSURE of module-top-level names it references —
   followed across package-local imports (e.g. drift.py ->
   prefix_sum.py), including decorator expressions (oracle SQL
   f-strings and their constants live there);
3. `git diff -U0 <snapshot> -- <module>` (worktree included) mapped to
   top-level definition spans on BOTH the old and new side of each
   hunk; the key is flagged iff any name in its closure changed.

INFRA modules (io/norms/regutil/session/oracle/schemas/registry) are
deliberately OUTSIDE the closure: every key reaches Tables/qnt, so an
infra edit would flag all 287 keys — more than any 50-slot window can
re-verify. Instead, an infra module that changed since the NEWEST
snapshot (i.e. in the current round) is reported as a loud warning for
the round owner to allocate head slots deliberately; older infra
changes are re-certified by the staleness tail rotation, which cycles
every key within a few rounds. tests/test_window_selection.py asserts
flagged ⊆ _WINDOW, so a missed key fails `pytest tests/`.

Usage:
  python scripts/window_select.py            # flagged keys + reasons
  python scripts/window_select.py --propose  # full 50-key window
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys
from functools import lru_cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "data_webhooks_spark"
INFRA = {
    f"{PKG}/io.py",
    f"{PKG}/norms.py",
    f"{PKG}/regutil.py",
    f"{PKG}/session.py",
    f"{PKG}/oracle.py",
    f"{PKG}/schemas.py",
    f"{PKG}/registry.py",
}
WINDOW_SIZE = 50


def _git(*args: str) -> str:
    r = subprocess.run(
        ["git", "-C", ROOT, *args], capture_output=True, text=True
    )
    return r.stdout


@lru_cache(maxsize=None)
def _snapshot_commit(rnd: int) -> str | None:
    out = _git(
        "log",
        "--diff-filter=A",
        "--format=%H",
        "-n1",
        "--",
        f"CORRECTNESS_r{rnd:02d}.json",
    ).strip()
    return out or None


def _assign_names(tgt: ast.expr) -> list[str]:
    """Bound names of an assignment target, including tuple/list
    unpacking (`_D_NUM, _D_DEN = 85, 100` binds both) and starred
    elements — a plain-Name-only walk left every tuple-assigned
    module constant OUT of the closure (r11 review finding: editing
    `_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = ...` flagged nothing)."""
    if isinstance(tgt, ast.Name):
        return [tgt.id]
    if isinstance(tgt, (ast.Tuple, ast.List)):
        out = []
        for elt in tgt.elts:
            out.extend(_assign_names(elt))
        return out
    if isinstance(tgt, ast.Starred):
        return _assign_names(tgt.value)
    return []


def _top_level_spans(tree: ast.Module) -> dict[str, tuple[int, int]]:
    spans: dict[str, tuple[int, int]] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            lo = min(
                [node.lineno] + [d.lineno for d in node.decorator_list]
            )
            spans[node.name] = (lo, node.end_lineno or node.lineno)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            tgts = node.targets if isinstance(node, ast.Assign) else [node.target]
            for tgt in tgts:
                for name in _assign_names(tgt):
                    spans[name] = (node.lineno, node.end_lineno or node.lineno)
    return spans


@lru_cache(maxsize=None)
def _module_info(relpath: str):
    """(spans, refs, imports) of the CURRENT worktree file: top-level
    name -> line span; name -> referenced names (incl. decorators);
    imported alias -> (target relpath, original name) for package-
    local non-infra imports."""
    with open(os.path.join(ROOT, relpath)) as f:
        tree = ast.parse(f.read())
    spans = _top_level_spans(tree)
    refs: dict[str, set[str]] = {}
    imports: dict[str, tuple[str, str]] = {}
    pkg_dir = os.path.dirname(relpath)
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = {
                n.id for n in ast.walk(node) if isinstance(n, ast.Name)
            }
            refs[node.name] = names
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            tgts = node.targets if isinstance(node, ast.Assign) else [node.target]
            names = {
                n.id for n in ast.walk(node) if isinstance(n, ast.Name)
            }
            for tgt in tgts:
                for name in _assign_names(tgt):
                    refs[name] = names
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_dir
                for _ in range(node.level - 1):
                    base = os.path.dirname(base)
                mod = (node.module or "").replace(".", "/")
                target = os.path.join(base, mod) + ".py" if mod else None
            elif node.module and node.module.startswith(PKG):
                target = node.module.replace(".", "/") + ".py"
            else:
                target = None
            if (
                target
                and target not in INFRA
                and os.path.exists(os.path.join(ROOT, target))
            ):
                for alias in node.names:
                    imports[alias.asname or alias.name] = (target, alias.name)
    return spans, refs, imports


def _hunk_ranges(diff: str) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """(old-side, new-side) changed line ranges from a -U0 diff; pure
    insert/delete hunks contribute a 1-line touch at their anchor so
    adjacent definitions are treated as changed (conservative)."""
    old_r, new_r = [], []
    for m in re.finditer(
        r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@", diff, re.M
    ):
        a, alen = int(m.group(1)), int(m.group(2) or "1")
        b, blen = int(m.group(3)), int(m.group(4) or "1")
        old_r.append((a, a + max(alen, 1) - 1))
        new_r.append((b, b + max(blen, 1) - 1))
    return old_r, new_r


def _names_touching(spans: dict[str, tuple[int, int]], ranges) -> set[str]:
    out = set()
    for name, (lo, hi) in spans.items():
        for a, b in ranges:
            if a <= hi and lo <= b:
                out.add(name)
                break
    return out


@lru_cache(maxsize=None)
def _changed_names(relpath: str, commit: str) -> frozenset[str]:
    """Top-level names of `relpath` whose definition changed between
    `commit` and the current WORKTREE (staged + unstaged included)."""
    diff = _git("diff", "-U0", commit, "--", relpath)
    if not diff:
        return frozenset()
    old_r, new_r = _hunk_ranges(diff)
    spans, _, _ = _module_info(relpath)
    names = _names_touching(spans, new_r)
    old_src = _git("show", f"{commit}:{relpath}")
    if old_src:
        try:
            names |= _names_touching(
                _top_level_spans(ast.parse(old_src)), old_r
            )
        except SyntaxError:
            pass
    else:
        names |= set(spans)  # file did not exist at snapshot: all new
    return frozenset(names)


@lru_cache(maxsize=None)
def _closure(relpath: str, name: str) -> frozenset[tuple[str, str]]:
    """All (module, top-level name) nodes transitively referenced by
    `name` in `relpath`, across package-local non-infra imports."""
    seen: set[tuple[str, str]] = set()
    stack = [(relpath, name)]
    while stack:
        rp, nm = stack.pop()
        if (rp, nm) in seen:
            continue
        seen.add((rp, nm))
        spans, refs, imports = _module_info(rp)
        for ref in refs.get(nm, ()):
            if ref in spans and (rp, ref) not in seen:
                stack.append((rp, ref))
            if ref in imports:
                stack.append(imports[ref])
    return frozenset(seen)


def _key_functions() -> dict[str, tuple[str, str]]:
    """key -> (module relpath, registered function name)."""
    from data_webhooks_spark import registry

    out = {}
    for key, fn in registry.queries().items():
        relpath = os.path.relpath(fn.__code__.co_filename, ROOT)
        out[key] = (relpath, fn.__name__)
    return out


def flagged_keys() -> dict[str, str]:
    """key -> reason, for every key whose implementing code changed
    after its latest driver record (or that has no record at all)."""
    from scripts.record_age import load_records

    records = load_records()
    funcs = _key_functions()
    flagged: dict[str, str] = {}
    for key, (relpath, fname) in sorted(funcs.items()):
        rec = records.get(key)
        if rec is None:
            flagged[key] = "never recorded"
            continue
        commit = _snapshot_commit(rec[0])
        if commit is None:
            flagged[key] = f"no snapshot commit for r{rec[0]}"
            continue
        for rp, nm in sorted(_closure(relpath, fname)):
            ch = _changed_names(rp, commit)
            if nm in ch:
                flagged[key] = f"{rp}:{nm} changed since r{rec[0]} snapshot"
                break
    return flagged


def _latest_certified_round() -> int | None:
    """Newest round whose CORRECTNESS artifact has a snapshot COMMIT.
    Mid-round the newest artifact on disk is often still untracked
    (the driver writes it before anyone commits); diffing must fall
    back to the last round that certifies an actual tree — returning
    {} here silently degraded the in-suite adversarial gate to a
    hardcoded smoke slice (r11 ADVICE finding)."""
    from scripts.record_age import load_records

    for rnd in sorted(
        {r for r, _ in load_records().values()}, reverse=True
    ):
        if _snapshot_commit(rnd) is not None:
            return rnd
    return None


def changed_since_last_snapshot() -> dict[str, str]:
    """key -> reason, for keys whose implementing closure changed
    since the newest CERTIFIED round snapshot — i.e. edited in the
    current round (plus, mid-round before the new artifact lands, any
    still-uncertified edits from the round in flight). This is the
    budget-gated set the in-suite adversarial sweeps run over (the
    full flagged set includes a historical backlog that older suites
    already exercised; the sweep gate's job is catching regressions
    in fresh edits)."""
    newest = _latest_certified_round()
    if newest is None:
        return {}
    commit = _snapshot_commit(newest)
    out: dict[str, str] = {}
    for key, (relpath, fname) in sorted(_key_functions().items()):
        for rp, nm in sorted(_closure(relpath, fname)):
            if nm in _changed_names(rp, commit):
                out[key] = f"{rp}:{nm} changed since r{newest} snapshot"
                break
    return out


def infra_warnings() -> list[str]:
    newest = _latest_certified_round()
    if newest is None:
        return []
    commit = _snapshot_commit(newest)
    out = []
    # registry.py is the rotation vehicle — it changes EVERY round by
    # design, carries no operator semantics (key order + module list),
    # and is pinned by test_parity/test_window_selection directly.
    for rp in sorted(INFRA - {f"{PKG}/registry.py"}):
        if _git("diff", "--name-only", commit, "--", rp).strip():
            out.append(
                f"INFRA CHANGED since r{newest} snapshot: {rp} — every key "
                "transits it; allocate head slots deliberately"
            )
    return out


# When more keys are flagged than the window can hold, the overflow
# must be an EXPLICIT deferral to the next round — justified here (the
# single source; tests/test_window_selection.py asserts a missing
# flagged key is either windowed or deferred, and that deferrals only
# exist under genuine slot pressure).
#
# r13: the ledger is EMPTY — burned to zero per the r12 verdict's top
# item. The 25 r12 deferrals (graph_degree_stats' explode rewrite, the
# 14 checkpoint-placement/replay-glob streaming keys, 3 scan-glob
# keys, 6 comment-only negative-result pins, ann_ivf's guard) all head
# the r13 window (registry REV 6) so the driver re-earns their
# records. The r12 entries' full justifications live in git history
# (this file at d3f422b). Bookkeeping note, r12 ADVICE low: the r12
# entries cited "74-flagged>50-slot" where registry REV 5 said 69 —
# the 74 count included the 5 already-deferred replay-glob keys the
# selector re-flags each run; and funnel_conversion (comment-only in
# r12) held a REV 5 window slot while its comment-only peers were
# deferred because its record was r5-stale (slot pressure ranks by
# record age, and it was flagged before the REV 5 freeze). Both were
# presentation inconsistencies, not selection errors.
DEFERRED: dict[str, str] = {}


def propose_window(size: int = WINDOW_SIZE) -> list[str]:
    """Head = flagged keys minus documented DEFERRED entries; tail =
    oldest records first (round, then key) until `size`. A DEFERRED
    key is excluded unconditionally — the ledger entry IS the
    decision, and tests/test_window_selection.py enforces its
    legitimacy (a deferral is only legal when the freed slot goes to
    a strictly OLDER record, i.e. genuine slot pressure — not just
    flagged-count overflow, which r12 showed is the narrower case:
    6 flagged + the 46-key r3/r4 staleness cohort exceeded 50 while
    flagged alone did not). Raises if even after deferrals the head
    exceeds the window — that is a real process problem, not
    something to trim silently."""
    from scripts.record_age import load_records

    flagged = flagged_keys()
    flagged = {k: v for k, v in flagged.items() if k not in DEFERRED}
    if len(flagged) > size:
        raise SystemExit(
            f"{len(flagged)} changed-after-record keys exceed the "
            f"{size}-slot window even after DEFERRED: {sorted(flagged)}"
        )
    records = load_records()
    live = set(_key_functions())  # a renamed/retired key lingers in
    # old CORRECTNESS files forever; proposing it would fail the
    # registry's window-keys-registered check with a confusing error
    tail = sorted(
        (r, k)
        for k, (r, _) in records.items()
        if k not in flagged and k in live
    )
    return list(flagged) + [k for _, k in tail[: size - len(flagged)]]


def main() -> int:
    flagged = flagged_keys()
    for w in infra_warnings():
        print(w)
    if "--propose" in sys.argv:
        win = propose_window()
        print(f"# head: {len(flagged)} changed-after-record keys")
        for k in win:
            print(f'    "{k}",')
        return 0
    for k, why in flagged.items():
        print(f"{k}: {why}")
    print(f"--- {len(flagged)} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
