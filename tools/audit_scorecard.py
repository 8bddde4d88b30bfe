"""Composed-scorecard consistency audit.

The driver's correctness gate signs only the FIRST 50 registry keys each
round (CORRECTNESS_r{N}.json); full coverage is the COMPOSITION of every
round's artifact, with `_GATE_FRONT` rotating stale/changed keys into the
window.  That composition was being verified ad hoc in PROGRESS notes
(round-8 VERDICT asked for it to be automated) — this tool asserts it
mechanically:

  1. no phantom keys: every key in every CORRECTNESS artifact exists in
     the live registry (keys are never renamed or removed, so a phantom
     means a rename broke scorecard composition);
  2. no never-signed keys: every registry key is green (rows+schema+hash
     match, no err) in at least one artifact — EXCEPT a key added this
     round, which is unsigned by construction until the next artifact
     lands; the grace applies only while it sits inside the gate window
     AND no artifact has ever contained it (reported as "pending");
  3. window-flag consistency: ORACLE_KEYS.md's gate-window column agrees
     with the actual window the driver will snapshot (the first 50
     registry keys, i.e. `_GATE_FRONT`);
  4. ORACLE_KEYS.md inventory == registry, key for key.

It prints the oldest-signature distribution (which keys would go stale
next) so each round's `_GATE_FRONT` pad can be chosen from data instead
of memory.  Exit 1 on any violation; `tests/test_audit_scorecard.py`
runs it in the suite.

`--write-keys` regenerates the ORACLE_KEYS.md inventory table (key ->
first-present round, signed-in rounds, in-current-window flag) from the
artifacts + live registry — the table was hand-edited through round 9
(a 212-line diff per round); now the tool that already parses every
input emits it, and a pytest asserts the committed table matches the
regeneration byte-for-byte so hand edits can't drift.

Usage: python tools/audit_scorecard.py [--repo DIR] [--write-keys]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE_WINDOW = 50  # the driver snapshots this many leading registry keys


def artifact_paths(repo: str) -> list[str]:
    """CORRECTNESS artifacts to compose — GIT-COMMITTED ones only.

    The driver drops the NEXT round's CORRECTNESS_r{N}.json into the tree
    AFTER the builder's final commit; globbing the working tree made the
    two freshness tests structurally red at every handoff (rounds 10 and
    11 both).  Listing via `git ls-files` means an uncommitted artifact
    is invisible until the round-start sync commits it — at which point
    the fronting guard fires exactly as before.  Outside a git repo
    (temp dirs in unit tests, exported trees) fall back to the glob.
    """
    try:
        out = subprocess.run(
            ["git", "-C", repo, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, check=True).stdout
        paths = [os.path.join(repo, p) for p in out.split() if p]
        # a committed artifact deleted from the working tree has nothing
        # readable; skip it rather than crash mid-audit
        return sorted(p for p in paths if os.path.exists(p))
    except (OSError, subprocess.CalledProcessError):
        return sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))


def registry_keys(repo: str) -> list[str]:
    """The live registry, in insertion order (window = first 50)."""
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries().keys())
    oracle = set(entrymod.oracle_sql().keys())
    extra = oracle - set(keys)
    if extra:
        raise AssertionError(f"oracle_sql keys missing from queries(): "
                             f"{sorted(extra)}")
    return keys


def signed_rounds(repo: str) -> dict[str, list[int]]:
    """key -> sorted rounds whose artifact signed it GREEN."""
    out: dict[str, list[int]] = {}
    for path in artifact_paths(repo):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            art = json.load(f)
        for key, res in art.items():
            green = (isinstance(res, dict) and res.get("rows_match")
                     and res.get("schema_match")
                     and res.get("hash_match") and not res.get("err"))
            if green:
                out.setdefault(key, []).append(rnd)
    return {k: sorted(v) for k, v in out.items()}


def artifact_keys(repo: str) -> dict[int, set[str]]:
    """round -> every key present in that round's artifact (green or not)."""
    out: dict[int, set[str]] = {}
    for path in artifact_paths(repo):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            out[rnd] = set(json.load(f).keys())
    return out


def doc_inventory(repo: str) -> dict[str, bool]:
    """ORACLE_KEYS.md table: key -> claimed in-current-gate-window flag."""
    out: dict[str, bool] = {}
    with open(os.path.join(repo, "ORACLE_KEYS.md")) as f:
        for line in f:
            m = re.match(r"\|\s*`([a-z0-9_]+)`\s*\|.*\|\s*(yes|no)\s*\|\s*$",
                         line)
            if m:
                out[m.group(1)] = m.group(2) == "yes"
    return out


def _pending(keys: list[str], signed: dict, arts: dict) -> set[str]:
    """Keys legitimately unsigned, two bounded cases:

    (a) inside the current gate window AND never present in ANY artifact
        — added this round, awaiting their first signature;
    (b) ONE-RETRY grace: red (present, never green) in ONLY the newest
        artifact and re-queued in the window — the fix ships this round
        and the next artifact adjudicates it.  A key red in TWO artifact
        rounds stays a hard violation: parking a broken key in the
        window forever must not silence the audit (the bound is what
        keeps this honest — it self-expires at the next artifact).

    Single definition shared by audit() and the pytest so the grace can
    never drift between the two."""
    window = set(keys[:GATE_WINDOW])
    seen = set().union(*arts.values()) if arts else set()
    pending = (window - seen) - set(signed)
    if arts:
        newest = max(arts)
        earlier = (set().union(*(v for r, v in arts.items() if r != newest))
                   if len(arts) > 1 else set())
        pending |= (window & (arts[newest] - earlier)) - set(signed)
    return pending


def pending_keys(repo: str) -> set[str]:
    return _pending(registry_keys(repo), signed_rounds(repo),
                    artifact_keys(repo))


def audit(repo: str) -> tuple[list[str], dict[str, int]]:
    """Return (violations, latest_green_round per key)."""
    violations: list[str] = []
    keys = registry_keys(repo)
    kset = set(keys)
    signed = signed_rounds(repo)
    arts = artifact_keys(repo)

    for rnd, akeys in sorted(arts.items()):
        phantom = akeys - kset
        if phantom:
            violations.append(
                f"phantom keys in CORRECTNESS_r{rnd:02d}: {sorted(phantom)}")

    # a key added mid-round is legitimately unsigned until the NEXT driver
    # artifact lands; a key RED in only the newest artifact gets exactly
    # one in-window retry round (see _pending) — everything else unsigned
    # is a hard violation
    pending = sorted(_pending(keys, signed, arts))
    never = kset - set(signed)
    hard_never = sorted(never - set(pending))
    if hard_never:
        violations.append(f"never-signed keys: {hard_never}")
    if pending:
        print(f"pending signature (new or one-retry, in-window): "
              f"{', '.join(pending)}")

    doc = doc_inventory(repo)
    if set(doc) != kset:
        only_doc = sorted(set(doc) - kset)
        only_reg = sorted(kset - set(doc))
        violations.append(
            f"ORACLE_KEYS.md vs registry mismatch: doc-only={only_doc}, "
            f"registry-only={only_reg}")
    else:
        window = set(keys[:GATE_WINDOW])
        doc_window = {k for k, flag in doc.items() if flag}
        if doc_window != window:
            violations.append(
                "ORACLE_KEYS.md window column disagrees with the live "
                f"registry head: doc-only={sorted(doc_window - window)}, "
                f"registry-only={sorted(window - doc_window)}")

    latest = {k: rounds[-1] for k, rounds in signed.items() if k in kset}

    # staleness bound: with a 50-key window over a ~152-key registry the
    # rotation cycles every signature in ~3 rounds, so the gap between
    # the NEWEST artifact and the OLDEST latest-signature should never
    # exceed 4 (3 in steady state, +1 of slack for a round whose window
    # is dominated by changed keys or a red).  A larger gap means the
    # rotation protocol was dropped — exactly the drift this tool exists
    # to catch.
    if latest and arts:
        newest = max(arts)
        oldest = min(latest.values())
        if newest - oldest > 4:
            stale = sorted(k for k, r in latest.items() if r == oldest)
            violations.append(
                f"staleness bound exceeded: newest artifact r{newest:02d} "
                f"but {len(stale)} keys last signed r{oldest:02d} "
                f"({', '.join(stale[:10])}{'...' if len(stale) > 10 else ''})"
                " — front them in _GATE_FRONT")
    return violations, latest


TABLE_MARKER = ("<!-- table below GENERATED by "
                "`python tools/audit_scorecard.py --write-keys` — "
                "do not hand-edit (pytest-enforced) -->")


def render_keys_table(repo: str) -> str:
    """The ORACLE_KEYS.md inventory table, derived entirely from the
    CORRECTNESS artifacts + the live registry (same inputs audit()
    already parses).  Pending keys (added this round, no artifact yet)
    show first-present as the upcoming round."""
    keys = registry_keys(repo)
    signed = signed_rounds(repo)
    arts = artifact_keys(repo)
    first: dict[str, int] = {}
    for rnd in sorted(arts):
        for k in arts[rnd]:
            first.setdefault(k, rnd)
    upcoming = (max(arts) + 1) if arts else 1
    window = set(keys[:GATE_WINDOW])
    lines = [
        "| key | first in a driver artifact | driver-signed in "
        "| in current gate window |",
        "|---|---|---|---|",
    ]
    for k in sorted(keys):
        rounds = ", ".join(f"r{r:02d}" for r in signed.get(k, []))
        lines.append(
            f"| `{k}` | {first.get(k, upcoming)} "
            f"| {rounds or 'pending'} | {'yes' if k in window else 'no'} |")
    return "\n".join(lines) + "\n"


def write_keys_doc(repo: str) -> None:
    """Replace everything after TABLE_MARKER in ORACLE_KEYS.md with the
    regenerated table (prose header above the marker is kept)."""
    path = os.path.join(repo, "ORACLE_KEYS.md")
    with open(path) as f:
        text = f.read()
    if TABLE_MARKER not in text:
        raise AssertionError(
            "ORACLE_KEYS.md has no generation marker — add TABLE_MARKER "
            "above the inventory table once, then --write-keys maintains it")
    head = text.split(TABLE_MARKER)[0]
    # render FIRST: opening with "w" truncates immediately, so a render
    # failure (e.g. a registry syntax error) must not leave the committed
    # doc empty (observed: a broken __spark_entry__ edit zeroed the file)
    body = head + TABLE_MARKER + "\n\n" + render_keys_table(repo)
    with open(path, "w") as f:
        f.write(body)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--repo" in sys.argv:
        repo = sys.argv[sys.argv.index("--repo") + 1]
    if "--write-keys" in sys.argv:
        write_keys_doc(repo)
        print("ORACLE_KEYS.md table regenerated")
    violations, latest = audit(repo)

    by_round: dict[int, list[str]] = {}
    for key, rnd in latest.items():
        by_round.setdefault(rnd, []).append(key)
    print("latest green driver signature, oldest first:")
    for rnd in sorted(by_round):
        keys = sorted(by_round[rnd])
        print(f"  r{rnd:02d} ({len(keys)}): {', '.join(keys)}")

    if violations:
        for v in violations:
            print(f"VIOLATION: {v}")
        sys.exit(1)
    print(f"scorecard consistent: {len(latest)} keys all driver-signed, "
          f"no phantoms, window column matches the registry head")


if __name__ == "__main__":
    main()
