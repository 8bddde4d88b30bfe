"""Composed-scorecard consistency (tools/audit_scorecard.py).

The driver gate signs a 50-key window per round; full coverage is the
COMPOSITION of every CORRECTNESS_r*.json.  Round-8 VERDICT asked for the
ad-hoc PROGRESS-note audit to be automated — this test runs it in the
suite so a key rename, a window-column drift in ORACLE_KEYS.md, or a
registry key that somehow never got signed fails CI instead of waiting
for the judge.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from audit_scorecard import (  # noqa: E402
    GATE_WINDOW,
    TABLE_MARKER,
    artifact_paths,
    audit,
    pending_keys,
    registry_keys,
    render_keys_table,
)


def test_scorecard_consistent():
    violations, latest = audit(REPO)
    assert violations == [], "\n".join(violations)
    keys = registry_keys(REPO)
    # every registry key carries at least one green driver signature —
    # except a key added THIS round, which is unsigned until the next
    # artifact lands; pending_keys is the tool's OWN grace definition,
    # so the two can never drift
    assert set(latest) | pending_keys(REPO) == set(keys)
    # the driver snapshots the first GATE_WINDOW registry entries; the
    # explicit front list must fill the window exactly (the r7 silent
    # [:50] overflow is the failure mode this pins)
    assert len(keys) >= GATE_WINDOW


def test_oracle_keys_table_is_regenerated_not_hand_edited():
    """The ORACLE_KEYS.md inventory table is GENERATED
    (`--write-keys`, round-9 VERDICT ask): the committed table must
    match a fresh regeneration byte-for-byte, so hand edits (the old
    212-line-diff-per-round maintenance mode) can never drift from the
    artifacts again."""
    with open(os.path.join(REPO, "ORACLE_KEYS.md")) as f:
        text = f.read()
    assert TABLE_MARKER in text, "generation marker missing"
    committed = text.split(TABLE_MARKER, 1)[1].lstrip("\n")
    assert committed == render_keys_table(REPO)


def test_gate_window_fronts_every_at_bound_key():
    """PROSPECTIVE staleness guard (round-11): the audit tool flags the
    <=4-round staleness bound only AFTER it is exceeded; this test fails
    BEFORE — any key whose latest signature is 3+ rounds behind the
    newest artifact (it would hit the bound if this round's window
    skipped it) must sit in the current gate window.  Automates the
    "front the stale keys in _GATE_FRONT" round-start task the last
    three verdicts assigned by hand."""
    from audit_scorecard import artifact_keys, signed_rounds

    keys = registry_keys(REPO)
    window = set(keys[:GATE_WINDOW])
    signed = signed_rounds(REPO)
    arts = artifact_keys(REPO)
    newest = max(arts)
    must_front = {k for k, rounds in signed.items()
                  if k in set(keys) and rounds[-1] <= newest - 3}
    missing = sorted(must_front - window)
    assert not missing, (
        f"{len(missing)} keys hit the staleness bound unless this round's "
        f"window signs them — add to _GATE_FRONT: {missing}")


def test_artifact_paths_reads_committed_only(tmp_path):
    """Round-12 fix for the recurring handoff false-red (rounds 10 AND
    11): the driver drops the next round's CORRECTNESS_r{N}.json AFTER
    the builder's final commit, which used to flip the two freshness
    tests red on a tree whose committed state was green.  The tool now
    composes GIT-COMMITTED artifacts only — an uncommitted artifact is
    invisible; committing it (the round-start sync) makes the fronting
    guard fire exactly as before.  Outside a git repo, fall back to the
    working-tree glob so `--repo` on an exported tree still works."""
    import subprocess

    repo = tmp_path / "r"
    repo.mkdir()
    subprocess.run(["git", "-C", str(repo), "init", "-q"], check=True)
    subprocess.run(["git", "-C", str(repo), "config", "user.email", "t@t"],
                   check=True)
    subprocess.run(["git", "-C", str(repo), "config", "user.name", "t"],
                   check=True)
    (repo / "CORRECTNESS_r01.json").write_text("{}")
    subprocess.run(["git", "-C", str(repo), "add", "-A"], check=True)
    subprocess.run(["git", "-C", str(repo), "commit", "-qm", "r01"],
                   check=True)
    # the handoff state: a newer artifact exists on disk but is not
    # committed — it must NOT enter the composition
    (repo / "CORRECTNESS_r02.json").write_text("{}")
    names = [os.path.basename(p) for p in artifact_paths(str(repo))]
    assert names == ["CORRECTNESS_r01.json"]
    # the round-start sync commits it — now it composes
    subprocess.run(["git", "-C", str(repo), "add", "-A"], check=True)
    subprocess.run(["git", "-C", str(repo), "commit", "-qm", "r02"],
                   check=True)
    names = [os.path.basename(p) for p in artifact_paths(str(repo))]
    assert names == ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"]
    # non-git fallback: plain directory uses the glob
    plain = tmp_path / "plain"
    plain.mkdir()
    (plain / "CORRECTNESS_r07.json").write_text("{}")
    names = [os.path.basename(p) for p in artifact_paths(str(plain))]
    assert names == ["CORRECTNESS_r07.json"]
