"""Artifact-honesty, enforced structurally (VERDICT r4 item 3).

Rounds 3 and 4 both shipped STATUS.md lines that marked work "done" by
naming a committed artifact that did not exist (`BENCH_multishard.json` in
r3, `MAI_1G.json` in r4). The prose rule failed twice; this test makes it
mechanical: every backticked filename in STATUS.md that looks like a repo
artifact must exist on disk, and top-level UPPERCASE *.json artifacts (the
evidence-artifact convention: BENCH_*.json, ACCURACY.json, ...) must also
be git-tracked — an untracked dotfile or a phantom name fails the suite.

The same idea as the reference's `.index` completeness sentinel
(mapWrap.h:363-366): a claim of existence is only readable as true if a
mechanical check of it passes.
"""
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# backticked tokens that name files: at least one dot + artifact extension;
# path chars only. Command lines / flags / module paths don't match.
_FILE_RE = re.compile(
    r"`([A-Za-z0-9_][A-Za-z0-9_./-]*\.(?:json|md|log|py|pdf|sh|npz|csv))`"
)
# names that are templates or examples, not claims of a concrete file
_ALLOW_MISSING = {
    "BENCH_r{N}.json",  # driver naming scheme
}


def _status_file_claims():
    with open(os.path.join(REPO, "STATUS.md")) as f:
        text = f.read()
    names = []
    for m in _FILE_RE.finditer(text):
        name = m.group(1)
        if name in _ALLOW_MISSING or "{" in name or "*" in name:
            continue
        names.append(name)
    return sorted(set(names))


def test_status_artifacts_exist():
    missing = []
    for name in _status_file_claims():
        # search roots: repo root, or the path as given
        if not (os.path.exists(os.path.join(REPO, name))
                or os.path.exists(os.path.join(REPO, "metamaps_tpu", name))):
            missing.append(name)
    assert not missing, (
        f"STATUS.md names artifacts that do not exist: {missing} — "
        "either produce the artifact or reword the claim"
    )


def test_status_evidence_artifacts_tracked():
    """Top-level UPPERCASE *.json evidence artifacts named in STATUS.md
    must be committed, not just present as an untracked scratch file."""
    tracked = set(subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
    ).stdout.split())
    bad = []
    for name in _status_file_claims():
        base = os.path.basename(name)
        if (name == base and base.endswith(".json")
                and base[0].isupper() and os.path.exists(
                    os.path.join(REPO, name))):
            if name not in tracked:
                bad.append(name)
    assert not bad, (
        f"STATUS.md evidence artifacts exist but are not git-tracked: {bad}"
    )
