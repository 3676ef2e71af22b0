"""Every artifact path published in RESULTS.md / README.md must exist.

VERDICT r3's top finding: the floors table and full_3d headline claims cited
board files that were never committed.  This audit extracts every cited
artifact token from the published docs and asserts the evidence is actually
in the repo, so an uncommitted-evidence claim can never ship again.  Board
files named in result tables are additionally oracle-verified against the
energy the table claims for them (tools.verify_board's format).
"""

import glob
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = [
    os.path.join(REPO, "artifacts", "RESULTS.md"),
    os.path.join(REPO, "README.md"),
]

# Tokens that look like exported evidence: best-board files, qmax
# certificates, and any explicit artifacts/... path (files or directories).
_TOKEN_RE = re.compile(
    r"(?:[\w./-]*best_heights_[\w*{},.-]*\.txt"
    r"|[\w./-]*qmax_[\w*{},.-]*\.(?:txt|json)"
    r"|artifacts/[\w./-]+)"
)


def _candidates(token):
    """Expand a doc token (may carry {a,b,c} alternates, {N}-style format
    placeholders, or * globs) into path patterns rooted at the repo."""
    if not token.startswith("artifacts/"):
        token = token.lstrip(".")  # prose ellipsis prefix ("...best_heights_")
    # {N}/{Q} format placeholders cite a file family -> wildcard them;
    # {a,b,c} alternates cite each member.
    while True:
        brace = re.match(r"(.*?)\{([^},]*)\}(.*)", token)
        if not brace:
            break
        token = brace.group(1) + "*" + brace.group(3)
    brace = re.match(r"(.*)\{([^}]*)\}(.*)", token)
    toks = ([brace.group(1) + alt + brace.group(3)
             for alt in brace.group(2).split(",")] if brace else [token])
    out = []
    for t in toks:
        if t.startswith("artifacts/"):
            out.append(os.path.join(REPO, t))
        else:
            # bare file names are relative to the artifacts tree
            out.append(os.path.join(REPO, "artifacts", "**", t))
    return out


def _cited_tokens():
    cites = []
    for doc in DOCS:
        with open(doc) as f:
            text = f.read()
        for m in _TOKEN_RE.finditer(text):
            cites.append((os.path.basename(doc), m.group(0).rstrip(".")))
    assert cites, "the docs cite no artifacts at all?"
    return sorted(set(cites))


@pytest.mark.parametrize("doc,token", _cited_tokens())
def test_cited_artifact_exists(doc, token):
    patterns = _candidates(token)
    hits = [p for pat in patterns for p in glob.glob(pat, recursive=True)]
    assert hits, (
        f"{doc} cites '{token}' but nothing in the repo matches it — "
        f"commit the evidence or retract the claim (VERDICT r3 Missing #1)")


def test_floor_table_boards_score_their_claimed_energy():
    """RESULTS.md's board-floors table rows must be backed by a committed
    board whose oracle energy equals the claimed floor."""
    from tools.verify_board import verify

    with open(DOCS[0]) as f:
        text = f.read()
    # rows look like: | 14 | **30** | ... best_heights_14_....txt ...
    rows = re.findall(
        r"^\|\s*(\d+)\s*\|\s*\*\*(\d+)\*\*\s*\|(.*)$", text, re.M)
    assert rows, "floors table not found in RESULTS.md"
    rows_checked = 0
    for n_str, floor_str, rest in rows:
        n, floor = int(n_str), int(floor_str)
        cited = re.findall(r"[\w{},*.-]*best_heights_[\w{},*.-]+\.txt", rest)
        if not cited:
            continue  # rows evidenced via prose/audit note, caught elsewhere
        energies = []
        for fname in cited:
            for pat in _candidates(fname):
                for path in glob.glob(pat, recursive=True):
                    rec = verify(path)
                    assert rec["distinct_cells"], path
                    energies.append(rec["oracle_energy"])
        # a row may also cite its warm-start source (a higher-energy board),
        # but the claimed floor itself must be attained and never undercut
        assert floor in energies, (
            f"N={n}: no cited board scores the claimed floor {floor} "
            f"(found {sorted(energies)})")
        assert min(energies) == floor, (
            f"N={n}: a cited board beats the claimed floor {floor} "
            f"(found {sorted(energies)}) — update the table")
        rows_checked += 1
    assert rows_checked >= 3, "too few floor rows verified — table reshaped?"
