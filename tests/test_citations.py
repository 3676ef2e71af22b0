"""Every artifact path published in RESULTS.md / README.md must exist.

VERDICT r3's top finding: the floors table and full_3d headline claims cited
board files that were never committed.  This audit extracts every cited
artifact token from the published docs and asserts the evidence is actually
in the repo, so an uncommitted-evidence claim can never ship again.  Board
files named in result tables are additionally oracle-verified against the
energy the table claims for them (tools.verify_board's format).
"""

import glob
import json
import os
import re

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = [
    os.path.join(REPO, "artifacts", "RESULTS.md"),
    os.path.join(REPO, "README.md"),
]
QMAX_DIR = os.path.join(REPO, "artifacts", "qmax")

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


# --- round-4 VERDICT weak #1: the audit silently skipped two of the three
# results tables and never re-scored the certificate set itself.  Deleting
# any one certificate or editing any published number must fail the suite.


def _qmax_certificates():
    certs = sorted(glob.glob(os.path.join(QMAX_DIR, "qmax_N*_Q*.txt")))
    assert certs, "no Q_max certificates committed?"
    return certs


@pytest.mark.parametrize(
    "path", _qmax_certificates(),
    ids=lambda p: os.path.basename(p).removesuffix(".txt"))
def test_qmax_certificate_scores_zero(path):
    """Every committed certificate is a genuine zero-attack placement of
    exactly the queen count its filename claims, inside the N-cube."""
    from tests._oracle import full3d_energy

    m = re.fullmatch(r"qmax_N(\d+)_Q(\d+)\.txt", os.path.basename(path))
    n, q = int(m.group(1)), int(m.group(2))
    rows = [tuple(map(int, line.split(",")))
            for line in open(path) if line.strip()]
    assert len(rows) == q, f"{path}: {len(rows)} queens, filename says {q}"
    assert len(set(rows)) == q, f"{path}: duplicate cells"
    arr = np.asarray(rows, np.int64)
    assert arr.min() >= 0 and arr.max() < n, f"{path}: cell outside cube"
    assert full3d_energy(arr) == 0, f"{path}: attacking pairs present"


def _frontier_jsons():
    paths = sorted(glob.glob(os.path.join(QMAX_DIR, "qmax_frontier_N*.json")))
    assert paths, "no frontier JSONs committed?"
    return paths


@pytest.mark.parametrize(
    "path", _frontier_jsons(),
    ids=lambda p: os.path.basename(p).removesuffix(".json"))
def test_frontier_bound_is_certified_and_edge_is_open(path):
    """`lower_bound` must be backed by a committed certificate at exactly
    that Q; a recorded `edge` must sit at lower_bound + 1, carry full-budget
    seed evidence, and have NO certificate refuting it (VERDICT r4: the
    N=22 JSON claimed closure with zero miss evidence)."""
    n = int(re.search(r"N(\d+)", os.path.basename(path)).group(1))
    d = json.load(open(path))
    lb = d["lower_bound"]
    cert = os.path.join(QMAX_DIR, f"qmax_N{n}_Q{lb}.txt")
    assert os.path.exists(cert), (
        f"lower_bound {lb} for N={n} has no committed certificate {cert}")
    assert "complete" not in d, (
        f"{path} still carries the retired conflated `complete` flag")
    edge = d.get("edge")
    if edge is not None:
        assert edge["q"] == lb + 1, (
            f"{path}: edge at Q={edge['q']} but lower_bound is {lb}")
        assert edge["seeds"], f"{path}: edge with no seed evidence"
        assert edge["budget_proposals"] >= 524288000000, (
            f"{path}: edge closed below the full push budget")
        assert not os.path.exists(
            os.path.join(QMAX_DIR, f"qmax_N{n}_Q{edge['q']}.txt")), (
            f"{path}: a committed certificate refutes the recorded edge")
        # the edge's miss evidence must actually be banked in the JSON
        from tools.qmax_campaign import derive_edge
        assert derive_edge(d, lb) == edge, (
            f"{path}: edge record does not match the banked miss evidence")


def _results_text():
    with open(DOCS[0]) as f:
        return f.read()


def test_qmax_frontier_table_matches_artifacts():
    """Each frontier-table row's certified bound and first-unbroken-miss
    claim must match the committed certificates and frontier JSON."""
    text = _results_text()
    rows = re.findall(
        r"^\|\s*(\d+)\s*\|\s*\*\*Q_max\s*[≥>=]+\s*(\d+)\*\*.*?"
        r"\|\s*(\d+) at (\d+) attack", text, re.M)
    assert len(rows) >= 7, "Q_max frontier table not found / reshaped?"
    for n_str, bound_str, miss_q_str, miss_e_str in rows:
        n, bound = int(n_str), int(bound_str)
        miss_q, miss_e = int(miss_q_str), int(miss_e_str)
        d = json.load(open(
            os.path.join(QMAX_DIR, f"qmax_frontier_N{n}.json")))
        assert d["lower_bound"] == bound, (
            f"N={n}: table claims Q_max >= {bound}, frontier JSON says "
            f"{d['lower_bound']}")
        assert os.path.exists(
            os.path.join(QMAX_DIR, f"qmax_N{n}_Q{bound}.txt")), (
            f"N={n}: claimed bound {bound} has no committed certificate")
        assert miss_q == bound + 1, (
            f"N={n}: claimed first miss {miss_q} is not bound+1")
        # the claimed miss energy must be banked for that Q, and no record
        # (or committed board) may show the miss was actually broken
        recs = [v for k, v in d.items()
                if isinstance(v, dict) and "min_energy" in v
                and re.fullmatch(rf"Q{miss_q}(_push.*)?", k)]
        assert recs, f"N={n}: no banked record at claimed miss Q={miss_q}"
        assert all(r["min_energy"] > 0 for r in recs), (
            f"N={n}: a banked record certifies Q={miss_q} — table is stale")
        assert miss_e in {r["min_energy"] for r in recs}, (
            f"N={n}: claimed miss energy {miss_e} not banked "
            f"(found {sorted(r['min_energy'] for r in recs)})")


def test_full3d_floors_table_matches_campaign_and_boards():
    """The full_3d-floors table (| N | board | **full_3d** | columns |) must
    match the campaign log, the committed winning boards' oracle energies,
    and the board-floors table's own claims."""
    from tools.verify_board import verify

    text = _results_text()
    rows = re.findall(
        r"^\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*\*\*(\d+)\*\*\s*\|\s*(\d+)\s*\|",
        text, re.M)
    assert rows, "full_3d floors table not found in RESULTS.md"
    camp = json.load(open(os.path.join(
        REPO, "artifacts", "full3d_floors", "campaign.json")))
    board_floor_rows = dict(
        (int(n), int(f)) for n, f in
        re.findall(r"^\|\s*(\d+)\s*\|\s*\*\*(\d+)\*\*\s*\|", text, re.M))
    for n_str, bfloor_str, f3d_str, cols_str in rows:
        n, bfloor, f3d, cols = (int(n_str), int(bfloor_str),
                                int(f3d_str), int(cols_str))
        assert board_floor_rows.get(n) == bfloor, (
            f"N={n}: full_3d table quotes board floor {bfloor}, the board "
            f"floors table says {board_floor_rows.get(n)}")
        entry = camp[f"N{n}"]
        assert entry["floor"] == f3d, (
            f"N={n}: table claims full_3d floor {f3d}, campaign.json says "
            f"{entry['floor']}")
        board = os.path.join(REPO, "artifacts", "full3d_floors",
                             "competition_results", entry["floor_board"])
        rec = verify(board)
        assert rec["distinct_cells"] and rec["oracle_energy"] == f3d, (
            f"N={n}: winning board {board} scores {rec['oracle_energy']}, "
            f"table claims {f3d}")
        queens = [tuple(map(int, ln.split(",")))
                  for ln in open(board) if ln.strip()]
        ij = [(i, j) for i, j, _ in queens]
        multi = sum(1 for c in set(ij) if ij.count(c) > 1)
        assert multi == cols, (
            f"N={n}: board has {multi} multi-occupied columns, table "
            f"claims {cols}")


def test_full3d_campaign_boards_all_score_logged_energy():
    """Every search the campaign log cites must have its exported board
    committed and scoring exactly the logged energy."""
    from tools.verify_board import verify

    camp_dir = os.path.join(REPO, "artifacts", "full3d_floors")
    camp = json.load(open(os.path.join(camp_dir, "campaign.json")))
    checked = 0
    for entry in camp.values():
        for s in entry["searches"]:
            board = os.path.join(camp_dir, "competition_results", s["board"])
            assert os.path.exists(board), f"campaign cites missing {board}"
            rec = verify(board)
            assert rec["distinct_cells"], board
            assert rec["oracle_energy"] == s["energy"], (
                f"{board}: oracle {rec['oracle_energy']} != logged "
                f"{s['energy']}")
            checked += 1
    assert checked >= 9, "campaign log lost searches?"
