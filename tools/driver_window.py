"""Mechanical driver-window rotation (VERDICT r8 ask #4).

The driver's per-round correctness check covers only the FIRST
``WINDOW`` catalog entries, so catalog order is driver-evidence
policy. Rounds 6-8 hand-computed that order from CORRECTNESS_r*.json;
this tool makes the policy executable:

1. read every ``CORRECTNESS_r*.json`` at the repo root and compute,
   per query, the latest round with a GREEN row (rows_match AND
   schema_match AND hash_match-not-false AND no err);
2. order the catalog: never-driver-checked queries first (newest
   capabilities need their first row), then ascending
   latest-green-round (stalest evidence re-proves first);
3. ties break by catalog REGISTRATION order — the same axis the
   driver itself walks, so the ordering is total and reproducible.

``registry._DRIVER_PRIORITY`` holds the emitted window as a literal
(the driver must not depend on runtime file reads), and
``tests/test_driver_compat.py`` asserts the literal matches this
tool's output — the window is provably mechanical.

Usage:
    python tools/driver_window.py [--window N]       print the window
    python tools/driver_window.py --write [--window N]
        splice the window literal into registry.py in place (the
        comment above the literal is left for the human; the test
        re-derives the expected list, so a stale splice fails CI)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

WINDOW = 50


def _is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
        and not row.get("err")
    )


def _correctness_files(repo_root: str = REPO_ROOT) -> "list[str]":
    """COMMITTED ``CORRECTNESS_r*.json`` files only (VERDICT r10 ask
    #1). The driver drops each round's file AFTER the builder's last
    commit, so deriving from the working tree made the window literal
    stale-by-construction at every round boundary; deriving from
    ``git ls-tree HEAD`` keeps the literal and the test pinned to the
    same evidence set until the new file is committed — at which
    point the regen and the commit ride together. ``ls-tree`` (not
    ``ls-files``) so a staged-but-uncommitted file cannot slip into
    the window either (ADVICE r11 #3). Falls back to the
    working-tree glob only when git itself is unavailable."""
    import fnmatch
    import subprocess

    try:
        # ls-tree pathspecs don't glob (and reject :(glob) magic), so
        # list HEAD's root entries and filter here
        out = subprocess.run(
            ["git", "-C", repo_root, "ls-tree", "--name-only", "HEAD"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout
        names = [
            line for line in out.splitlines()
            if fnmatch.fnmatch(line, "CORRECTNESS_r*.json")
        ]
        # empty HEAD = genuinely no committed evidence: return [],
        # do NOT glob the working tree (that would re-admit staged/
        # uncommitted files, the leak ADVICE r11 #3 closed)
        return sorted(f"{repo_root}/{n}" for n in names)
    except (subprocess.SubprocessError, OSError):
        # git itself unavailable (not installed / not a repo / hung):
        # the working-tree glob is the only evidence source left
        return sorted(glob.glob(f"{repo_root}/CORRECTNESS_r*.json"))


def latest_green_rounds(repo_root: str = REPO_ROOT) -> dict:
    """{query name -> latest green round int} over every COMMITTED
    CORRECTNESS_r*.json; queries with driver rows but no green row
    map to 0 (re-check before any stale green)."""
    latest: dict = {}
    for path in _correctness_files(repo_root):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if _is_green(row):
                latest[name] = max(latest.get(name, 0), rnd)
            else:
                latest.setdefault(name, 0)
    return latest


def compute_window(
    catalog_names: "list[str]",
    latest: "dict[str, int]",
    window: int = WINDOW,
) -> "list[str]":
    """The staleness-ordered driver window: (never-checked first,
    then oldest green), registration-order tiebreak."""
    pos = {n: i for i, n in enumerate(catalog_names)}
    ranked = sorted(
        catalog_names, key=lambda n: (latest.get(n, -1), pos[n])
    )
    return ranked[:window]


def registration_order() -> "list[str]":
    """Catalog names in REGISTRATION order (not the prioritized
    iteration order ``all_queries`` exposes)."""
    from mapreduce_inverted_index_spark.plans import registry

    if not registry._LOADED:
        registry._load()
    return list(registry._REGISTRY)


def render_literal(win: "list[str]", latest: "dict[str, int]") -> str:
    lines = ["_DRIVER_PRIORITY = ("]
    for n in win:
        tag = latest.get(n)
        if tag is None:
            note = "never checked"
        elif tag == 0:
            note = "driver-checked, never green"
        else:
            note = f"latest green r{tag}"
        lines.append(f'    "{n}",  # {note}')
    lines.append(")")
    return "\n".join(lines)


def write_registry(literal: str) -> str:
    """Splice the window literal over the existing one in
    registry.py; returns the path written. The splice END anchor is
    a line that is EXACTLY ``)`` — anchoring on the first ``)\\n``
    after the start would silently truncate the tuple at any comment
    line that happens to end in ``)`` (the round-8 literal had
    several)."""
    import re

    path = (
        f"{REPO_ROOT}/mapreduce_inverted_index_spark/plans/registry.py"
    )
    with open(path) as f:
        src = f.read()
    start = src.index("_DRIVER_PRIORITY = (")
    m = re.search(r"^\)$", src[start:], flags=re.M)
    if m is None:
        raise SystemExit("registry.py: no bare ')' closing the literal")
    end = start + m.end()
    with open(path, "w") as f:
        f.write(src[:start] + literal + src[end:])
    return path


def warn_untracked_rounds(repo_root: str = REPO_ROOT) -> "list[str]":
    """Round-boundary ergonomics (VERDICT r9 ask #7, narrowed by r10
    ask #1): an uncommitted ``CORRECTNESS_r*.json`` is now IGNORED by
    this tool (it derives from ``git ls-files``), so the literal can
    no longer go stale-by-construction — but the new round's evidence
    only enters the window once the file is committed and the regen
    rides the same commit. Returns (and prints a reminder for) any
    such files, so the round-start ritual is self-documenting."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", repo_root, "status", "--porcelain",
             "--", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        return []
    stale = [
        line[3:].strip()
        for line in out.splitlines()
        if line[:2].strip() in {"??", "M", "A"}
    ]
    for f in stale:
        print(
            f"NOTE: {f} is not committed — this tool ignores "
            "uncommitted rounds; commit it and re-run --write so its "
            "evidence enters the window",
            file=sys.stderr,
        )
    return stale


def main() -> None:
    window = WINDOW
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    names = registration_order()
    latest = latest_green_rounds()
    win = compute_window(names, latest, window)
    literal = render_literal(win, latest)
    warn_untracked_rounds()
    if "--write" in sys.argv:
        print("wrote", write_registry(literal))
        return
    print("# staleness-ordered driver window "
          f"({window} of {len(names)} catalog queries)")
    print("# paste into registry._DRIVER_PRIORITY, or re-run --write:")
    print(literal)


if __name__ == "__main__":
    main()
