"""Print the driver-evidence ledger and a proposed next window.

The driver's CORRECTNESS harness verifies only the FIRST 50 entries of
the query registry, so each round the window must rotate onto the
queries with the least driver evidence
(tests/test_oracle.py::test_rotation_ledger_window_is_least_recent
enforces it — this tool computes the rotation that will satisfy that
test after a new CORRECTNESS_r{N}.json lands).

Usage:  python tools/rotation.py
Output: last-evidence histogram, the current window's status, and the
proposed next window (never-checked first, then stalest, ties in
registry order; flagship pinned per convention, no-oracle tail
excluded).

No Spark needed — the registry order is parsed from the QUERIES
literal's source text.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
WINDOW = 50
FLAGSHIP = "geo_trajectory"


def registry_order() -> list[str]:
    src = (ROOT / "kyiv_traffic_bigdata_spark" / "queries.py").read_text()
    m = re.search(r"QUERIES: dict\[str, QueryFn\] = \{(.*?)\n\}", src, re.S)
    return re.findall(r'"(\w+)": q_\w+', m.group(1))


def no_oracle_tail() -> set[str]:
    # the tail section is the text after the LAST "no-oracle
    # approximates" marker inside the QUERIES literal (the phrase also
    # appears in the header comment above the dict)
    src = (ROOT / "kyiv_traffic_bigdata_spark" / "queries.py").read_text()
    body = re.search(
        r"QUERIES: dict\[str, QueryFn\] = \{(.*?)\n\}", src, re.S
    ).group(1)
    tail_txt = body[body.rindex("no-oracle approximates"):]
    return set(re.findall(r'"(\w+)": q_\w+', tail_txt))


def ledger() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", f.stem).group(1))
        for q in json.loads(f.read_text()):
            out[q] = max(rnd, out.get(q, 0))
    return out


def main() -> None:
    names = registry_order()
    tail = no_oracle_tail()
    led = ledger()
    hist = Counter(led.get(n, 0) for n in names)
    print(f"registry: {len(names)} queries ({len(tail)} no-oracle tail)")
    print("last-evidence histogram (0 = never driver-checked):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")

    window = names[:WINDOW]
    w_rounds = sorted({led.get(n, 0) for n in window})
    print(f"\ncurrent window evidence rounds: {w_rounds}")

    # proposed next window: least evidence first, ties in registry order
    eligible = [n for n in names if n not in tail and n != FLAGSHIP]
    ranked = sorted(eligible, key=lambda n: (led.get(n, 0), names.index(n)))
    proposal = ranked[:WINDOW]
    if set(proposal) == set(window):
        print("window already covers least-recent evidence — no rotation needed")
        return
    print(f"\nproposed next window ({WINDOW} slots, stalest-first):")
    for n in proposal:
        print(f"  {n}  (r{led.get(n, 0)})")
    parked = [n for n in window if n not in proposal]
    if parked:
        print("\nrotating OUT:")
        for n in parked:
            print(f"  {n}  (r{led.get(n, 0)})")


if __name__ == "__main__":
    main()
