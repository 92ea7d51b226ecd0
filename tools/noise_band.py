"""Derive the idle bench map's measured noise band (r10 VERDICT ask #2).

The round-over-round idle map diff has repeatedly mixed real,
code-driven cost changes with environment drift (r10: `geo_trajectory`
0.50→1.15 s with zero code change next to a deliberate spill-rung cost
on the dedup family). A single-run map has no way to tell them apart.
This tool turns two back-to-back idle refreshes ON THE SAME CODE STATE
into a per-query noise distribution and stores its summary inside the
committed map, so bench.py (and the human diffing maps between rounds)
flags only movers beyond what the host demonstrably jitters by itself.

Usage:
    # run bench twice on an idle host, keeping the first map aside
    python bench.py && cp bench_queries.json /tmp/bench_pass1.json
    python bench.py
    python tools/noise_band.py /tmp/bench_pass1.json bench_queries.json --patch

--patch writes the band into the SECOND file (the committed map):
    "noise_band": {"p50_rel": ..., "p95_rel": ..., "max_rel": ...,
                   "abs_floor_sec": 0.1, "n_queries": N, "source": ...}

Relative delta per query = |a-b| / min(a,b) — symmetric, and min() as
the denominator makes the band CONSERVATIVE (wider), which is the right
direction for a gate that silences alarms. The abs floor keeps
sub-100 ms queries (where 30 ms of JVM jitter is a huge ratio) from
inflating the band or the mover list.
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_SEC = 0.1


def rel_delta(a: float, b: float) -> float:
    return abs(a - b) / max(min(a, b), 1e-9)


def band(qa: dict[str, float], qb: dict[str, float]) -> dict:
    common = sorted(set(qa) & set(qb))
    if not common:
        raise SystemExit("no common queries between the two maps")
    rels = sorted(
        rel_delta(qa[n], qb[n])
        for n in common
        if abs(qa[n] - qb[n]) > ABS_FLOOR_SEC or min(qa[n], qb[n]) > ABS_FLOOR_SEC
    )
    if not rels:
        rels = [0.0]

    def pct(p: float) -> float:
        i = min(int(p * (len(rels) - 1) + 0.5), len(rels) - 1)
        return round(rels[i], 4)

    return {
        "p50_rel": pct(0.50),
        "p95_rel": pct(0.95),
        "max_rel": round(rels[-1], 4),
        "abs_floor_sec": ABS_FLOOR_SEC,
        "n_queries": len(common),
        "source": "two back-to-back idle refreshes on identical code",
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--patch"]
    patch = "--patch" in sys.argv
    if len(args) != 2:
        raise SystemExit(__doc__)
    with open(args[0]) as fh:
        ma = json.load(fh)
    with open(args[1]) as fh:
        mb = json.load(fh)
    nb = band(ma["queries"], mb["queries"])
    worst = sorted(
        (
            (rel_delta(ma["queries"][n], mb["queries"][n]), n)
            for n in set(ma["queries"]) & set(mb["queries"])
        ),
        reverse=True,
    )[:10]
    print(json.dumps(nb, indent=1))
    print("worst per-query jitter (rel, query, run_a_s, run_b_s):")
    for r, n in worst:
        print(f"  {r:6.3f}  {n}  {ma['queries'][n]:.3f}  {mb['queries'][n]:.3f}")
    if patch:
        mb["noise_band"] = nb
        with open(args[1], "w") as fh:
            json.dump(mb, fh, indent=1, sort_keys=True)
        print(f"patched noise_band into {args[1]}")


if __name__ == "__main__":
    main()
