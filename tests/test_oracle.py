"""Local replica of the driver's DuckDB-oracle correctness gate.

Canonicalization is DRIVER-FAITHFUL (the round-4 lesson): both result
sets are round-tripped through pandas (Spark via ``toPandas()``, DuckDB
via ``rel.df()``), columns sorted by name, rows via pandas
``sort_values`` over all columns, cells stringified, and the stringified
frames hash-compared.  That reproduces the two failure classes the old
tuple-based canon missed for two rounds:

* array/struct cells → pandas ``sort_values`` raises
  ``TypeError: unhashable type: 'list'`` (r4 ``emb_quantized``/``emb_pq``
  ERR);
* DuckDB HUGEINT (``SUM`` over integer columns) → pandas float64 →
  ``"3000000000.0"`` vs Spark bigint ``"3000000000"`` (r4
  ``doc_pack_windows`` hash mismatch with value-identical rows).

A separate registry assertion bans array/struct/map-typed output columns
outright so the first class can never be registered again.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

from __spark_entry__ import oracle_sql, queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(pdf):
    """Driver-shape canonical frame: name-sorted columns, pandas
    ``sort_values`` over ALL columns (raises on unhashable cells — that
    is the point), every cell stringified via ``astype(str)``."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True).astype(str)


def _value_hash(canon_pdf) -> str:
    h = hashlib.sha256()
    for row in canon_pdf.itertuples(index=False, name=None):
        h.update(("\x1f".join(row) + "\x1e").encode("utf-8", "replace"))
    return h.hexdigest()


ORACLES = oracle_sql()
QUERY_NAMES = [n for n in queries() if n in ORACLES]


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()

    rel = duck.sql(ORACLES[name])
    duck_pdf = rel.df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={list(spark_pdf.columns)} "
        f"duck={list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )

    # sort_values may raise TypeError on unhashable cells — let it
    # propagate: the driver's canonicalizer dies the same way.
    s_canon = _canon(spark_pdf)
    d_canon = _canon(duck_pdf)
    if _value_hash(s_canon) == _value_hash(d_canon):
        return

    # Hash mismatch: surface the first few differing stringified cells
    # so the fix is obvious (value drift vs representation drift).
    mismatches = []
    cols = list(s_canon.columns)
    for i in range(len(s_canon)):
        for c in cols:
            sv, dv = s_canon.at[i, c], d_canon.at[i, c]
            if sv != dv:
                mismatches.append((i, c, sv, dv))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    raise AssertionError(
        f"{name}: canonical hash mismatch; first stringified diffs "
        f"(row, col, spark, duck): {mismatches}"
    )


def test_no_array_or_struct_output_columns(spark):
    """Registry-level ban: the driver's pandas canonicalizer cannot hash
    list/dict cells, so no query may emit array/struct/map columns —
    serialize (array_join) or explode instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in queries().items():
        for f in fn(spark, SF_DIR).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, (
        f"array/struct/map output columns break the driver canonicalizer: {offenders}"
    )


def test_every_query_has_rows_or_is_known_empty(spark):
    """Queries should exercise real data; empty results are suspicious.

    Known-empty allowance: none currently — tune thresholds instead of
    whitelisting emptiness.
    """
    qs = queries()
    empties = []
    for name, fn in qs.items():
        n = fn(spark, SF_DIR).count()
        if n == 0:
            empties.append(name)
    assert not empties, f"queries returned 0 rows at sf0.001: {empties}"


def test_driver_window_fully_oracle_checkable():
    """Registry invariant: the driver verifies the FIRST 50 registered
    queries only — every one of those slots must carry an oracle twin
    (a no-oracle query in the window burns a verification slot on a
    permanent `no_oracle` row). No-oracle approximates belong at the
    tail."""
    names = list(queries())
    window = names[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"window slots without an oracle: {missing}"
    # and the documented no-oracle set sits at the very tail
    no_oracle = [n for n in names if n not in ORACLES]
    assert names[-len(no_oracle):] == no_oracle, (
        f"no-oracle queries must be the registry tail, got {no_oracle} "
        f"vs tail {names[-len(no_oracle):]}"
    )


def test_registry_window_marker_and_no_duplicate_keys():
    """Bookkeeping invariants the dict literal cannot enforce itself:

    1. The `slots above are inside the driver's 50-query verification
       window` marker comment in queries.py must sit exactly after the
       50th entry — otherwise the round's coverage notes silently lie
       about which queries earned driver rows (r5 had it at 51).
    2. The QUERIES literal must not contain duplicate keys: Python
       dedupes them silently (first insertion wins), which corrupts the
       window bookkeeping without any behavioral signal.
    """
    import re
    from pathlib import Path

    import kyiv_traffic_bigdata_spark.queries as qmod

    src = Path(qmod.__file__).read_text()
    m = re.search(r"QUERIES: dict\[str, QueryFn\] = \{(.*?)\n\}", src, re.S)
    assert m, "QUERIES literal not found"
    body = m.group(1)
    keys = re.findall(r'^\s*"(\w+)":', body, re.M)
    dups = sorted({k for k in keys if keys.count(k) > 1})
    assert not dups, f"duplicate keys in QUERIES literal: {dups}"

    n_before_marker = None
    seen = 0
    for line in body.split("\n"):
        if re.match(r'\s*"(\w+)":', line):
            seen += 1
        if "slots above are inside" in line:
            n_before_marker = seen
            break
    assert n_before_marker == 50, (
        f"window marker sits after entry {n_before_marker}, expected 50"
    )


def test_rotation_ledger_window_is_least_recent():
    """Machine-checked window rotation (r06 VERDICT ask #5 — the r05
    off-by-one and the r06 stale header both happened because the
    composition was narrated in comments, not asserted).

    Ledger: name → latest round with a driver CORRECTNESS row, computed
    from the CORRECTNESS_r*.json files at the repo root (never-checked
    queries ledger at 0). Invariant: no window slot may re-verify a
    query FRESHER than the stalest non-window oracle-checkable query —
    i.e. the 50 slots always cover least-recent driver evidence. The
    flagship (`geo_trajectory`, = driver entry(), smoke-checked every
    round regardless) is exempt on both sides; ties across the boundary
    are allowed (a stale cohort larger than the window must split).

    Green-stability (r09 VERDICT what's-wrong #1): a window composed in
    session N is least-recent *as of the evidence available when it was
    composed* — i.e. through round N−1. When the driver then lands
    CORRECTNESS_rN.json for exactly that window, the full ledger shows
    the window at rN (freshest), which is the EXPECTED end state of a
    correct rotation, not staleness. So the invariant is checked twice:
    against the full ledger (pre-driver state: the window was just
    rotated onto stale slots) and against the ledger EXCLUDING the
    newest CORRECTNESS file (post-driver state: the window was
    least-recent per the evidence it was composed from). Either passing
    means the rotation is correct; an un-rotated window fails BOTH
    (its slots are fresh even before the newest file).
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    rounds: dict[int, list[str]] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", f.stem).group(1))
        rounds[rnd] = list(json.loads(f.read_text()))

    names = list(queries())
    flagship = "geo_trajectory"
    window = [n for n in names[:50] if n != flagship]
    non_window = [
        n for n in names[50:] if n in ORACLES and n != flagship
    ]

    def violation(exclude_round: int | None) -> str | None:
        ledger: dict[str, int] = {}
        for rnd, qs in rounds.items():
            if rnd == exclude_round:
                continue
            for q in qs:
                ledger[q] = max(rnd, ledger.get(q, 0))
        freshest_in = max(window, key=lambda n: ledger.get(n, 0))
        stalest_out = min(non_window, key=lambda n: ledger.get(n, 0))
        if ledger.get(freshest_in, 0) <= ledger.get(stalest_out, 0):
            return None
        return (
            f"window slot {freshest_in!r} (driver evidence "
            f"r{ledger.get(freshest_in, 0)}) is fresher than non-window "
            f"{stalest_out!r} (r{ledger.get(stalest_out, 0)})"
        )

    full = violation(exclude_round=None)
    sans_newest = violation(exclude_round=max(rounds)) if rounds else None
    assert full is None or sans_newest is None, (
        f"{full}; still true excluding the newest CORRECTNESS file "
        f"(r{max(rounds)}): {sans_newest} — rotate the registry so the "
        "50 slots cover least-recent evidence"
    )


def test_canonicalizer_properties():
    """Meta-test of the gate itself: the hash must be insensitive to row
    and column order, sensitive to any value change, and — by driver
    design — sensitive to numeric REPRESENTATION (int64 '3' vs float64
    '3.0'), which is exactly the HUGEINT trap the oracles CAST around."""
    import pandas as pd

    a = pd.DataFrame({"y": [2, 1, 2], "x": ["p", "q", "p"]})
    b = pd.DataFrame({"x": ["q", "p", "p"], "y": [1, 2, 2]})  # permuted
    assert _value_hash(_canon(a)) == _value_hash(_canon(b))

    c = pd.DataFrame({"y": [2, 1, 3], "x": ["p", "q", "p"]})  # one value
    assert _value_hash(_canon(a)) != _value_hash(_canon(c))

    ints = pd.DataFrame({"v": pd.array([3, 4], dtype="int64")})
    floats = pd.DataFrame({"v": pd.array([3.0, 4.0], dtype="float64")})
    assert _value_hash(_canon(ints)) != _value_hash(_canon(floats))

    # list cells crash the MULTI-column sort (pandas lexsort factorizes
    # object columns — the r4 ERR class the registry bans). NB a
    # single-column list frame sorts fine via "<", which is why the
    # array ban is schema-level, not crash-detection-level.
    import pytest as _pytest

    bad = pd.DataFrame({"v": [[1, 2], [3]], "w": [1, 2]})
    with _pytest.raises(TypeError):
        _canon(bad)
