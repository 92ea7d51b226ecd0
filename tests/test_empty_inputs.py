"""Empty-corpus differential: every oracle-checkable query on zero-row
tables must either MATCH its oracle (rows + columns + value hash under
the driver canon) or fail with a DOCUMENTED clean error.

Why this exists: the driver only ever tests populated tables, so
NULL-vs-0 divergences in global aggregates are invisible until a real
deployment hits an empty partition/snapshot — the r07 review found one
(fk_integrity_audit) by hand; this sweep checks all of them, every run.

Degenerate-input semantics pinned here:
- conditional-count aggregates report 0s, never NULLs (coalesce on the
  Spark side, COALESCE/COUNT on the oracle side);
- Spark's rollup()/cube() emit NO rows over empty input (the SQL
  standard emits a count-0 grand-total row); the oracles carry a
  HAVING guard to match — see the note at SQL_ROLLUP;
- k-seeded collect-pattern operators (kmeans/PQ/classifier families)
  REFUSE empty input with a clear message rather than degrading — the
  allowlist below is the contract that the refusal stays loud and
  worded, not an accident.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from kyiv_traffic_bigdata_spark.queries import QUERIES, build_oracles
from kyiv_traffic_bigdata_spark.tables import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: queries whose EMPTY-input contract is a loud refusal (k-seeded
#: collect patterns: there is no meaningful cluster/codebook/probe over
#: zero vectors) — matched against the start of the error message.
EXPECTED_REFUSALS = {
    "doc_quality_classifier": "cannot train on an empty frame",
    "emb_pq": "need >=",
    "emb_cluster_prune": "need >=",
    "emb_kmeans": "need >=",
    "emb_semdedup": "need >=",
    "emb_decontaminate": "probe_max_sim needs a non-empty probe set",
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).coalesce(
            1
        ).write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def empty_duck(empty_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True).astype(str)


def _vhash(c) -> str:
    h = hashlib.sha256()
    for row in c.itertuples(index=False, name=None):
        h.update(("\x1f".join(row) + "\x1e").encode("utf-8", "replace"))
    return h.hexdigest()


def test_every_oracle_query_handles_empty_tables(spark, empty_sf, empty_duck):
    oracles = build_oracles()
    failures = []
    for name, fn in QUERIES.items():
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, empty_sf).toPandas()
        except Exception as exc:  # noqa: BLE001 — classified below
            msg = str(exc).splitlines()[0]
            want = EXPECTED_REFUSALS.get(name)
            if want is None or want not in msg:
                failures.append(f"{name}: unexpected spark error: {msg[:160]}")
            continue
        if name in EXPECTED_REFUSALS:
            failures.append(f"{name}: expected a refusal, got a result")
            continue
        try:
            dpdf = empty_duck.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(
                f"{name}: oracle error: {str(exc).splitlines()[0][:160]}"
            )
            continue
        if len(spdf) != len(dpdf):
            failures.append(
                f"{name}: rows spark={len(spdf)} duck={len(dpdf)}"
            )
        elif sorted(spdf.columns) != sorted(dpdf.columns):
            failures.append(f"{name}: column mismatch")
        elif _vhash(_canon(spdf)) != _vhash(_canon(dpdf)):
            failures.append(f"{name}: value-hash mismatch on empty input")
    assert not failures, "\n".join(failures)
