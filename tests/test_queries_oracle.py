"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 - the same bar as the driver's CORRECTNESS gate (which runs at
sf0.01). For driver-scale coverage run THIS file with the scale
override::

    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_queries_oracle.py -q

(the spark/duck fixtures follow the override; other test modules pin
sf0.001-specific expectations and should run at the default).
"""

from __future__ import annotations

import pytest

from dlt_salesforce_iceberg_rest_demo_spark.plans import REGISTRY, query_fns, oracle_sqls

from .conftest import SF_DIR, assert_frames_match


def _oracle_names():
    query_fns()  # force registry load
    return sorted(oracle_sqls().keys())


def _all_names():
    return sorted(query_fns().keys())


# Oracle queries that may legitimately return zero rows at sf0.001.
# Keep EMPTY unless a query's semantics genuinely require it: a 0-row
# result matches its oracle vacuously (schema-only evidence), which is
# how three round-1 gate queries silently proved nothing.
NONEMPTY_EXEMPT: set[str] = {
    # The 10% md5-sparsified supplier co-occurrence graph contains no
    # triangles at sf0.001 (2 would need 30% density, which multiplies
    # the sf0.1 bench graph ~27x). The query is NON-vacuous at the
    # driver's sf0.01 correctness gate (194 triangles) and at sf0.1
    # (124k), so its hash match proves values where it counts.
    "graph_triangle_count_suppliers",
    # Same sparsified graph: the 3-truss is empty at sf0.001 (no
    # triangles exist); 343 edges at the sf0.01 driver gate.
    "graph_k_truss_suppliers",
}


# Round-11 (driver-window fix): the default suite runs a SMOKE subset
# of the oracle drive — one-or-more representatives per operator
# family, including every bench headliner family and every operator a
# round has ever changed — and marks the rest `exhaustive`
# (SPARK_GRAFT_FULL_TESTS=1 runs all 274; the round ritual and the
# scale-override drive do). The driver's own CORRECTNESS gate
# re-drives EVERY oracle query at sf0.01 regardless, so the full
# per-query sweep is redundant inside the driver's VERIFY window —
# which the grown suite no longer fit (r10: timed out at ~25% with
# all dots green).
from .conftest import SMOKE_QUERIES


def _oracle_params():
    return [
        name if name in SMOKE_QUERIES
        else pytest.param(name, marks=pytest.mark.exhaustive)
        for name in _oracle_names()
    ]


@pytest.mark.parametrize("name", _oracle_params())
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    spark_df = q.spark(spark, SF_DIR)
    oracle_pdf = duck.execute(q.oracle).df()
    assert_frames_match(spark_df, oracle_pdf, name)
    if name not in NONEMPTY_EXEMPT:
        assert len(oracle_pdf) > 0, (
            f"{name} is VACUOUS at sf0.001 (0 rows in both engines): "
            "reshape its predicates so the hash match proves values, "
            "or add it to NONEMPTY_EXEMPT with a justification"
        )


@pytest.mark.parametrize("name", [n for n in _all_names() if n not in _oracle_names()])
def test_oracleless_query_runs(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    q = REGISTRY[name]
    df = q.spark(spark, SF_DIR)
    assert df.columns, name
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"region", "n_items", "revenue"}


def test_every_query_has_doc():
    query_fns()
    for name, q in REGISTRY.items():
        assert q.doc.strip(), f"{name} missing docstring/parity note"


def test_driver_contract_key_consistency():
    """oracle_sql() keys must be a subset of queries() keys with
    non-empty SQL — a dangling oracle would crash the driver gate."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())
    assert all(callable(f) for f in q.values())


def test_bench_stdout_line_fits_driver_capture():
    """The driver captures only the tail ~2 kB of bench stdout; rounds
    1 and 2 both recorded "parsed": null because the full 73-query map
    (~4.6 kB) got front-truncated. The compact stdout line must stay
    parseable and under 1.5 kB even as the headline set grows."""
    import json

    import bench

    fake = {f"query_with_a_reasonably_long_name_{i:03d}": i * 0.123 for i in range(120)}
    mins = {k: v * 0.9 for k, v in fake.items()}
    full, compact = bench.build_payloads(fake, sum(fake.values()), 0.1, mins)
    assert len(compact) < 1500, len(compact)
    parsed = json.loads(compact)
    assert parsed["metric"] == "headline_queries_total_wall_clock"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == 120
    assert len(parsed["queries"]) == 5  # slowest-5 preview
    # the full map still lands on disk, intact
    assert len(json.loads(full)["queries"]) == 120


def test_bench_noise_gap_separates_cool_from_warm():
    """noise_gap = sum(median - min) per query: a steady-state
    indicator so a driver bench started right after a long suite
    (JVM-tail contamination, observed rounds 3-6) self-identifies.
    A cool run (runs nearly identical) must show a small gap; a warm
    run (median far above min) a large one; and the field must appear
    in BOTH payloads without breaking the 1.5 kB stdout budget."""
    import json

    import bench

    timings = {f"q{i}": 1.0 for i in range(30)}
    cool_mins = {k: 0.98 for k in timings}  # median ~ min
    warm_mins = {k: 0.40 for k in timings}  # median ≫ min
    full_c, compact_c = bench.build_payloads(timings, 30.0, 0.1, cool_mins)
    full_w, compact_w = bench.build_payloads(timings, 30.0, 0.1, warm_mins)
    gap_c = json.loads(compact_c)["noise_gap"]
    gap_w = json.loads(compact_w)["noise_gap"]
    assert gap_w > 10 * gap_c > 0
    assert json.loads(full_w)["noise_gap"] == gap_w
    assert json.loads(full_w)["min_of_3"]["q0"] == 0.40
    # backward-compatible: mins omitted -> gap 0, payloads still valid
    full_0, compact_0 = bench.build_payloads(timings, 30.0, 0.1)
    assert json.loads(compact_0)["noise_gap"] == 0.0
    assert len(compact_w) < 1500


def test_fixture_invariants_oracles_depend_on(duck):
    """Several oracle equivalences lean on fixture properties; if the
    driver's generator ever changes, fail HERE with a clear message
    instead of as opaque hash mismatches:

    - documents.text is pure ASCII (byte-level oracles equate ord(char)
      with payload bytes);
    - (user_id, ts) is unique in events (the EWMA fold order and the
      regex-funnel sequence strings are fully determined);
    - event types have distinct initials (the funnel symbol alphabet);
    - embeddings are 64-dimensional with no NULLs (fixed-point dot
      oracles and the k-means replay index positions 1..64).
    """
    non_ascii = duck.execute(
        "SELECT COUNT(*) FROM documents "
        "WHERE octet_length(CAST(text AS BLOB)) <> length(text)"
    ).fetchone()[0]
    assert non_ascii == 0, "documents.text is no longer pure ASCII"

    dup_ts = duck.execute(
        "SELECT COUNT(*) FROM (SELECT user_id, ts FROM events "
        "GROUP BY 1, 2 HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    assert dup_ts == 0, "(user_id, ts) no longer unique in events"

    initials = duck.execute(
        "SELECT COUNT(DISTINCT substr(event_type, 1, 1)), "
        "COUNT(DISTINCT event_type) FROM events"
    ).fetchone()
    assert initials[0] == initials[1], "event-type initials collide"

    emb = duck.execute(
        "SELECT COUNT(*) FROM embeddings "
        "WHERE embedding IS NULL OR len(embedding) <> 64"
    ).fetchone()[0]
    assert emb == 0, "embeddings are not uniformly 64-d"
