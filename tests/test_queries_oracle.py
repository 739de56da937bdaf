"""Local mirror of the driver's correctness gate: run every Spark query
and its DuckDB oracle SQL side-by-side, compare row count + column names
+ exact values (sorted by column name, then row-wise) — the strictest
interpretation of the driver's order-insensitive value-hash."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from datamunging_spark.queries import RELATIONAL_QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for tbl in TABLES:
        # replay the engine's ingestion canonicalization (queries.t /
        # SPEC.md §0): documents NULL text/lang/source ≡ '', NULL
        # embedding rows dropped
        sel = (
            "* REPLACE (coalesce(text, '') AS text, "
            "coalesce(lang, '') AS lang, coalesce(source, '') AS source)"
            if tbl == "documents" else "*"
        )
        where = " WHERE embedding IS NOT NULL" if tbl == "embeddings" else ""
        c.sql(
            f"CREATE VIEW {tbl} AS SELECT {sel} "
            f"FROM read_parquet('{SF_DIR}/{tbl}.parquet'){where}"
        )
    return c


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    recs = [
        tuple(_canon(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(recs, key=lambda r: tuple((x is None, str(x)) for x in r))


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn, sql = RELATIONAL_QUERIES[name]
    got = fn(spark, SF_DIR).toPandas()
    want = con.sql(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    gc, gr = _rows(got)
    wc, wr = _rows(want)
    assert gc == wc, f"{name}: columns {gc} vs {wc}"
    mismatches = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"{gr[mismatches[0]]} vs {wr[mismatches[0]]}"
    )


def test_funnel_events_hand_corpus(spark, tmp_path):
    """Windowed-funnel semantics pinned on a hand corpus against a pure-
    Python THIRD implementation: order violations (purchase before
    click), conversion-window violations (> FUNNEL_WINDOW_H after the
    previous stage's FIRST completion — strict first-touch), same-
    timestamp ties broken by event_id, and a user with no stage-1 event.
    The DuckDB oracle runs on the identical corpus."""
    from datetime import datetime, timedelta

    from datamunging_spark.queries import (
        FUNNEL_STAGES,
        FUNNEL_WINDOW_H,
        RELATIONAL_QUERIES,
    )

    base = datetime(2024, 1, 1)
    hh = lambda h: base + timedelta(hours=h)  # noqa: E731
    # (event_id, ts, user_id, event_type)
    rows = [
        # u1: clean full conversion
        (10, hh(0), 1, "view"), (11, hh(1), 1, "click"),
        (12, hh(2), 1, "purchase"),
        # u2: purchase and click BEFORE the first view -> view only
        (20, hh(0.5), 2, "purchase"), (21, hh(1), 2, "click"),
        (22, hh(2), 2, "view"),
        # u3: click 7h after the only view (> window) -> view only
        (30, hh(0), 3, "view"), (31, hh(7), 3, "click"),
        (32, hh(8), 3, "purchase"),
        # u4: strict first-touch — click within window of FIRST view,
        # purchase 6.5h after t2 (> window) -> reaches stage 2 only
        (40, hh(0), 4, "view"), (41, hh(5), 4, "view"),
        (42, hh(5.5), 4, "click"), (43, hh(12), 4, "purchase"),
        # u5: no view at all -> counts nowhere
        (50, hh(0), 5, "click"), (51, hh(0.2), 5, "purchase"),
        # u6: all three at the SAME ts; event_id order makes each stage
        # visible to the next (ties broken deterministically)
        (60, hh(3), 6, "view"), (61, hh(3), 6, "click"),
        (62, hh(3), 6, "purchase"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    # pure-Python third implementation (sequential scan per user)
    def funnel_py(evs):
        reached = [set(), set(), set()]
        by_user = {}
        for e in sorted(evs, key=lambda e: (e[2], e[1], e[0])):
            by_user.setdefault(e[2], []).append(e)
        win = timedelta(hours=FUNNEL_WINDOW_H)
        for uid, es in by_user.items():
            t = [None, None, None]
            for (_, ts, _, kind) in es:
                for k, stage in enumerate(FUNNEL_STAGES):
                    if kind != stage or t[k] is not None:
                        continue
                    prev_ok = k == 0 or (
                        t[k - 1] is not None and ts <= t[k - 1] + win
                    )
                    if prev_ok:
                        t[k] = ts
            for k in range(3):
                if t[k] is not None:
                    reached[k].add(uid)
        n = [len(s) for s in reached]
        out = []
        for k in range(3):
            prev = n[k] if k == 0 else n[k - 1]
            ppm = (n[k] * 1000000) // prev if prev > 0 else 0
            out.append((k + 1, FUNNEL_STAGES[k], n[k], ppm))
        return out

    expect = funnel_py(rows)
    assert expect == [
        (1, "view", 5, 1000000),
        (2, "click", 3, 600000),
        (3, "purchase", 2, 666666),
    ]

    fn, sql = RELATIONAL_QUERIES["funnel_events"]
    got = [tuple(r) for r in fn(spark, str(tmp_path)).collect()]
    assert got == expect

    c = duckdb.connect()
    c.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert c.sql(sql).fetchall() == expect


def test_scd2_history_pure_python(spark, tmp_path):
    """SCD2 reconstruction pinned against a pure-Python THIRD
    implementation (hashlib md5 replay of the synthesized change log,
    change compression, interval derivation incl. the same-day
    supersede convention valid_to = valid_from - 1) on a small key set;
    the DuckDB oracle runs on the identical table."""
    import hashlib

    from datamunging_spark.queries import (
        RELATIONAL_QUERIES,
        SCD_SEGMENTS,
        SCD_VERSIONS,
    )

    keys = list(range(25))
    spark.createDataFrame([(k,) for k in keys], "c_custkey long").write.parquet(
        f"{tmp_path}/customer.parquet"
    )

    def h60(tag, k, j):
        return int(hashlib.md5(f"{tag}:{k}:{j}".encode()).hexdigest()[:15], 16)

    expect = []
    for k in keys:
        log = sorted(
            (
                h60("scd:day", k, j) % 1000,
                j,
                SCD_SEGMENTS[h60("scd:seg", k, j) % len(SCD_SEGMENTS)],
            )
            for j in range(SCD_VERSIONS)
        )
        kept = [e for i, e in enumerate(log) if i == 0 or log[i - 1][2] != e[2]]
        for v, (day, _, seg) in enumerate(kept):
            nxt = kept[v + 1][0] - 1 if v + 1 < len(kept) else None
            expect.append(
                (k, v + 1, seg, day, nxt, 1 if nxt is None else 0)
            )

    fn, sql = RELATIONAL_QUERIES["scd2_history"]
    got = [tuple(r) for r in fn(spark, str(tmp_path)).collect()]
    assert got == expect
    # interval sanity: per key, versions tile [first_day, inf) without
    # overlap (same-day supersedes excepted) and exactly one is_current
    by_key = {}
    for row in got:
        by_key.setdefault(row[0], []).append(row)
    for k, rows in by_key.items():
        assert [r[1] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r[5] for r in rows) == 1 and rows[-1][5] == 1
        for a, b in zip(rows, rows[1:]):
            assert a[4] == b[3] - 1

    c = duckdb.connect()
    c.sql(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    assert c.sql(sql).fetchall() == expect


def test_retention_cohorts_hand_corpus(spark, tmp_path):
    """Retention semantics pinned on a hand corpus vs a pure-Python
    THIRD implementation: users without a signup are excluded entirely,
    pre-signup activity is excluded, cohort = ISO week (Monday) of the
    FIRST signup, week_offset = whole weeks since the signup DAY (not
    calendar-week diff), and cohort_size = the offset-0 cell."""
    from datetime import datetime, timedelta

    from datamunging_spark.queries import RELATIONAL_QUERIES

    d = lambda day, h=0: datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        # u1: signup Mon 01-01; active again 14 days later (offset 2)
        (1, d(1), 1, "signup"), (2, d(15), 1, "click"),
        # u2: signup Wed 01-03 (same Monday cohort); active 8 days later
        (3, d(3), 2, "signup"), (4, d(11), 2, "view"),
        # u3: never signs up -> excluded
        (5, d(2), 3, "click"), (6, d(9), 3, "purchase"),
        # u4: pre-signup event (excluded), signup Wed 01-10
        # (cohort Mon 01-08), active 10 days after signup (offset 1)
        (7, d(4), 4, "view"), (8, d(10), 4, "signup"), (9, d(20), 4, "click"),
        # u5: signup Tue 01-09 (cohort Mon 01-08), nothing after
        (10, d(9), 5, "signup"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    def retention_py(evs):
        signup = {}
        for (_, ts, uid, kind) in evs:
            if kind == "signup" and (uid not in signup or ts < signup[uid]):
                signup[uid] = ts
        cells = {}
        for (_, ts, uid, _kind) in evs:
            if uid not in signup or ts < signup[uid]:
                continue
            monday = signup[uid].date() - timedelta(
                days=signup[uid].date().weekday()
            )
            off = (ts.date() - signup[uid].date()).days // 7
            cells.setdefault((monday.isoformat(), off), set()).add(uid)
        out = []
        for (cw, off) in sorted(cells):
            n = len(cells[(cw, off)])
            size = len(cells[(cw, 0)])
            out.append((cw, off, n, size, (n * 1000000) // size))
        return out

    expect = retention_py(rows)
    assert expect == [
        ("2024-01-01", 0, 2, 2, 1000000),
        ("2024-01-01", 1, 1, 2, 500000),
        ("2024-01-01", 2, 1, 2, 500000),
        ("2024-01-08", 0, 2, 2, 1000000),
        ("2024-01-08", 1, 1, 2, 500000),
    ]

    fn, sql = RELATIONAL_QUERIES["retention_cohorts"]
    got = [tuple(r) for r in fn(spark, str(tmp_path)).collect()]
    assert got == expect

    c = duckdb.connect()
    c.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert c.sql(sql).fetchall() == expect


def test_cdc_apply_pure_python(spark, tmp_path):
    """CDC snapshot semantics pinned vs a pure-Python THIRD
    implementation (hashlib replay of the synthesized feed): latest op
    per key wins, a latest delete removes the key, audit counts cover
    the whole feed (not just surviving rows)."""
    import hashlib

    from datamunging_spark.queries import (
        CDC_OPS,
        RELATIONAL_QUERIES,
        SCD_SEGMENTS,
    )

    keys = list(range(40))
    spark.createDataFrame([(k,) for k in keys], "c_custkey long").write.parquet(
        f"{tmp_path}/customer.parquet"
    )

    def h60(tag, k, j):
        return int(hashlib.md5(f"{tag}:{k}:{j}".encode()).hexdigest()[:15], 16)

    expect = []
    any_deleted = False
    for k in keys:
        ops = []
        for j in range(CDC_OPS):
            op = (
                "I" if j == 0
                else "D" if h60("cdc:op", k, j) % 10 == 9
                else "U"
            )
            seg = SCD_SEGMENTS[h60("cdc:val", k, j) % len(SCD_SEGMENTS)]
            ops.append((j, op, seg))
        last = ops[-1]
        n_updates = sum(1 for (_, op, _) in ops if op == "U")
        if last[1] == "D":
            any_deleted = True
            continue
        expect.append((k, last[2], last[0], CDC_OPS, n_updates))
    assert any_deleted  # the corpus must actually exercise the D path

    fn, sql = RELATIONAL_QUERIES["cdc_apply"]
    got = [tuple(r) for r in fn(spark, str(tmp_path)).collect()]
    assert got == expect

    c = duckdb.connect()
    c.sql(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    assert c.sql(sql).fetchall() == expect
