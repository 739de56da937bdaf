#!/usr/bin/env python
"""Differential fuzzing: engine vs oracle on ADVERSARIAL corpora.

`make correctness` checks every (queries(), oracle_sql()) pair on the
driver's well-behaved sf0.01 tables. This harness re-checks the pairs
on randomized hostile inputs — the bug class it targets is
data-dependent engine/oracle divergence that benign data never
triggers (two round-4 examples caught by review, now regression-fuzzed
here: Spark's descending sequence() on fully-merged BPE words; Spark
null vs DuckDB NaN on 0/0 symbol_ratio for empty text).

Each trial synthesizes documents + embeddings parquet with hostile
features (empty texts, single-char words, exact duplicate docs,
repeated paragraphs, curly-quote/long-s unicode, mixed case, zero and
duplicate vectors), plus tiny TPC-H-shaped relational tables (duplicate keys, orphan
foreign keys, zero prices, boundary/tie dates, empty + unicode
strings, burst/tie event timestamps), registers them as DuckDB views,
and compares EVERY oracle-paired catalog query using the same
canonical rows + hash as tools/gen_correctness.py.

Usage:  python tools/fuzz_correctness.py [n_trials] [base_seed]
Exit 1 on any divergence (per-query detail printed).
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from datamunging_spark.session import get_spark  # noqa: E402
from tests.test_queries_oracle import _rows  # noqa: E402

N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
BASE_SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817

WORDS = (
    "the of and a to in is it key row scan merge batch value table part "
    "fast slow hash sort window spark line agg"
).split()
HOSTILE_TEXTS = [
    "",  # empty — 0/0 ratio class
    " ",  # whitespace only — split() gives ['', '']
    "a",  # fully-merges in BPE within 2 rounds
    "a a a a a a a a a a a a",  # extreme repetition, single char
    "ſoft “curly” ‘quotes’ Kelvin",  # unicode fold hazards
    "MiXeD CaSe MIXED case mixed CASE",  # case-normalization class
    "x # y # z # x # y",  # contains the paragraph separator token
    "tab\there newline\\n literal",
    "line one\nline two\nline one",  # REAL newlines: sentence/para ops
    "ends with dot. two. sentences.",  # sentence-split edges
    "word. \n . \n mixed\nterminators. ",
    # Unicode whitespace (ADVICE r4): Python str.split() splits on these,
    # RE2's \s does not — exercises the aligned extract_munge_metrics
    # oracle split class (NBSP, thin space, line/para sep, ideographic)
    "nb\u00a0sp thin\u2009space line\u2028sep para\u2029sep ideo\u3000sp",
    # translate-then-count class: en/em-dash → '-', '…' → '...', ligature
    # and long-s folds — lone '–' must count as punctuation AFTER R5.
    # SCREENING PRECONDITION: every ligature/long-s token must expand to
    # a DICTIONARY word ('ﬂoor', 'ﬁrst', 'ſoft') — extract_munge_metrics'
    # SQL oracle pins tokens_corrected=0 and cannot model cascade
    # corrections ('ﬅop'→'ftop'→f/s-recovery→'stop' diverged here, r5);
    # the correction behavior itself is locked by
    # test_munge_oracle.test_ligature_expansion_can_trigger_fs_correction
    "– en–dash — em—dash … ellipsis ﬁrst ﬂoor ſoft –",
    "x" * 5000 + " monster single word",  # monster-length token
]


def make_tables(tmp: Path, seed: int, spark) -> None:
    rng = random.Random(seed)
    docs = []
    n = rng.randint(25, 45)
    for i in range(n):
        roll = rng.random()
        if roll < 0.06:
            # NULL text (failed upstream extract): the SPEC.md ingestion
            # contract canonicalizes it to '' on BOTH engines — a sweep
            # before that contract found 14 ops with divergent NULL
            # behavior, so this class stays in the mix permanently
            text = None
        elif roll < 0.25:
            text = rng.choice(HOSTILE_TEXTS)
        elif roll < 0.35 and docs:
            text = docs[rng.randrange(len(docs))][1]  # exact duplicate
        else:
            k = rng.choice([2000]) if rng.random() < 0.05 else rng.randint(1, 60)
            toks = [rng.choice(WORDS) for _ in range(k)]
            if rng.random() < 0.3:  # repeated paragraph
                toks = toks + toks
            text = " ".join(toks)
        docs.append(
            (i, text,
             # NULL lang/source (unknown provenance): the SPEC.md §0
             # contract canonicalizes both to '' on both engines
             None if rng.random() < 0.06 else rng.choice(["en", "de", "xx"]),
             None if rng.random() < 0.06 else f"src{rng.randrange(3)}",
             len(text) if text is not None else 0)
        )
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(2).write.parquet(str(tmp / "documents.parquet"))

    dim = 64
    vecs = []
    for i in range(rng.randint(20, 40)):
        roll = rng.random()
        if roll < 0.06:
            # NULL vector: DROPPED at ingestion on both engines
            # (SPEC.md §0 contract — unusable in any distance)
            v = None
        elif roll < 0.1:
            v = [0.0] * dim  # zero vector — cosine 0/0 class
        elif roll < 0.25 and vecs:
            v = vecs[rng.randrange(len(vecs))][1]  # duplicate vector
            if v is None:
                v = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        else:
            v = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        vecs.append((i, v, rng.randrange(4)))
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(2).write.parquet(str(tmp / "embeddings.parquet"))

    make_relational_tables(tmp, rng, spark)


def make_relational_tables(tmp: Path, rng: random.Random, spark) -> None:
    """Tiny TPC-H-shaped + events tables with hostile-but-valid values:
    duplicate keys where legal, zero/negative prices, boundary dates,
    empty and unicode strings, orphan foreign keys, ties everywhere
    (ties + row_number is the classic cross-engine instability)."""
    from datetime import datetime, timedelta

    def dt(days: float) -> datetime:
        return datetime(1995, 1, 1) + timedelta(days=days)

    regions = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    spark.createDataFrame(regions, "r_regionkey int, r_name string") \
        .coalesce(1).write.parquet(str(tmp / "region.parquet"))
    nations = [(i, f"NATION {i}", i % 5) for i in range(10)]
    spark.createDataFrame(nations, "n_nationkey int, n_name string, n_regionkey int") \
        .coalesce(1).write.parquet(str(tmp / "nation.parquet"))

    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    hostile_names = ["", " ", "Ünïcode Ltd", "O'Brien & Sons", "a#b%c_d"]
    cust = [
        (i,
         rng.choice(hostile_names) if rng.random() < 0.2
         else f"Customer#{i:09d}",
         rng.randrange(10),
         round(rng.choice([0.0, -999.99, rng.uniform(-1000, 10000)]), 2),
         rng.choice(segs))
        for i in range(30)
    ]
    spark.createDataFrame(
        cust,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(str(tmp / "customer.parquet"))

    supp = [(i, f"Supplier#{i:09d}", rng.randrange(10),
             round(rng.uniform(-1000, 10000), 2)) for i in range(8)]
    spark.createDataFrame(
        supp, "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ).coalesce(1).write.parquet(str(tmp / "supplier.parquet"))

    types = ["ECONOMY BRASS", "STANDARD COPPER", "PROMO STEEL", "LARGE TIN"]
    part = [
        (i,
         rng.choice(hostile_names) if rng.random() < 0.15 else f"part {i}",
         f"Brand#{rng.randrange(1, 6)}{rng.randrange(1, 6)}",
         rng.choice(types),
         rng.choice([0, 1, 50, 50, rng.randrange(1, 51)]),  # ties
         round(rng.choice([0.0, rng.uniform(100, 2000)]), 2))
        for i in range(20)
    ]
    spark.createDataFrame(
        part,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(str(tmp / "part.parquet"))

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = [
        (i,
         rng.randrange(35),  # some custkeys are orphans (no such customer)
         rng.choice("POF"),
         round(rng.choice([0.0, rng.uniform(1000, 300000)]), 2),
         dt(rng.choice([0, 0, 2400, rng.uniform(0, 2400)])),  # boundary+tie
         rng.choice(prios))
        for i in range(40)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp / "orders.parquet"))

    li = []
    for i in range(120):
        li.append((
            rng.randrange(45),  # some orderkeys orphaned
            rng.randrange(25),
            rng.randrange(10),
            rng.randrange(1, 8),
            float(rng.choice([0, 1, 25, 25, rng.randrange(1, 51)])),
            round(rng.choice([0.0, rng.uniform(900, 100000)]), 2),
            rng.choice([0.0, 0.05, 0.1]),
            rng.choice([0.0, 0.04, 0.08]),
            rng.choice("ANR"),
            rng.choice("OF"),
            dt(rng.choice([0, 2400, rng.uniform(0, 2400)])),
        ))
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(2).write.parquet(str(tmp / "lineitem.parquet"))

    etypes = ["signup", "click", "error", "view", "purchase"]
    ev = []
    base = datetime(2024, 1, 1)
    t = 0.0
    for i in range(80):
        # bursts + gaps + exact-tie timestamps stress sessionize/windows
        t += rng.choice([0.0, 0.0, 1.0, 60.0, 3600.0, rng.uniform(0, 900)])
        ev.append((
            i, base + timedelta(seconds=t), rng.randrange(6),
            rng.choice(etypes),
            round(rng.choice([0.0, rng.uniform(0, 500)]), 2),
            rng.choice(['{"k": 0}', f'{{"k": {rng.randrange(100)}}}',
                        '{}', '{"k": null}']),
        ))
    spark.createDataFrame(
        ev,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(tmp / "events.parquet"))


def main() -> int:
    spark = get_spark(app_name="fuzz-correctness")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    failures: list[str] = []
    n_checked = n_skipped = 0
    for trial in range(N_TRIALS):
        seed = BASE_SEED + trial
        tmp = Path(tempfile.mkdtemp(prefix=f"fuzz_{seed}_"))
        try:
            make_tables(tmp, seed, spark)
            con = duckdb.connect()
            for tbl in ("documents", "embeddings", "region", "nation",
                        "customer", "supplier", "part", "orders",
                        "lineitem", "events"):
                # Spark writes a directory of part files — glob for DuckDB.
                # Replay the engine's ingestion canonicalization
                # (queries.t / SPEC.md §0): documents NULL
                # text/lang/source ≡ '', NULL embedding rows dropped
                sel = (
                    "* REPLACE (coalesce(text, '') AS text, "
                    "coalesce(lang, '') AS lang, "
                    "coalesce(source, '') AS source)"
                    if tbl == "documents" else "*"
                )
                where = (" WHERE embedding IS NOT NULL"
                         if tbl == "embeddings" else "")
                con.sql(
                    f"CREATE VIEW {tbl} AS SELECT {sel} FROM "
                    f"read_parquet('{tmp}/{tbl}.parquet/*.parquet'){where}"
                )
            for name, fn in qs.items():
                if name not in osql:
                    continue  # rows-only: no oracle to diverge from
                try:
                    got = fn(spark, str(tmp)).toPandas()
                except Exception as e:  # needs tables we didn't make
                    if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                        n_skipped += 1
                        continue
                    failures.append(f"[seed {seed}] {name}: spark raised {e!r:.300}")
                    continue
                try:
                    want = con.sql(osql[name]).df()
                except Exception as e:
                    if "does not exist" in str(e) or "Table" in str(e):
                        n_skipped += 1
                        continue
                    failures.append(f"[seed {seed}] {name}: oracle raised {e!r:.300}")
                    continue
                n_checked += 1
                gc, gr = _rows(got)
                wc, wr = _rows(want)
                if gc != wc:
                    failures.append(f"[seed {seed}] {name}: columns {gc} vs {wc}")
                elif gr != wr:
                    bad = next(i for i, (a, b) in enumerate(
                        zip(gr, wr)) if a != b) if len(gr) == len(wr) else -1
                    detail = (
                        f"row {bad}: {gr[bad]} vs {wr[bad]}" if bad >= 0
                        else f"row counts {len(gr)} vs {len(wr)}"
                    )
                    failures.append(f"[seed {seed}] {name}: {detail}")
                print(f"[seed {seed}] {name}: "
                      f"{'DIVERGED' if failures and failures[-1].startswith(f'[seed {seed}] {name}:') else 'ok'}")
            con.close()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(f"\nchecked {n_checked} query-runs over {N_TRIALS} trials "
          f"({n_skipped} skipped)")
    if failures:
        print(f"{len(failures)} DIVERGENCES:")
        for f in failures:
            print("  " + f)
        return 1
    print("all checked pairs agree")
    return 0


if __name__ == "__main__":
    sys.exit(main())
