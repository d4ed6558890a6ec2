#!/usr/bin/env python3
"""Regenerate the driver-shaped sf1 fixture (10x sf0.1 volumes) — or,
with a multiplier, larger probe fixtures for selected tables.

The driver ships sf0.001/0.01/0.1 only; the sf1 battery of record
(CORRECTNESS_sf1_r*.json / BENCH_sf1_r*.json) runs on a locally
generated 10x set. Earlier rounds regenerated it from throwaway /tmp
scripts that did not survive the round boundary — this file is the
committed recipe so the fixture is reproducible from the repo alone.

Every distribution below was measured from /root/testdata/sf0.1 (see
the inline notes); the planted-fixture contracts in
graft.tools.ContractCheck are SF-invariant by construction (the
queries plant their own doc_id<500 / vec_id<10 slices at runtime), so
an exact byte-level reproduction of any previous sf1 set is NOT
required — only the dtypes, key ranges, FK fans and distribution
shapes. Seeded; rerunning yields identical files (for a given
multiplier — each table block is one function with its own RNG
stream, so mult=1 draws are byte-identical to the historical sf1
recipe and selecting a table subset never shifts another table's
draws).

Usage: python3 scripts/gen_sf1.py [outDir] [mult] [tables]
  outDir  default /tmp/graft_sf1
  mult    integer volume multiplier on the sf1 counts (default 1);
          mult=10 is the sf10 probe scale (r15 verdict #7)
  tables  comma list to generate (default: all) — e.g.
          "documents,embeddings" for the sf10 hot-family probe
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 1
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
SRC = "/root/testdata/sf0.1"
os.makedirs(OUT, exist_ok=True)


def sel(name):
    return ONLY is None or name in ONLY


def rng_for(table):
    """Independent stream per table so editing one table's recipe
    never shifts another's draws (a single shared stream meant a
    documents tweak silently regenerated the embeddings too)."""
    return np.random.default_rng([777, sum(map(ord, table))])

N_CUST, N_SUPP, N_PART = 150_000 * MULT, 10_000 * MULT, 200_000 * MULT
N_ORDERS, N_LINE, N_EVENTS = (1_500_000 * MULT, 6_000_000 * MULT,
                              1_000_000 * MULT)
N_DOCS, N_VECS = 50_000 * MULT, 20_000 * MULT
# The engine's d-family plant docs occupy doc_id >= 6_000_000
# (TrainQueries.plantDocs / plantDocsIdentical); an ambient fixture
# reaching that range would silently collide with the plants and
# corrupt their SF-invariant contracts. Fail loudly instead.
assert N_DOCS < 6_000_000, (
    f"mult={MULT} puts ambient doc_id up to {N_DOCS - 1}, colliding with "
    "the engine's planted doc_id range [6_000_000, ...) — cap mult < 120")


def write(name, table, row_group_size):
    pq.write_table(table, f"{OUT}/{name}.parquet",
                   row_group_size=row_group_size)
    print(f"{name}: {table.num_rows} rows")


# region / nation are byte-identical across driver SFs — copy sf0.1.
for t in ("region", "nation"):
    if not sel(t):
        continue
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{OUT}/{t}.parquet")
    print(f"{t}: copied from sf0.1")

if sel("customer"):
    # customer: acctbal uniform(-1000,10000) 2dp, 5 TPC-H segments
    rng = rng_for("customer")
    segments = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                         "MACHINERY"])
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
        "c_mktsegment": segments[rng.integers(0, 5, N_CUST)],
    }), 65536)

if sel("supplier"):
    rng = rng_for("supplier")
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
    }), 65536)

if sel("part"):
    # part: 8x8 adjective-noun names, Brand#1..25, 6 types, size 1..50,
    # retailprice = 900 + (key % 1000)/10 (measured exact at sf0.1)
    rng = rng_for("part")
    adjs = np.array(["blue", "cold", "hot", "large", "new", "old", "red",
                     "small"])
    nouns = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring",
                      "rod", "widget"])
    ptypes = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
                       "STANDARD"])
    pk = np.arange(N_PART)
    write("part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adjs[rng.integers(0, 8, N_PART)],
                                              nouns[rng.integers(0, 8, N_PART)])],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, N_PART)],
        "p_type": ptypes[rng.integers(0, 6, N_PART)],
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }), 65536)

if sel("orders"):
    # orders: day-granular dates uniform 1995-01-01..2001-08-01,
    # status/priority uniform, totalprice uniform(1000,500000) 2dp
    rng = rng_for("orders")
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])
    d0 = np.datetime64("1995-01-01")
    odays = rng.integers(0, int((np.datetime64("2001-08-01") - d0)
                                / np.timedelta64(1, "D")) + 1, N_ORDERS)
    odate = (d0 + odays.astype("timedelta64[D]")).astype("datetime64[us]")
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
        "o_orderstatus": statuses[rng.integers(0, 3, N_ORDERS)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": prios[rng.integers(0, 5, N_ORDERS)],
    }), 262144)

if sel("lineitem"):
    # lineitem: orderkey uniform (Poisson(4) fan, matches the measured
    # histogram), linenumber = per-order seq wrapped at 7 (measured max 7),
    # extendedprice uniform(900,105000) independent of part price
    # (measured: ep/qty spans 18..105k), shipdate day-granular uniform
    # over its own 1995-01-02..2001-11-04 range (independent of orderdate:
    # measured lags span -2399..+2496 days)
    rng = rng_for("lineitem")
    lok = np.sort(rng.integers(0, N_ORDERS, N_LINE))
    # per-order sequence number over the sorted keys
    starts = np.flatnonzero(np.diff(lok, prepend=-1))
    seq = np.arange(N_LINE) - np.repeat(starts, np.diff(
        np.append(starts, N_LINE)))
    rf = np.array(["A", "N", "R"])
    ls = np.array(["F", "O"])
    s0 = np.datetime64("1995-01-02")
    sdays = rng.integers(0, int((np.datetime64("2001-11-04") - s0)
                                / np.timedelta64(1, "D")) + 1, N_LINE)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), pa.int64()),
        "l_linenumber": pa.array(seq % 7 + 1, pa.int32()),
        "l_quantity": rng.integers(1, 51, N_LINE).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, N_LINE), 2),
        "l_discount": np.round(rng.integers(0, 11, N_LINE) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, N_LINE) / 100.0, 2),
        "l_returnflag": rf[rng.integers(0, 3, N_LINE)],
        "l_linestatus": ls[rng.integers(0, 2, N_LINE)],
        "l_shipdate": pa.array((s0 + sdays.astype("timedelta64[D]"))
                               .astype("datetime64[us]"), pa.timestamp("us")),
    }), 524288)

if sel("events"):
    # events: ts uniform over Jan 2024 with microsecond jitter, users =
    # customers/10, value Expo(mean 50) 2dp, props = {"k": 0..99}
    rng = rng_for("events")
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = int((np.datetime64("2024-01-31T00:00:00", "us") - t0)
                  / np.timedelta64(1, "us"))
    ets = t0 + rng.integers(0, span_us, N_EVENTS).astype("timedelta64[us]")
    write("events", pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(np.sort(ets), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_CUST // 10, N_EVENTS), pa.int64()),
        "event_type": etypes[rng.integers(0, 5, N_EVENTS)],
        "value": np.round(rng.exponential(50.0, N_EVENTS), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, N_EVENTS)],
    }), 131072)

if sel("documents"):
    # documents: 10..100 words from the driver's 30-word vocab plus the
    # rare 'dup' token (measured ~0.094% of tokens), en-weighted langs,
    # round-robin src0..src19 (measured exactly uniform per source)
    rng = rng_for("documents")
    vocab = np.array(["a", "agg", "batch", "big", "column", "customer",
                      "data", "fast", "filter", "group", "hash", "join",
                      "key", "line", "merge", "order", "part", "query",
                      "row", "scan", "slow", "small", "sort", "spark",
                      "stream", "table", "the", "value", "vector",
                      "window"])
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
    nwords = rng.integers(10, 101, N_DOCS)
    # The d26/d28 substring plants splice doc 3's leading 25 tokens and
    # doc 5's leading 40 tokens at query time — the donors must be long
    # enough to donate (ContractCheck asserts the resulting runs). The
    # driver's own sf0.1 happens to satisfy this (41/80 tokens); pin it.
    nwords[3] = max(nwords[3], 60)
    nwords[5] = max(nwords[5], 80)
    # d31's intra-doc plant appends doc 9's leading 25 tokens to itself
    nwords[9] = max(nwords[9], 45)
    texts = []
    for n in nwords:
        ws = vocab[rng.integers(0, len(vocab), n)]
        ws = np.where(rng.random(n) < 0.001, "dup", ws)
        texts.append(" ".join(ws))
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": texts,
        "lang": langs[rng.choice(5, N_DOCS, p=lang_p)],
        "source": [f"src{i % 20}" for i in range(N_DOCS)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), 8192)

if sel("embeddings"):
    # embeddings: 10 weak Gaussian clusters in 64-dim float32 (measured:
    # per-dim noise std 0.1245, cluster-center norm ~0.07)
    rng = rng_for("embeddings")
    labels = rng.integers(0, 10, N_VECS)
    centers = rng.normal(0, 0.009, (10, 64))
    emb = (centers[labels] + rng.normal(0, 0.1245, (N_VECS, 64))) \
        .astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), pa.float32()), 64).cast(
            pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), 4096)

print(f"sf1 fixture written to {OUT}")
