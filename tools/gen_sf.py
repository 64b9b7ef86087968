#!/usr/bin/env python3
"""Generate a larger-scale fixture statistically matched to the driver's
/root/testdata tables (TESTDATA.md) for shake-out runs beyond sf0.1.

The driver's generator is not available; this one reproduces the SHAPE
that the query registry and its DuckDB oracles depend on — schemas
(physical parquet types included), categorical value sets, key
densities, date ranges, the 30-word document lexicon with planted
'dup' tokens / exact-duplicate pairs / shared-200-char-prefix
near-duplicates, and 10-cluster unit-norm embeddings with planted
near-identical vectors. Correctness at any sf is self-consistency:
Verify and the oracle read the SAME files, so a faithful shape (not a
byte-identical clone) is what a scale shake-out needs.

Usage: python3 tools/gen_sf.py <outdir> [scale]   # scale 10 = "sf1"
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "sf1_fixture"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0  # vs sf0.1

rng = np.random.RandomState(4242)

US = "timestamp[us]"


def write(name, cols, schema):
    t = pa.table(cols, schema=pa.schema(schema))
    pq.write_table(t, f"{OUT}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows")


import os
os.makedirs(OUT, exist_ok=True)

# ---- region / nation (fixed dimensions, as in the driver's tables) ----
write("region",
      {"r_regionkey": np.arange(5, dtype=np.int32),
       "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
      [("r_regionkey", pa.int32()), ("r_name", pa.string())])
write("nation",
      {"n_nationkey": np.arange(25, dtype=np.int32),
       "n_name": [f"NATION_{i}" for i in range(25)],
       "n_regionkey": (np.arange(25) % 5).astype(np.int32)},
      [("n_nationkey", pa.int32()), ("n_name", pa.string()),
       ("n_regionkey", pa.int32())])

N_CUST = int(15000 * SCALE)
N_SUPP = int(1000 * SCALE)
N_PART = int(20000 * SCALE)
N_ORD = int(150000 * SCALE)
N_EVT = int(100000 * SCALE)
N_DOC = int(5000 * SCALE)
N_VEC = int(2000 * (4 ** np.log10(SCALE)))  # 500->2000 per decade: x4

write("customer",
      {"c_custkey": np.arange(N_CUST, dtype=np.int64),
       "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
       "c_nationkey": rng.randint(0, 25, N_CUST).astype(np.int32),
       "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
       "c_mktsegment": np.array(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD",
                                 "FURNITURE", "BUILDING"])[rng.randint(0, 5, N_CUST)]},
      [("c_custkey", pa.int64()), ("c_name", pa.string()),
       ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
       ("c_mktsegment", pa.string())])

write("supplier",
      {"s_suppkey": np.arange(N_SUPP, dtype=np.int64),
       "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
       "s_nationkey": rng.randint(0, 25, N_SUPP).astype(np.int32),
       "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)},
      [("s_suppkey", pa.int64()), ("s_name", pa.string()),
       ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])

adjs = ["large", "hot", "blue", "dark", "light", "small", "cold", "red"]
nouns = ["ring", "bolt", "case", "disk", "tube", "cap", "lens", "cog"]
write("part",
      {"p_partkey": np.arange(N_PART, dtype=np.int64),
       "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(N_PART)],
       "p_brand": [f"Brand#{i % 25}" for i in range(N_PART)],
       "p_type": np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM",
                           "PROMO"])[rng.randint(0, 6, N_PART)],
       "p_size": rng.randint(1, 51, N_PART).astype(np.int32),
       "p_retailprice": np.round(900.0 + (np.arange(N_PART) % 1000) * 0.1, 1)},
      [("p_partkey", pa.int64()), ("p_name", pa.string()),
       ("p_brand", pa.string()), ("p_type", pa.string()),
       ("p_size", pa.int32()), ("p_retailprice", pa.float64())])

EPOCH95 = np.datetime64("1995-01-01", "us")
o_date = EPOCH95 + (rng.randint(0, 2404, N_ORD) * 86400_000_000).astype("timedelta64[us]")
write("orders",
      {"o_orderkey": np.arange(N_ORD, dtype=np.int64),
       "o_custkey": rng.randint(0, N_CUST, N_ORD).astype(np.int64),
       "o_orderstatus": np.array(["O", "P", "F"])[rng.randint(0, 3, N_ORD)],
       "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
       "o_orderdate": o_date,
       "o_orderpriority": np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                    "4-NOT SPECIFIED", "5-LOW"])[rng.randint(0, 5, N_ORD)]},
      [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
       ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
       ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())])

lines_per = rng.randint(1, 8, N_ORD)  # E[4]: ~6M lineitems at SCALE=10
l_order = np.repeat(np.arange(N_ORD, dtype=np.int64), lines_per)
NL = len(l_order)
l_linenumber = (np.concatenate([np.arange(1, n + 1) for n in lines_per])
                .astype(np.int32))
l_ship = np.repeat(o_date, lines_per) + \
    (rng.randint(1, 95, NL) * 86400_000_000).astype("timedelta64[us]")
write("lineitem",
      {"l_orderkey": l_order,
       "l_partkey": rng.randint(0, N_PART, NL).astype(np.int64),
       "l_suppkey": rng.randint(0, N_SUPP, NL).astype(np.int64),
       "l_linenumber": l_linenumber,
       "l_quantity": rng.randint(1, 51, NL).astype(np.float64),
       "l_extendedprice": np.round(rng.uniform(900, 105000, NL), 2),
       "l_discount": np.round(rng.randint(0, 11, NL) * 0.01, 2),
       "l_tax": np.round(rng.randint(0, 9, NL) * 0.01, 2),
       "l_returnflag": np.array(["R", "N", "A"])[rng.randint(0, 3, NL)],
       "l_linestatus": np.array(["O", "F"])[rng.randint(0, 2, NL)],
       "l_shipdate": l_ship},
      [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
       ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
       ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
       ("l_discount", pa.float64()), ("l_tax", pa.float64()),
       ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
       ("l_shipdate", pa.timestamp("us"))])

EPOCH24 = np.datetime64("2024-01-01", "us")
ts = EPOCH24 + rng.randint(0, 30 * 86400_000_000, N_EVT, dtype=np.int64) \
    .astype("timedelta64[us]")
ts.sort()
write("events",
      {"event_id": np.arange(N_EVT, dtype=np.int64),
       "ts": ts,
       "user_id": rng.randint(0, int(1500 * SCALE), N_EVT).astype(np.int64),
       "event_type": np.array(["signup", "click", "error", "view",
                               "purchase"])[rng.randint(0, 5, N_EVT)],
       "value": np.round(np.minimum(rng.exponential(50, N_EVT), 560.0), 2),
       "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, N_EVT)]},
      [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
       ("user_id", pa.int64()), ("event_type", pa.string()),
       ("value", pa.float64()), ("props", pa.string())])

# ---- documents: the 30-word lexicon + planted duplicate structure ----
LEX = ["spark", "window", "merge", "table", "column", "vector", "stream",
       "value", "data", "small", "join", "filter", "big", "group", "hash",
       "customer", "sort", "order", "slow", "line", "part", "fast", "the",
       "row", "agg", "key", "query", "scan", "batch", "a"]
langs = np.array(["en", "en", "zh", "es", "fr", "de"])  # en ~2x weighted
doc_words = [
    [LEX[w] for w in rng.randint(0, 30, int(n))]
    for n in rng.randint(8, 111, N_DOC)
]
for i in range(11, N_DOC, 20):  # 'dup' plant: 5% of docs carry the token
    doc_words[i].insert(int(rng.randint(0, len(doc_words[i]))), "dup")
n_exact = int(8 * SCALE)
for k in range(n_exact):  # exact-duplicate pairs
    doc_words[N_DOC - n_exact + k] = list(doc_words[(k * 37) % (N_DOC // 2)])
n_near = int(30 * SCALE)
for k in range(n_near):  # near-dups: >=200-char shared prefix, new tail
    src = doc_words[(k * 53) % (N_DOC // 2)]
    keep = max(len(src) - 3, 40) if len(src) >= 40 else len(src)
    doc_words[N_DOC - n_exact - n_near + k] = \
        src[:keep] + [LEX[w] for w in rng.randint(0, 30, 5)]
texts = [" ".join(w) for w in doc_words]
write("documents",
      {"doc_id": np.arange(N_DOC, dtype=np.int64),
       "text": texts,
       "lang": langs[rng.randint(0, 6, N_DOC)],
       "source": [f"src{i % 20}" for i in range(N_DOC)],
       "n_chars": np.array([len(t) for t in texts], dtype=np.int64)},
      [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
       ("source", pa.string()), ("n_chars", pa.int64())])

# ---- embeddings: 10 unit-norm clusters + planted near-identical pairs ----
centers = rng.randn(10, 64)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
label = rng.randint(0, 10, N_VEC)
vec = centers[label] + 0.55 * rng.randn(N_VEC, 64)
vec /= np.linalg.norm(vec, axis=1, keepdims=True)
n_pairs = int(25 * SCALE)
for k in range(n_pairs):  # near-identical plants (cosine ~0.999)
    src = (k * 13) % (N_VEC // 2)
    v = vec[src] + 0.02 * rng.randn(64)
    vec[N_VEC - n_pairs + k] = v / np.linalg.norm(v)
    label[N_VEC - n_pairs + k] = label[src]
write("embeddings",
      {"vec_id": np.arange(N_VEC, dtype=np.int64),
       "embedding": pa.array([v.astype(np.float32) for v in vec],
                             type=pa.list_(pa.float32())),
       "label": label.astype(np.int32)},
      [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
       ("label", pa.int32())])

print("done:", OUT)
