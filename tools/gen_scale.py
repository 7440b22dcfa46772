"""Deterministic 10× scale-rehearsal data generator (VERDICT-r3 #6).

The driver's testdata stops at sf0.1 (5k documents / 2k embeddings).
SCALE.md's 100 TB argument was purely analytic; this generator produces
an sf1-shaped corpus (10× sf0.1: 50k documents / 20k embeddings) with
the SAME schema, dtypes, and statistical shape as the driver tables —
31-word vocabulary, 10-100-word documents, weighted langs, 20 sources,
~1.5% planted near-duplicates, L2-normalized 64-d float32 embeddings in
10 label clusters — so the heavy operators (dedup_minhash_lsh,
sim_knn_lsh) can be timed at a second scale point and the growth curve
measured instead of asserted.

Writes OUTSIDE /root/testdata (which is read-only by contract):

    python tools/gen_scale.py /tmp/scale_rehearsal/sf1 10

The multiplier scales both tables off the sf0.1 cardinalities. Seeded
numpy end to end — two runs produce byte-identical corpora.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
N_SOURCES = 20
DIM = 64
N_LABELS = 10


def gen_documents(n: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    # zipf-ish word weights so token frequencies are realistic, not flat
    w = 1.0 / np.arange(1, len(VOCAB) + 1)
    w /= w.sum()
    word_idx = rng.permutation(len(VOCAB))
    texts: list[str] = []
    for i in range(n):
        if texts and i % 64 == 63:
            # planted near-duplicate: clone an earlier doc, perturb one word
            src = texts[rng.integers(0, len(texts))].split(" ")
            pos = int(rng.integers(0, len(src)))
            src[pos] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(src))
            continue
        if texts and i % 512 == 511:
            texts.append(texts[int(rng.integers(0, len(texts)))])  # exact dup
            continue
        ln = int(rng.integers(10, 101))
        words = rng.choice(len(VOCAB), size=ln, p=w)
        texts.append(" ".join(VOCAB[word_idx[j]] for j in words))
    langs = rng.choice(LANGS, size=n, p=LANG_W)
    sources = [f"src{i % N_SOURCES}" for i in rng.integers(0, N_SOURCES, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_embeddings(n: int, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    vecs = centers[labels] + 0.35 * rng.standard_normal((n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


def gen_customer(n: int, seed: int = 13) -> pa.Table:
    """Customer master with the driver table's linkage-relevant columns
    (c_custkey, c_name TPC-H style, c_nationkey 0-24, c_acctbal) — the
    second scale point for customer_record_linkage's composite-blocked
    candidate generation."""
    rng = np.random.default_rng(seed)
    keys = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "c_custkey": pa.array(keys),
            "c_name": pa.array(
                [f"Customer#{k:09d}" for k in keys], type=pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n), 2)
            ),
            "c_mktsegment": pa.array(
                [f"SEG{int(s)}" for s in rng.integers(0, 5, size=n)],
                type=pa.string(),
            ),
        }
    )


def gen_orders(n_orders: int, n_cust: int, seed: int = 17) -> pa.Table:
    """Orders fact in the driver table's shape (o_orderkey, o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority) — the
    build side for customers_bloom_prefilter's second scale point.
    ~1/3 of customers place no order (same membership shape as sf0.1,
    where the bloom filter's negative probes come from)."""
    rng = np.random.default_rng(seed)
    custkeys = rng.integers(0, (n_cust * 2) // 3, size=n_orders)
    days = rng.integers(0, 365, size=n_orders)
    base = np.datetime64("2025-01-01", "s")
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
            "o_custkey": pa.array(custkeys.astype(np.int64)),
            "o_orderstatus": pa.array(
                [["O", "F", "P"][int(s)] for s in rng.integers(0, 3, size=n_orders)],
                type=pa.string(),
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900.0, 350000.0, size=n_orders), 2)
            ),
            "o_orderdate": pa.array(
                base + days.astype("timedelta64[D]").astype("timedelta64[s]"),
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [f"{int(p) + 1}-PRI" for p in rng.integers(0, 5, size=n_orders)],
                type=pa.string(),
            ),
        }
    )


def gen_lineitem(
    n: int, n_orders: int = 0, n_supp: int = 0, seed: int = 19
) -> pa.Table:
    """Lineitem twin for the rehearsal queries that read it. Round 10
    widens it (l_orderkey/l_suppkey/l_discount/l_shipdate for the
    pareto + backlog growth rows); the new columns draw from the SAME
    rng AFTER the original draws, so l_returnflag/l_extendedprice stay
    byte-identical to every earlier rehearsal corpus — prior growth
    rows remain comparable."""
    rng = np.random.default_rng(seed)
    flags = rng.choice(["A", "N", "R"], size=n, p=[0.25, 0.5, 0.25])
    prices = np.round(rng.uniform(900.0, 105000.0, size=n), 2)
    okeys = rng.integers(0, max(n_orders, 1), size=n)
    skeys = rng.integers(0, max(n_supp, 1), size=n)
    discounts = np.round(rng.uniform(0.0, 0.1, size=n), 2)
    ship_days = rng.integers(0, 500, size=n)
    base = np.datetime64("2025-01-01", "s")
    return pa.table(
        {
            "l_returnflag": pa.array(flags.tolist(), type=pa.string()),
            "l_extendedprice": pa.array(prices),
            "l_orderkey": pa.array(okeys.astype(np.int64)),
            "l_suppkey": pa.array(skeys.astype(np.int64)),
            "l_discount": pa.array(discounts),
            "l_shipdate": pa.array(
                base + ship_days.astype("timedelta64[D]").astype("timedelta64[s]"),
                type=pa.timestamp("us"),
            ),
        }
    )


def gen_supplier(n: int, seed: int = 29) -> pa.Table:
    """Supplier dim in the driver table's shape (s_suppkey, s_name,
    s_nationkey, s_acctbal) — round 11 adds it (plus the copied
    scale-constant nation dim) so supplier_revenue_gini gets a second
    scale point. lineitem's l_suppkey has drawn over 1000×mult keys
    since round 10, so the join lines up without touching any earlier
    rng stream — prior growth rows stay byte-identical."""
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(n)], type=pa.string()
            ),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n), 2)
            ),
        }
    )


def gen_events(n: int, n_users: int, seed: int = 23) -> pa.Table:
    """Events twin for the event-time operators (burst windows, WAU):
    (event_id, ts, user_id, event_type, value) over one year at
    microsecond precision — the shape the driver table has."""
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    offs = np.sort(rng.integers(0, 365 * 86400 * 1_000_000, size=n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(base + offs.astype("timedelta64[us]"),
                           type=pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n).astype(np.int64)
            ),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "signup", "error"],
                           size=n).tolist(),
                type=pa.string(),
            ),
            "value": pa.array(np.round(rng.uniform(0, 500, size=n), 2)),
        }
    )


def _write(table: pa.Table, path: str, row_group_rows: int) -> None:
    """Many small row groups, not one: a single-row-group file caps
    Spark's scan parallelism at 1-2 tasks regardless of cores, so sf1
    wall-clock growth measured SERIALIZED map cost rather than the
    cluster-shaped cost (the §4-r8 rehearsal caveat). ~32 row groups
    per table lets local[32] parallelize the scans and makes the
    wall-clock column meaningful alongside the shuffle bytes."""
    pq.write_table(table, path, row_group_size=row_group_rows)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_rehearsal/sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(out_dir, exist_ok=True)
    docs = gen_documents(5000 * mult)
    _write(docs, f"{out_dir}/documents.parquet", max(docs.num_rows // 32, 1))
    emb = gen_embeddings(2000 * mult)
    _write(emb, f"{out_dir}/embeddings.parquet", max(emb.num_rows // 32, 1))
    cust = gen_customer(15000 * mult)
    _write(cust, f"{out_dir}/customer.parquet", max(cust.num_rows // 32, 1))
    orders = gen_orders(150000 * mult, 15000 * mult)
    _write(orders, f"{out_dir}/orders.parquet", max(orders.num_rows // 32, 1))
    li = gen_lineitem(600000 * mult, 150000 * mult, 1000 * mult)
    _write(li, f"{out_dir}/lineitem.parquet", max(li.num_rows // 32, 1))
    ev = gen_events(100000 * mult, 10000 * mult)
    _write(ev, f"{out_dir}/events.parquet", max(ev.num_rows // 32, 1))
    supp = gen_supplier(1000 * mult)
    _write(supp, f"{out_dir}/supplier.parquet", max(supp.num_rows // 32, 1))
    # nation is scale-constant (25 rows) — copy the driver dim verbatim
    # so names/keys match what every oracle joins against; resolved
    # through the same env var bench.py uses so generation works on
    # any layout (ADVICE r11)
    nation_src = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    nation = pq.read_table(f"{nation_src}/nation.parquet")
    pq.write_table(nation, f"{out_dir}/nation.parquet")
    print(
        f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings, "
        f"{cust.num_rows} customers, {orders.num_rows} orders, "
        f"{li.num_rows} lineitems, {ev.num_rows} events, "
        f"{supp.num_rows} suppliers, {nation.num_rows} nations -> {out_dir}"
    )


if __name__ == "__main__":
    main()
