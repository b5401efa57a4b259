#!/usr/bin/env python
"""Generate driver-shaped testdata at an arbitrary scale factor.

The driver's tables (TESTDATA.md) only ship at sf ≤ 0.1; the scaling-curve
measurements (VERDICT r3 item 1) need sf1 (~6M lineitem rows).  This
generator reproduces the driver tables' schema and measured distributions
(row-count scale rules, value ranges, key relationships, document near-dup
structure, embedding cluster geometry — all probed from the shipped
sf0.001/0.01/0.1 parquet) so times measured on it extrapolate fairly.

Distribution provenance (measured on the shipped data):
- row counts scale linearly: customer 150k·sf, supplier 10k·sf, part
  200k·sf, orders 1.5M·sf, lineitem 6M·sf (uniform random orderkey ⇒
  per-order line counts are Poisson(4), matching the shipped 1..17 dist),
  events 1M·sf over 15k·sf users, documents 50k·sf,
  embeddings max(500, 20k·sf); region/nation fixed 5/25.
- orders dates uniform 1995-01-01..2001-08-01; l_shipdate = random
  order-range day + 1..95 (independent of the row's own order, as shipped);
  events span 30 days of 2024-01 with sorted timestamps.
- events.value ~ Exp(mean 50) rounded to 2dp (shipped mean 49.6 / std
  49.1 / median 34.6 ≈ the exponential signature); props = {"k": 0..99}.
- documents: 30-word vocab bag-of-words, 10..99 words, lang en 40% /
  4×15%, source src0..19; ~5% of docs are near-dup copies of an earlier
  doc with 1-2 ' dup' tokens appended (reproduces the shipped 'dup'
  marker and the ≥0.35-Jaccard pair density).
- embeddings: unit-normalized 64-dim float32, 10 labels; x = c_label + g,
  g~N(0,I), |c|≈1.13 ⇒ post-normalization centroid norm ≈0.14 and
  within-cluster spread ≈0.99, matching the shipped geometry.

Usage: python tools/gen_sf.py SF OUT_DIR   (e.g. 1 /root/repo/testdata_sf1/sf1)
Seed fixed (42) — output is deterministic per (SF, numpy version).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["MEDIUM", "STANDARD", "LARGE", "PROMO", "SMALL", "ECONOMY"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ADJS = ["large", "hot", "blue", "small", "dark", "light", "red", "green",
        "spring", "metal"]
NOUNS = ["ring", "bolt", "screw", "plate", "wheel", "frame", "pipe", "rod",
         "gear", "cap"]
VOCAB = ("join hash row batch scan customer column filter small slow merge "
         "order vector line data table agg value key stream window spark a "
         "part group big sort query fast the").split()
LANGS = ["en", "es", "fr", "zh", "de"]

DAY_US = 86_400_000_000


def _ts_day_array(days: np.ndarray, epoch_day: int) -> pa.Array:
    return pa.array((days.astype("int64") + epoch_day) * DAY_US,
                    type=pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _zipf_vocab(rng: np.random.Generator, n_terms: int = 50_000,
                s: float = 1.07) -> tuple[np.ndarray, np.ndarray]:
    """A realistic-scale vocabulary with zipfian frequencies.

    The legacy 30-word vocabulary is a DEGENERATE corpus for the dedup
    family (VERDICT r9 item 3): with 30 words every 3-shingle collides
    constantly, prefix filtering has no rare tokens to filter on
    (setsim at sf1: 35M candidates for 2,709 true pairs), and minhash /
    simhash shingle spaces are tiny.  Real text has a heavy-tailed
    vocabulary: ~50k terms, P(rank r) ∝ 1/r^s with s ≈ 1.07 (classic
    Zipf fit for English).  Tokens are pronounceable-ish CV syllable
    strings so lengths/byte sizes look like words, lowercase (the
    normalizer lowercases anyway).  Returns (vocab, probabilities).
    """
    syll = np.array([c + v for c in "bcdfghjklmnprstvwz" for v in "aeiou"])
    parts = rng.integers(0, len(syll), size=(n_terms, 3))
    n_syll = rng.integers(1, 4, n_terms)  # 1-3 syllables
    vocab = np.array([
        "".join(syll[parts[i, : n_syll[i]]]) + (str(i) if i else "")
        for i in range(n_terms)
    ])  # rank suffix guarantees uniqueness without changing the shape much
    p = 1.0 / np.power(np.arange(1, n_terms + 1, dtype=np.float64), s)
    return vocab, p / p.sum()


def generate(sf: float, out_dir: str, vocab_mode: str = "legacy") -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = max(500, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))

    adj = np.array(ADJS)[rng.integers(0, len(ADJS), n_part)]
    noun = np.array(NOUNS)[rng.integers(0, len(NOUNS), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": [f"Brand#{i % 25 + 1}" for i in range(n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 1),
    }))

    epoch_1995 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    order_span = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                     .astype("timedelta64[D]").astype(int))
    o_days = rng.integers(0, order_span + 1, n_ord)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_day_array(o_days, epoch_1995),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # uniform random orderkey per line ⇒ Poisson(n_li/n_ord) lines/order,
    # matching the shipped per-order line-count distribution (1..17, mean 4.07)
    l_ok = rng.integers(0, n_ord, n_li)
    order_sort = np.argsort(l_ok, kind="stable")
    linenum = np.empty(n_li, dtype=np.int32)
    sorted_ok = l_ok[order_sort]
    # linenumber = 1-based position within each order (vectorized run-length)
    starts = np.flatnonzero(np.r_[True, sorted_ok[1:] != sorted_ok[:-1]])
    run_ids = np.cumsum(np.r_[True, sorted_ok[1:] != sorted_ok[:-1]]) - 1
    linenum[order_sort] = (np.arange(n_li) - starts[run_ids] + 1).astype(np.int32)
    ship_days = rng.integers(0, order_span + 1, n_li) + rng.integers(1, 96, n_li)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_day_array(ship_days, epoch_1995),
    }))

    ev_epoch_us = int(np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]")
                      .astype(int))
    ts_us = np.sort(rng.uniform(0, 30 * DAY_US, n_ev)).astype("int64") + ev_epoch_us
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: bag-of-words + ~5% near-dup copies marked with ' dup'.
    # vocab_mode="zipf" swaps the degenerate 30-word vocabulary for a
    # 50k-term zipfian one (same doc lengths, same dup structure) — the
    # corpus the dedup family's 100× claims are benchmarked on.
    if vocab_mode == "zipf":
        vocab, vocab_p = _zipf_vocab(rng)
    else:
        vocab, vocab_p = np.array(VOCAB), None
    lang_p = [0.40, 0.15, 0.15, 0.15, 0.15]
    # draw all word indices in one vectorized pass (per-doc draws with a
    # 50k-bin p are ~100× slower), then slice per doc
    n_words_all = rng.integers(10, 100, n_docs)
    flat_idx = rng.choice(len(vocab), size=int(n_words_all.sum()), p=vocab_p)
    offs = np.r_[0, np.cumsum(n_words_all)]
    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            src = texts[int(rng.integers(0, len(texts)))]
            texts.append(src + " dup" * int(rng.integers(1, 3)))
        else:
            texts.append(" ".join(vocab[flat_idx[offs[i]:offs[i + 1]]]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_docs, p=lang_p)]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    labels = rng.integers(0, 10, n_emb)
    cents = rng.normal(size=(10, 64))
    cents *= 1.13 / np.linalg.norm(cents, axis=1, keepdims=True)
    X = cents[labels] + rng.normal(size=(n_emb, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(X.astype("float32")),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    vocab_mode = "zipf" if "--vocab=zipf" in sys.argv else "legacy"
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else f"/root/repo/testdata_sf{sf:g}/sf{sf:g}"
    print(f"generating sf={sf:g} (vocab={vocab_mode}) -> {out}")
    generate(sf, out, vocab_mode=vocab_mode)
    print("done")
