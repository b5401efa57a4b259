"""Exact-substring duplicate detection (operators/substring.py):
stride-1 exactness vs a brute-force python reference, interval-merge
stats, and the winnowing guarantee (Schleimer et al. 2003)."""

from __future__ import annotations

import random

import pytest

from dask_ssh_docker_spark.operators.substring import (
    substring_dup_stats,
    substring_duplicate_spans,
    winnow_duplicate_spans,
    winnow_fingerprints,
)


def _norm(t: str) -> str:
    import re

    return re.sub(r"\s+", " ", t.strip().lower())


def _ref_spans(texts: dict[int, str], k: int):
    """Brute-force reference: mark every position whose k-gram occurs ≥2
    times corpus-wide, merge consecutive marks."""
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        t = _norm(t)
        for i in range(len(t) - k + 1):
            grams[t[i : i + k]] += 1
    spans = []
    for d, t in texts.items():
        t = _norm(t)
        marks = [i + 1 for i in range(len(t) - k + 1) if grams[t[i : i + k]] >= 2]
        if not marks:
            continue
        start = prev = marks[0]
        n = 1
        for p in marks[1:]:
            if p == prev + 1:
                prev = p
                n += 1
            else:
                spans.append((d, start, prev + k - 1, prev + k - start, n))
                start = prev = p
                n = 1
        spans.append((d, start, prev + k - 1, prev + k - start, n))
    return sorted(spans)


def _mk_docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _rand_text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(20260815)
    shared = _rand_text(rng, 30)  # planted duplicate region (~180 chars)
    texts = {}
    for i in range(20):
        body = _rand_text(rng, 40)
        if i % 4 == 0:  # 5 docs embed the shared region at varied offsets
            cut = rng.randrange(5, 35)
            toks = body.split()
            body = " ".join(toks[:cut]) + " " + shared + " " + " ".join(toks[cut:])
        texts[i] = body
    return texts


def test_spans_match_bruteforce(spark, corpus):
    k = 40
    got = sorted(
        tuple(r)
        for r in substring_duplicate_spans(_mk_docs(spark, corpus), k=k).collect()
    )
    assert got == _ref_spans(corpus, k)
    # the planted region is found in every carrier doc
    carriers = {d for d, *_ in got}
    assert {0, 4, 8, 12, 16} <= carriers


def test_spans_hash_vs_plain_keys(spark, corpus):
    """use_hash=True (scale path, 2×xxhash64 keys) is row-identical to
    grouping the gram text itself."""
    a = sorted(
        map(
            tuple,
            substring_duplicate_spans(
                _mk_docs(spark, corpus), k=40, use_hash=True
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            substring_duplicate_spans(
                _mk_docs(spark, corpus), k=40, use_hash=False
            ).collect(),
        )
    )
    assert a == b


def test_dup_stats_interval_merge(spark):
    """Overlapping spans must not double-count: doc 1 repeats one phrase
    with a short unique gap (< k) between copies → two islands whose
    k−1-char tails overlap."""
    k = 20
    phrase = "x" * 25
    texts = {
        1: phrase + " qq " + phrase,  # gap 4 < k → overlapping spans
        2: phrase,  # second corpus occurrence
        3: "completely unique text with no duplicate region at all ok",
    }
    df = _mk_docs(spark, texts)
    stats = {r["doc_id"]: r for r in substring_dup_stats(df, k=k).collect()}
    assert set(stats) == {1, 2, 3}  # every doc reported
    assert stats[3]["dup_chars"] == 0 and stats[3]["dup_frac"] == 0.0
    # doc 2 is fully duplicated
    assert stats[2]["dup_chars"] == stats[2]["n_chars"]
    # doc 1: merged coverage ≤ n_chars (no double count) and covers both
    # copies of the phrase
    assert stats[1]["dup_chars"] <= stats[1]["n_chars"]
    assert stats[1]["dup_chars"] >= 2 * len(phrase)


def test_winnow_density_and_positions(spark, corpus):
    k, w = 40, 8
    df = _mk_docs(spark, corpus)
    fps = winnow_fingerprints(df, k=k, window=w).collect()
    per_doc = {}
    for r in fps:
        per_doc.setdefault(r["doc_id"], []).append(r["pos"])
    for d, t in corpus.items():
        n = len(_norm(t)) - k + 1
        if n < 1:
            continue
        sel = per_doc[d]
        assert all(1 <= p <= n for p in sel)
        # winnowing guarantees ≥ one selection per w-window → gap ≤ w
        ss = sorted(sel)
        assert all(b - a <= w for a, b in zip(ss, ss[1:]))
        # expected density ~2/(w+1); allow wide slack but require real
        # subsampling vs the n gram positions
        assert len(sel) < 0.6 * n


def test_winnow_detects_planted_duplicates(spark, corpus):
    """Any common substring of length ≥ k + w − 1 shares a selected
    fingerprint → every carrier of the ~180-char planted region must
    appear in the winnowed spans, at roughly the right offsets."""
    k, w = 40, 8
    got = winnow_duplicate_spans(_mk_docs(spark, corpus), k=k, window=w).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    exact = _ref_spans(corpus, k)
    for d, start, end, _, _ in exact:
        if end - start + 1 < k + w - 1:
            continue  # below the winnowing guarantee length
        spans = by_doc.get(d, [])
        # some winnowed span overlaps the true duplicated region
        assert any(
            s["span_start"] <= end and s["span_end"] >= start for s in spans
        ), (d, start, end, spans)


def test_winnow_misaligned_offsets(spark):
    """The guarantee must hold regardless of alignment: the same region
    planted at every offset-residue pair mod w."""
    k, w = 20, 4
    rng = random.Random(7)
    shared = _rand_text(rng, 12)
    assert len(shared) >= k + w - 1
    texts = {}
    for i in range(w):
        texts[i] = "u" * (3 + i) + " " + shared + " " + _rand_text(rng, 5)
    got = winnow_duplicate_spans(_mk_docs(spark, texts), k=k, window=w).collect()
    assert {r["doc_id"] for r in got} == set(range(w))


def test_winnow_unicode_char_positions(spark):
    """Fingerprint positions must be CHARACTER-indexed (UTF-32 pass), not
    UTF-8-byte-indexed: plant a duplicate after a multi-byte prefix and
    require the winnowed span to sit where the stride-1 exact span sits."""
    k, w = 20, 4
    shared = "duplicated region payload zz " * 3
    texts = {
        1: "καλημέρα κόσμε ñandú " + shared + " tail one",
        2: "prefix " + shared + " tail two",
    }
    df = _mk_docs(spark, texts)
    exact = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in substring_duplicate_spans(df, k=k).collect()
    }
    got = winnow_duplicate_spans(df, k=k, window=w).collect()
    by_doc = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in got}
    for d, (s, e) in exact.items():
        ws, we = by_doc[d]
        # winnowed span within the exact span, and overlapping most of it
        assert s <= ws <= e and s <= we <= e + w, (d, (s, e), (ws, we))
        assert we - ws >= (e - s) - (w + k), (d, (s, e), (ws, we))


def test_excise_keeps_exactly_one_occurrence(spark, corpus):
    """After excision exactly ONE copy of the planted duplicated region
    survives corpus-wide, untouched docs pass through unchanged, and
    removed_chars accounts the difference."""
    from dask_ssh_docker_spark.operators.substring import (
        substring_excise_duplicates,
    )

    k = 40
    out = {
        r["doc_id"]: r
        for r in substring_excise_duplicates(
            _mk_docs(spark, corpus), k=k
        ).collect()
    }
    assert set(out) == set(corpus)
    exact = _ref_spans(corpus, k)
    dup_docs = {d for d, *_ in exact}
    joined = " || ".join(out[d]["clean_text"] for d in sorted(out))
    # the ~180-char planted region: exactly one surviving copy
    shared_probe = None
    for d, s, e, *_ in exact:
        if e - s + 1 > 150:
            t = _norm(corpus[d])
            shared_probe = t[s - 1 : s - 1 + 100]
            break
    assert shared_probe is not None
    assert joined.count(shared_probe) == 1
    for d, t in corpus.items():
        norm = _norm(t)
        r = out[d]
        assert r["n_chars"] == len(norm)
        assert len(r["clean_text"]) == len(norm) - r["removed_chars"]
        if d not in dup_docs:
            assert r["clean_text"] == norm and r["removed_chars"] == 0


def test_winnow_string_ids(spark):
    """id column type passes through (schema is derived, not hardcoded)."""
    df = spark.createDataFrame(
        [("a", "shared payload text here okay " * 3),
         ("b", "shared payload text here okay " * 3)],
        "doc_id string, text string",
    )
    got = winnow_duplicate_spans(df, k=20, window=4).collect()
    assert {r["doc_id"] for r in got} == {"a", "b"}


def test_winnow_second_hash_independent(spark, corpus):
    # ADVICE r7: detection keys on a 2x64-bit (fp, fp2) pair like the
    # stride-1 path — at ~10^13 fingerprints single-64-bit collisions are
    # certain.  Pin that fp2 exists, is deterministic, and is NOT a
    # function collapse of fp (same fp stream under a bijective remix
    # would inherit every collision).
    df = _mk_docs(spark, corpus)
    rows = winnow_fingerprints(df, k=40, window=8).collect()
    assert rows and all(r["fp2"] is not None for r in rows)
    assert any(r["fp"] != r["fp2"] for r in rows)
    # deterministic across runs
    again = winnow_fingerprints(df, k=40, window=8).collect()
    assert sorted((r["doc_id"], r["pos"], r["fp"], r["fp2"]) for r in rows) == sorted(
        (r["doc_id"], r["pos"], r["fp"], r["fp2"]) for r in again
    )
    # identical grams agree on BOTH hashes (detection soundness): dup
    # positions found by the pair key must equal those found by fp alone
    # on this clean corpus
    from collections import Counter

    c1 = Counter(r["fp"] for r in rows)
    c2 = Counter((r["fp"], r["fp2"]) for r in rows)
    assert sum(v for v in c1.values() if v >= 2) == sum(
        v for v in c2.values() if v >= 2
    )


def test_winnow_prefix_hash_matches_windowed_dot(spark):
    """r13: the fingerprint pass computes the polynomial hash in O(n) via
    the prefix-product form h[i] = P^(k-1+i)·(A[i+k-1] − A[i−1]) mod 2⁶⁴
    (P odd ⇒ invertible).  Pin BOTH raw hash values (fp, fp2) against the
    definitional O(n·k) windowed-dot evaluation on a unicode doc — any
    algebra slip shifts every downstream selection."""
    import numpy as np

    k, w = 11, 4
    rng = random.Random(13)
    text = "".join(
        rng.choice("abcdefgh äöü語 xyz ") for _ in range(400)
    )
    df = _mk_docs(spark, {1: text})
    got = {
        r["pos"]: (r["fp"], r["fp2"])
        for r in winnow_fingerprints(df, k=k, window=w).collect()
    }

    t = _norm(text)
    b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    n = len(b) - k + 1
    P, P2, mod = 1099511628211, 0x100000001B3 ^ 0xA5A5A5A5A5A5A5A4, 1 << 64
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    ref = []
    for prime, mix in ((P, 0xFF51AFD7ED558CCD), (P2, 0xC4CEB9FE1A85EC53)):
        pw, plist = 1, [0] * k
        for j in range(k - 1, -1, -1):
            plist[j] = pw
            pw = (pw * prime) % mod
        hh = (win * np.array(plist, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        hh ^= hh >> np.uint64(33)
        hh = hh * np.uint64(mix)
        hh ^= hh >> np.uint64(33)
        ref.append(hh)
    h, h2 = ref
    # robust-winnow reference selection over the definitional hashes —
    # on the UNSIGNED values (selection order is uint64, like the
    # operator; int64 reinterpretation happens only at output)
    if n <= w:
        idx = [int(n - 1 - h[::-1].argmin())]
    else:
        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        rel = w - 1 - sw[:, ::-1].argmin(axis=1)
        idx = sorted(set((rel + np.arange(len(sw))).tolist()))
    assert got == {
        int(i + 1): (int(h.astype(np.int64)[i]), int(h2.astype(np.int64)[i]))
        for i in idx
    }
