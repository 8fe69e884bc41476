"""Independent-model replays, batch 32 (round 11): the n-gram /
near-dup analytics built on the shared shingle index — PMI
collocations, trigram novelty, the Jaccard threshold sweep, and the
minhash-accuracy gate's exact-pair ground truth — all recomputed from
plain Counter/set structures."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL4 = 6e-5
TOL6 = 6e-7


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _shingles(t: str) -> set:
    ws = t.split(" ")
    return {
        " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
    } if len(ws) >= 3 else set()


def _pair_jaccard() -> dict:
    d = _docs()
    sets = {int(i): _shingles(t) for i, t in zip(d.doc_id, d.text)}
    posting: dict = defaultdict(list)
    for i, s in sets.items():
        for g in s:
            posting[g].append(i)
    inter: dict = defaultdict(int)
    for ids in posting.values():
        ids.sort()
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                inter[(ids[a], ids[b])] += 1
    return {
        k: n / (len(sets[k[0]]) + len(sets[k[1]]) - n)
        for k, n in inter.items()
    }


def test_pmi_collocations_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["phrase_mining_pmi"](spark, SF).collect()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in _docs().text:
        ws = [w for w in t.split(" ") if w]
        uni.update(ws)
        bi.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    un, bn = sum(uni.values()), sum(bi.values())

    def r4(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)

    scored = []
    for b, c in bi.items():
        if c >= 5:
            w1, w2 = b.split(" ")
            pmi = math.log(
                (c / bn) / ((uni[w1] / un) * (uni[w2] / un))
            )
            scored.append((r4(pmi), b, c))
    want = sorted(scored, key=lambda t: (-t[0], t[1]))[:25]
    assert [
        (r.pmi, r.bigram, r.n_occurrences) for r in rows
    ] == want


def test_trigram_novelty_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["ngram_novelty_score"](spark, SF).collect()
    d = _docs()
    sets = {int(i): _shingles(t) for i, t in zip(d.doc_id, d.text)}
    df: Counter = Counter()
    for s in sets.values():
        df.update(s)
    got = {r.doc_id: (r.n_shingles, r.novelty) for r in rows}
    assert set(got) == {i for i, s in sets.items() if s}
    for i, s in sets.items():
        if not s:
            continue
        uniq = sum(1 for g in s if df[g] == 1)
        n, nov = got[i]
        assert n == len(s)
        assert abs(nov - uniq / len(s)) <= TOL6


def test_jaccard_threshold_sweep_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["dedup_threshold_sweep"](spark, SF).collect()
    jac = list(_pair_jaccard().values())
    want = [
        (b / 10, sum(1 for j in jac if j >= b / 10))
        for b in range(1, 10)
    ]
    assert [
        (r.threshold, r.n_pairs_at_or_above) for r in rows
    ] == want


def test_minhash_accuracy_ground_truth_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["minhash_estimate_accuracy"](spark, SF).collect()
    jac = _pair_jaccard()
    want = sorted(
        (a, b, j) for (a, b), j in jac.items() if j >= 0.5
    )
    assert [(r.d1, r.d2) for r in rows] == [(a, b) for a, b, _ in want]
    for r, (_, _, j) in zip(rows, want):
        assert abs(r.jaccard - j) <= TOL6
        assert r.est_within_band  # the 64-slot signature contract
