"""Independent-model replays, batch 39 (round 12): the remaining
shared-formula queries from the replay-complement audit — the exact
Jaccard/SimHash/semantic dedup family (whose impl AND oracle share the
same index/blocking construction), n-gram counting, the Lorenz
deciles, haversine hub assignment, and the basket pair core. All
expected outputs are rebuilt in pure Python/dicts from raw parquet."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _r(x: float, nd: int) -> float:
    return float(
        Decimal(x).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP)
    )


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_jaccard_pairs_match_dict_inverted_index(spark):
    """Full-output replay of the flagship near-dup query: df-capped
    inverted shingle index rebuilt in dicts, Jaccard from raw set
    sizes."""
    from tests.test_independent_replays38 import _capped_pair_counts

    registry.load_all()
    rows = registry.QUERIES["dedup_ngram_jaccard"](spark, SF).collect()
    inter, sizes = _capped_pair_counts()
    want = []
    for (a, b), n in sorted(inter.items()):
        j = n / (sizes[a] + sizes[b] - n)
        if j >= 0.5:
            want.append((a, b, _r(j, 6)))
    assert [(r.d1, r.d2, r.jaccard) for r in rows] == want


def test_simhash_pairs_match_python_signatures(spark):
    """Hash-for-hash SimHash replay: md5-nibble bit votes, signed
    64-bit signature, 4x16 band buckets, popcount hamming."""
    registry.load_all()
    rows = registry.QUERIES["dedup_simhash"](spark, SF).collect()
    d = _tbl("documents")
    hexd = "0123456789abcdef"
    sig = {}
    for doc_id, text in zip(d.doc_id, d.text):
        votes = [0] * 64
        for t in text.split(" "):
            if not t:
                continue
            h = hashlib.md5(t.encode()).hexdigest()
            nib = [hexd.index(c) for c in h[:16]]
            for i in range(64):
                votes[i] += 1 if (nib[i // 4] >> (i % 4)) & 1 else -1
        s = 0
        for i in range(64):
            if votes[i] > 0:
                s += 1 << i
        sig[int(doc_id)] = s  # unsigned form; bands mask 16 bits
    buckets: dict[tuple, list[int]] = {}
    for doc, s in sig.items():
        for j in range(4):
            buckets.setdefault((j, (s >> (16 * j)) & 0xFFFF), []).append(
                doc
            )
    pairs = set()
    for docs in buckets.values():
        docs.sort()
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                pairs.add((a, b))
    want = sorted(
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for a, b in pairs
        if bin(sig[a] ^ sig[b]).count("1") <= 8
    )
    assert [(r.d1, r.d2, r.hamming) for r in rows] == want


def test_semantic_dedup_matches_python_blocking(spark):
    """SemDeDup replay: exact-dup collapse, every-25th codebook,
    2-probe cell assignment, within-cell cosine, member expansion —
    rebuilt in pure Python with the impl's left-fold arithmetic."""
    registry.load_all()
    rows = registry.QUERIES["semantic_dedup"](spark, SF).collect()
    e = _tbl("embeddings")
    vecs = {
        int(i): tuple(float(x) for x in v)
        for i, v in zip(e.vec_id, e.embedding)
    }
    groups: dict[tuple, list[int]] = {}
    for vid, v in vecs.items():
        groups.setdefault(v, []).append(vid)
    members = {min(ids): sorted(ids) for ids in groups.values()}
    reps = {r: vecs[r] for r in members}
    nrm = {r: math.sqrt(_fold_dot(v, v)) for r, v in reps.items()}
    cents = {r: (reps[r], nrm[r]) for r in reps if r % 25 == 0}
    cells: dict[int, list[int]] = {}
    for r, v in reps.items():
        sims = sorted(
            (
                (-_r(_fold_dot(v, cv) / (nrm[r] * cn), 6), cid)
                for cid, (cv, cn) in cents.items()
            )
        )[:2]
        for _, cid in sims:
            cells.setdefault(cid, []).append(r)
    rep_pairs = {}
    for rs in cells.values():
        rs.sort()
        for i, a in enumerate(rs):
            for b in rs[i + 1 :]:
                if (a, b) in rep_pairs:
                    continue
                cos = _r(
                    _fold_dot(reps[a], reps[b]) / (nrm[a] * nrm[b]), 6
                )
                if cos >= 0.45:
                    rep_pairs[(a, b)] = cos
    want = []
    for (a, b), cos in rep_pairs.items():
        for m1 in members[a]:
            for m2 in members[b]:
                want.append((min(m1, m2), max(m1, m2), cos))
    for r, ids in members.items():
        if len(ids) > 1:
            cos = _r(
                _fold_dot(reps[r], reps[r]) / (nrm[r] * nrm[r]), 6
            )
            for i, m1 in enumerate(ids):
                for m2 in ids[i + 1 :]:
                    want.append((m1, m2, cos))
    want.sort()
    assert [(r.v1, r.v2, r.cos) for r in rows] == want


def test_decontaminate_matches_dict_8grams(spark):
    registry.load_all()
    rows = registry.QUERIES["decontaminate_ngrams"](spark, SF).collect()
    d = _tbl("documents")

    def g8(text):
        ws = text.split(" ")
        if len(ws) < 8:
            return set()
        return {" ".join(ws[i : i + 8]) for i in range(len(ws) - 7)}

    eval_g = set()
    for src, text in zip(d.source, d.text):
        if src == "src0":
            eval_g |= g8(text)
    agg: dict[str, list[int]] = {}
    for src, text in zip(d.source, d.text):
        if src == "src0":
            continue
        cur = agg.setdefault(src, [0, 0])
        cur[0] += 1
        cur[1] += bool(g8(text) & eval_g)
    want = [
        (src, n, hit, _r(hit / n, 4)) for src, (n, hit) in sorted(agg.items())
    ]
    got = [
        (r.source, r.n_docs, r.n_contaminated, r.contamination_rate)
        for r in rows
    ]
    assert got == want


def test_context_ngrams_match_dict_bigrams(spark):
    registry.load_all()
    rows = registry.QUERIES["context_ngrams_top"](spark, SF).collect()
    d = _tbl("documents")
    cnt: Counter = Counter()
    for text in d.text:
        ws = [t for t in text.split(" ") if t]
        for w1, w2 in zip(ws, ws[1:]):
            if w1 == "join":
                cnt[w2] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    want = [(w, n, i + 1) for i, (w, n) in enumerate(top)]
    assert [(r.next_token, r.n, r.rank) for r in rows] == want


def test_token_buckets_match_python_ladder(spark):
    registry.load_all()
    rows = registry.QUERIES["token_bucket_histogram"](
        spark, SF
    ).collect()
    d = _tbl("documents")
    ladder = (16, 32, 64, 128, 256, 512, 1024)
    agg: dict[int, list[int]] = {}
    for text in d.text:
        n = len([t for t in text.split(" ") if t])
        b = next((x for x in ladder if n <= x), 2 * ladder[-1])
        cur = agg.setdefault(b, [0, 0])
        cur[0] += 1
        cur[1] += n
    want = {
        b: (nd, st, st * 1000 // (nd * b))
        for b, (nd, st) in agg.items()
    }
    got = {
        r.bucket: (r.n_docs, r.sum_tokens, r.fill_permille) for r in rows
    }
    assert got == want


def test_bpe_pairs_match_dict_counts(spark):
    registry.load_all()
    rows = registry.QUERIES["bpe_merge_pair_counts"](spark, SF).collect()
    d = _tbl("documents")
    cnt: Counter = Counter()
    for text in d.text:
        for t in text.split(" "):
            if len(t) >= 2:
                t = t.lower()
                for i in range(len(t) - 1):
                    cnt[t[i : i + 2]] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    want = [(i + 1, p, n) for i, (p, n) in enumerate(top)]
    assert [(r.rnk, r.pair, r.cnt) for r in rows] == want


def test_lorenz_deciles_match_python_cumshare(spark):
    registry.load_all()
    rows = registry.QUERIES["lorenz_curve_deciles"](spark, SF).collect()
    o = _tbl("orders")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    spend = sorted(
        o.groupby("o_custkey").cents.sum().items(),
        key=lambda kv: (kv[1], kv[0]),
    )
    nc = len(spend)
    tot = sum(c for _, c in spend)
    agg: dict[int, list[int]] = {}
    for rn, (_, cents) in enumerate(spend, 1):
        dec = (rn - 1) * 10 // nc
        cur = agg.setdefault(dec, [0, 0])
        cur[0] += 1
        cur[1] += int(cents)
    cum = 0
    want = []
    for dec in sorted(agg):
        n, c = agg[dec]
        cum += c
        want.append((dec, n, c, cum * 1000 // tot))
    got = [
        (r.decile, r.n_customers, r.decile_cents, r.cum_share_permille)
        for r in rows
    ]
    assert got == want


def test_nearest_hub_matches_python_haversine(spark):
    """Independent great-circle model: the textbook haversine via
    math.atan2 (the impl/oracle share an asin(sqrt(...)) form)."""
    registry.load_all()
    rows = registry.QUERIES["nearest_hub_assignment"](
        spark, SF
    ).collect()
    c = _tbl("customer")
    hubs = (
        ("hub_eu", 50.0, 10.0),
        ("hub_us", 40.0, -100.0),
        ("hub_apac", 10.0, 110.0),
        ("hub_sa", -20.0, -60.0),
    )

    def hav(lat1, lon1, lat2, lon2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = p2 - p1, math.radians(lon2 - lon1)
        a = (
            math.sin(dp / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * 6371.0 * math.atan2(math.sqrt(a), math.sqrt(1 - a))

    agg: dict[str, list] = {}
    for k in c.c_custkey:
        k = int(k)
        lat = (k % 120) - 60.0 + 0.25
        lon = ((k * 7) % 360) - 180.0 + 0.25
        best = min(
            (round(hav(lat, lon, hl, ho), 6), name, hav(lat, lon, hl, ho))
            for name, hl, ho in hubs
        )
        cur = agg.setdefault(best[1], [])
        cur.append(best[2])
    want = {
        h: (len(ds), _r(min(ds), 3), _r(max(ds), 3))
        for h, ds in agg.items()
    }
    got = {
        r.hub: (r.n_assigned, r.nearest_km, r.farthest_km) for r in rows
    }
    assert set(got) == set(want)
    for h in want:
        assert got[h][0] == want[h][0], h
        assert abs(got[h][1] - want[h][1]) <= 2e-3, h
        assert abs(got[h][2] - want[h][2]) <= 2e-3, h


def test_item_cooccurrence_matches_dict_baskets(spark):
    import json

    registry.load_all()
    rows = registry.QUERIES["item_cooccurrence_support"](
        spark, SF
    ).collect()
    e = _tbl("events")
    baskets: dict[int, set] = {}
    for uid, et, props in zip(e.user_id, e.event_type, e.props):
        if et == "purchase":
            item = json.loads(props).get("k")
            if item is not None:
                baskets.setdefault(int(uid), set()).add(int(item))
    support: Counter = Counter()
    for items in baskets.values():
        if 2 <= len(items) <= 200:
            s = sorted(items)
            for i, a in enumerate(s):
                for b in s[i + 1 :]:
                    support[(a, b)] += 1
    want = sorted(
        (a, b, n) for (a, b), n in support.items() if n >= 5
    )
    assert [(r.i1, r.i2, r.support) for r in rows] == want
