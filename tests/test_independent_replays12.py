"""Independent-model replays, batch 12 (round 11): the text-curation
cluster (quality, langid, tokens, fingerprints, TF-IDF, bigrams, PII
redaction, exact dedup, shard stats) replayed with Python's own
hashlib/re/str machinery — the impl and DuckDB oracle both derive
these from my formulas, so the stdlib third engine is what actually
pins them."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL6 = 6e-7
TOL4 = 6e-5


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_dedup_exact_md5_groups_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["dedup_exact"](spark, SF).collect()
    d = _docs()
    groups: dict = defaultdict(list)
    for i, t in zip(d.doc_id, d.text):
        groups[_md5(t)].append(int(i))
    want = sorted(
        ((h, min(ids), len(ids)) for h, ids in groups.items()),
        key=lambda x: x[1],
    )
    assert [(r.content_hash, r.keeper_id, r.n_copies) for r in rows] == want


def test_doc_fingerprint_shingle_md5_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["doc_fingerprint"](spark, SF).collect()
    d = _docs()
    want = {}
    for i, t in zip(d.doc_id, d.text):
        ws = t.split(" ")
        grams = sorted(
            {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}
        ) if len(ws) >= 3 else []
        want[int(i)] = _md5("|".join(grams))
    assert {r.doc_id: r.fingerprint for r in rows} == want


def test_token_count_stdlib_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["token_count"](spark, SF).collect()
    d = _docs()
    want = {
        int(i): (len(t.split(" ")), len(re.findall(r"[a-z0-9]+", t)))
        for i, t in zip(d.doc_id, d.text)
    }
    assert {r.doc_id: (r.ws_tokens, r.re_tokens) for r in rows} == want


def test_text_quality_formula_replay(spark):
    from hdsp_hive_release_src_spark.functions.text import LANG_STOPWORDS

    registry.load_all()
    rows = registry.QUERIES["text_quality"](spark, SF).collect()
    en = set(LANG_STOPWORDS["en"])
    d = _docs()
    docs = {int(i): t for i, t in zip(d.doc_id, d.text)}
    for r in rows:
        t = docs[r.doc_id]
        ws = t.split(" ")
        n = len(ws)
        dr = len(set(ws)) / n
        sr = sum(1 for w in ws if w in en) / n
        score = 0.4 * dr + 0.3 * min(n / 100, 1.0) + 0.3 * (1 - sr)
        assert r.n_tokens == n and r.n_chars == len(t)
        assert abs(r.distinct_ratio - dr) <= TOL6
        assert abs(r.stopword_ratio - sr) <= TOL6
        assert abs(r.quality_score - score) <= TOL6


def test_text_langid_argmax_replay(spark):
    from hdsp_hive_release_src_spark.functions.text import LANG_STOPWORDS

    registry.load_all()
    rows = registry.QUERIES["text_langid"](spark, SF).collect()
    d = _docs()
    docs = {int(i): t for i, t in zip(d.doc_id, d.text)}
    sets = {lang: set(ws) for lang, ws in LANG_STOPWORDS.items()}
    for r in rows:
        ws = docs[r.doc_id].split(" ")
        hits = {
            lang: sum(1 for w in ws if w in s)
            for lang, s in sets.items()
        }
        best = max(hits.values())
        if best == 0:
            pred = "und"
        else:
            # priority-ordered tie-break: first lang in dict order
            pred = next(
                lang for lang in LANG_STOPWORDS if hits[lang] == best
            )
        assert r.lang_pred == pred, r.doc_id


def test_pii_redact_stdlib_re_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["pii_redact"](spark, SF).collect()
    d = _docs()
    email = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone = r"\+1-555-[0-9]{4}"
    docs = {int(i): t for i, t in zip(d.doc_id, d.text) if i < 300}
    assert len(rows) == len(docs)
    for r in rows:
        raw = (
            docs[r.doc_id][:40]
            + f" contact user{r.doc_id}@example.com or "
            + f"+1-555-{r.doc_id % 10000:04d}"
        )
        red = re.sub(phone, "<PHONE>", re.sub(email, "<EMAIL>", raw))
        assert r.redacted == red
        assert r.n_emails == len(re.findall(email, raw))
        assert r.n_phones == len(re.findall(phone, raw))


def test_tfidf_top_terms_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["tfidf_top_terms"](spark, SF).collect()
    d = _docs()
    tf: dict = defaultdict(int)
    df: dict = defaultdict(set)
    for i, t in zip(d.doc_id, d.text):
        for w in t.split(" "):
            tf[w] += 1
            df[w].add(int(i))
    n_docs = len(d)

    def r4(x: float) -> float:  # HALF_UP like both engines' round()
        return math.floor(x * 10_000 + 0.5) / 10_000

    scored = sorted(
        (
            (r4(tf[w] * math.log(n_docs / len(df[w]))), w)
            for w in tf
        ),
        key=lambda sw: (-sw[0], sw[1]),
    )[:20]
    assert [(r.tfidf_sum, r.term) for r in rows] == scored
    for r in rows:
        assert (r.total_tf, r.doc_freq) == (tf[r.term], len(df[r.term]))


def test_bigram_top30_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["ngram_counts"](spark, SF).collect()
    counts: dict = defaultdict(int)
    for t in _docs().text:
        ws = t.split(" ")
        for j in range(len(ws) - 1):
            counts[ws[j] + " " + ws[j + 1]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert [(r.bigram, r.n) for r in rows] == want


def test_length_shard_stats_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["length_shard_stats"](spark, SF).collect()
    cells: dict = defaultdict(list)
    for i, t in zip(_docs().doc_id, _docs().text):
        n = len(t.split(" "))
        cells[(n // 16, int(i) % 8)].append(n)
    assert {(r.len_bucket, r.shard) for r in rows} == set(cells)
    for r in rows:
        ns = cells[(r.len_bucket, r.shard)]
        assert r.n_docs == len(ns)
        assert abs(r.avg_tokens - sum(ns) / len(ns)) <= TOL4


def test_stratified_sample_systematic_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stratified_sample"](spark, SF).collect()
    d = _docs()
    for r in rows:
        g = d[d.lang == r.lang]
        n_s = int((g.doc_id % 10 < 2).sum())
        assert (r.n_total, r.n_sampled) == (len(g), n_s)
        assert abs(r.rate - n_s / len(g)) <= TOL4


def test_multimodal_meta_bytesum_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["multimodal_meta"](spark, SF).collect()
    d = _docs()
    docs = {int(i): t.encode() for i, t in zip(d.doc_id, d.text)}
    for r in rows:
        b = docs[r.doc_id]
        assert r.mime == "text/plain"
        assert r.n_bytes == len(b)
        assert r.feat_sum == sum(b)
