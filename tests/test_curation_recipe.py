"""curate_corpus: the one-call curation cascade vs a plain-Python replay.

Covers the stages the driver corpus cannot: exact-duplicate
canonicalization (sf documents have no dup texts) and the interaction of
gates (a duplicate whose canonical FAILED a gate must elect the best
passing copy instead)."""

from __future__ import annotations

import hashlib

from graphiti_spark import dataops

EN = "the cat is in the house and a dog was out for a walk in the park"
DOCS = [
    # host A: three long english docs + one exact dup of doc 1
    (1, "hA", EN + " alpha beta gamma delta"),
    (2, "hA", EN + " epsilon zeta eta theta iota kappa"),
    (3, "hA", EN + " alpha beta gamma delta"),        # dup of 1 -> 1 wins
    (4, "hA", EN),
    # host B: non-english (no stopwords) fails the lang gate
    (5, "hB", "uno dos tres cuatro cinco seis siete ocho nueve diez"),
    # host B: repetitive text fails the quality gate (low distinct ratio)
    (6, "hB", "the the the the the the the the the the the the"),
    # host B: a dup pair whose lower id FAILS the lang gate -> 8 is canonical
    (7, "hB", "uno dos tres"),
    (8, "hB", EN + " unique tail eight"),
    (9, "hB", EN + " unique tail eight longer still"),
    (10, "hB", ""),
]


def _toks(t):
    return [x for x in t.split() if x]


def _replay(per_host=2, min_tokens=5, min_uniq=300_000):
    stopw = set(dataops.EN_STOPWORDS)
    rows = {}
    for did, host, text in DOCS:
        tk = _toks(text)
        n = len(tk)
        ratio = (sum(1 for t in tk if t.lower() in stopw) / n) if n else 0.0
        uniq = round(len(set(tk)) * 1_000_000 / n) if n else 0
        rows[did] = {
            "host": host,
            "fp": hashlib.md5(text.encode()).hexdigest(),
            "ord": len(text),
            "lang_ok": ratio >= dataops.LANG_ID_THRESHOLD,
            "quality_ok": n >= min_tokens and uniq >= min_uniq,
        }
    by_fp = {}
    for did, r in rows.items():
        if r["lang_ok"] and r["quality_ok"]:
            by_fp.setdefault(r["fp"], []).append(did)
    for did, r in rows.items():
        r["is_canonical"] = (
            r["lang_ok"]
            and r["quality_ok"]
            and did == min(by_fp.get(r["fp"], [did]))
        )
    for host in {r["host"] for r in rows.values()}:
        canon = sorted(
            (d for d, r in rows.items() if r["host"] == host and r["is_canonical"]),
            key=lambda d: (-rows[d]["ord"], d),
        )
        for rank, d in enumerate(canon, 1):
            rows[d]["host_rank"] = rank
    for did, r in rows.items():
        r.setdefault("host_rank", None)
        r["keep"] = bool(r["is_canonical"] and r["host_rank"] <= per_host)
        if not r["is_canonical"]:
            r["host_rank"] = None
    return rows


def test_curate_corpus_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "source", "text"])
    got = {
        r.doc_id: r.asDict()
        for r in dataops.curate_corpus(
            df, per_host=2, min_tokens=5, min_uniq_ratio_x1e6=300_000
        ).collect()
    }
    want = _replay(per_host=2, min_tokens=5, min_uniq=300_000)
    assert set(got) == set(want)
    for did, w in want.items():
        g = got[did]
        for k in ("lang_ok", "quality_ok", "is_canonical", "host_rank", "keep"):
            assert g[k] == w[k], (did, k, g[k], w[k])
        if w["keep"]:
            assert g["split"] in ("train", "val", "test")
        else:
            assert g["split"] is None
    # the specific cascade facts this fixture encodes:
    assert not got[3]["is_canonical"] and got[1]["is_canonical"]  # dup loses
    assert not got[5]["lang_ok"]                                  # lang gate
    assert not got[6]["quality_ok"]                               # quality gate
    assert got[8]["is_canonical"]          # canonical elected among passers
    # host cap binds: host A has 3 canonical docs, per_host=2 drops one
    a_kept = [d for d, g in got.items() if g["host"] == "hA" and g["keep"]]
    assert len(a_kept) == 2


def test_curate_corpus_split_is_hash_split(spark):
    """Kept docs' split must equal hash_split's assignment (same buckets)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "source", "text"])
    cur = {
        r.doc_id: r.split
        for r in dataops.curate_corpus(df, per_host=10).collect()
        if r.keep
    }
    hs = {
        r.id: r.split
        for r in dataops.hash_split(
            df, {"train": 0.9, "val": 0.05, "test": 0.05}
        ).collect()
    }
    assert cur and all(hs[d] == s for d, s in cur.items())
