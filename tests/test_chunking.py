"""chunk_sequences vs a plain-Python replay.

The operator is pure integer arithmetic + md5, so an independent Python
replay must agree bit-for-bit on every row (the same contract its DuckDB
oracle checks at the driver gate)."""

from __future__ import annotations

import hashlib

from graphiti_spark import dataops

DOCS = [
    (1, " ".join(f"w{i}" for i in range(150))),   # 3 chunks at 64/48
    (2, " ".join(f"w{i}" for i in range(64))),    # exactly one full chunk
    (3, " ".join(f"w{i}" for i in range(65))),    # 64 + tail of 17
    (4, "one two three"),                         # single short chunk
    (5, ""),                                      # no tokens -> no rows
    (6, "solo"),
    (7, "  spaced   out\ttokens \n here  "),      # ragged whitespace
]


def _replay(text: str, max_len: int, stride: int):
    toks = [t for t in text.split() if t]
    n = len(toks)
    if n == 0:
        return []
    n_extra = (max(n - max_len, 0) + stride - 1) // stride
    out = []
    for i in range(n_extra + 1):
        start = i * stride + 1
        n_toks = min(max_len, n - start + 1)
        window = " ".join(toks[start - 1 : start - 1 + n_toks])
        out.append(
            (i, start, n_toks, hashlib.md5(window.encode()).hexdigest())
        )
    return out


def test_chunk_sequences_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.doc_id, r.chunk_idx): (r.start_tok, r.n_toks, r.chunk_md5)
        for r in dataops.chunk_sequences(df, max_len=64, stride=48).collect()
    }
    want = {}
    for doc_id, text in DOCS:
        for i, start, n_toks, md5 in _replay(text, 64, 48):
            want[(doc_id, i)] = (start, n_toks, md5)
    assert got == want
    # every token of doc 1 is covered and no chunk starts past the end
    starts = sorted(s for (d, _), (s, _, _) in got.items() if d == 1)
    assert starts == [1, 49, 97]
    assert got[(1, 2)][1] == 150 - 97 + 1


def test_chunk_sequences_disjoint_blocks(spark):
    df = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    rows = sorted(
        dataops.chunk_sequences(df, max_len=50, stride=50).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride == max_len: disjoint cover of 150 tokens
    assert [(r.start_tok, r.n_toks) for r in rows] == [(1, 50), (51, 50), (101, 50)]


def test_chunk_sequences_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    try:
        dataops.chunk_sequences(df, max_len=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_chunk_sequences_rejects_gapped_stride(spark):
    # stride > max_len would leave tokens uncovered and compute a negative
    # slice length on the final window — must be rejected up front.
    df = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    try:
        dataops.chunk_sequences(df, max_len=5, stride=8)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "stride" in str(e)
