"""The dedup_minhash_lsh / dedup_simhash driver oracles recompute the doc
kernels in DuckDB SQL; that only works if the Python base hash equals
DuckDB's md5_number_lower and the HUGEINT-emulated mod-2^64 multiply equals
numpy uint64 arithmetic. Pin both contracts (no Spark needed)."""

from hashlib import md5

import duckdb
import numpy as np
import pytest


@pytest.mark.parametrize("s", ["alice", "a b c", "", "straße", "東京 tower"])
def test_md5_number_lower_matches_python(s):
    got = duckdb.sql("SELECT md5_number_lower(?)", params=[s]).fetchone()[0]
    assert got == int.from_bytes(md5(s.encode()).digest()[8:], "little")


def test_hugeint_mul64_matches_numpy():
    mult = 0xBF58476D1CE4E5B9
    gold = 0x9E3779B97F4A7C15
    rng = np.random.RandomState(5)
    old = np.seterr(over="ignore")
    try:
        for base in rng.randint(0, 1 << 63, size=8).astype(np.uint64):
            for p in (1, 31, 64):
                mask = np.uint64((gold * p) % (1 << 64))
                expect = int((base ^ mask) * np.uint64(mult))
                q = f"""
                SELECT ((((x >> 32) * {mult}) % 4294967296) * 4294967296
                        + (x & 4294967295) * {mult}) % 18446744073709551616 AS v
                FROM (SELECT xor({int(base)}::UBIGINT, {int(mask)}::UBIGINT)::HUGEINT AS x)
                """
                assert duckdb.sql(q).fetchone()[0] == expect
    finally:
        np.seterr(**old)
