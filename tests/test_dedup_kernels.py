"""Tier-1 kernel tests, ported from the reference's pure-unit suite
(/root/reference/tests/utils/maintenance/test_node_operations.py:198-297)
— these pin the dedup semantics the P/R metric depends on."""

from graphiti_spark import kernels as K


def test_normalize_exact():
    assert K.normalize_exact("  Alice   Smith ") == "alice smith"
    assert K.normalize_exact("ACME\tCorp\n") == "acme corp"


def test_normalize_fuzzy():
    assert K.normalize_fuzzy("Alice-Smith!") == "alice smith"
    assert K.normalize_fuzzy("O'Brien & Associates") == "o'brien associates"


def test_shingles_alice():
    # ref test_node_operations.py:225-230
    assert K.shingles("alice") == {"ali", "lic", "ice"}
    assert K.shingles("a") == {"a"}
    assert K.shingles("") == set()
    assert K.shingles("ab") == set()  # len==2 -> range(0): ref behavior
    assert K.shingles("alice smith") == K.shingles("alicesmith")


def test_minhash_signature_shape():
    # ref test_node_operations.py:233-241
    sig = K.minhash_signature(K.shingles("alice smith"))
    assert len(sig) == 32
    bands = K.lsh_bands(sig)
    assert len(bands) == 8
    assert all(len(b) == 4 for b in bands)
    assert K.minhash_signature(set()) == ()
    assert K.lsh_bands(()) == []


def test_minhash_deterministic_and_discriminative():
    a = K.minhash_signature(K.shingles("alice smith"))
    b = K.minhash_signature(K.shingles("alice smith"))
    c = K.minhash_signature(K.shingles("zebra quilt"))
    assert a == b
    assert a != c


def test_hash_shingle_is_blake2b64():
    # exact value pin: blake2b('0:abc', digest_size=8) big-endian
    from hashlib import blake2b

    expected = int.from_bytes(blake2b(b"0:abc", digest_size=8).digest(), "big")
    assert K.hash_shingle("abc", 0) == expected


def test_jaccard_edge_cases():
    # ref test_node_operations.py:243-249
    assert K.jaccard({"a", "b"}, {"a", "c"}) == 1 / 3
    assert K.jaccard(set(), set()) == 1.0
    assert K.jaccard({"a"}, set()) == 0.0
    assert K.jaccard(set(), {"a"}) == 0.0
    assert K.jaccard({"x"}, {"x"}) == 1.0


def test_entropy_gates():
    # ref test_node_operations.py:215-223
    assert K.name_entropy("alice") > K.name_entropy("aaaaa")
    assert K.name_entropy("") == 0.0
    assert K.has_high_entropy("meaningful name") is True
    assert K.has_high_entropy("aa") is False
    assert K.has_high_entropy("aa aa") is False  # 2 tokens but zero entropy
    assert K.has_high_entropy("ab") is False  # short AND single token


def test_band_keys_match_fuzzy_variants():
    # punctuation variants share every band; true near-miss shares few
    assert K.band_keys("Umbrella-Labs") == K.band_keys("Umbrella Labs")
    assert K.band_keys("Johnson & Sons Company") == K.band_keys("Johnson Sons Company")
    assert K.band_keys("Bob Dylan") != K.band_keys("Bob Dyllan")


def test_fuzzy_threshold_semantics():
    a = K.shingles(K.normalize_fuzzy("Bob Dylan"))
    b = K.shingles(K.normalize_fuzzy("Bob Dyllan"))
    assert K.jaccard(a, b) < K.JACCARD_THRESHOLD  # must NOT merge
    c = K.shingles(K.normalize_fuzzy("Acme-Corp"))
    d = K.shingles(K.normalize_fuzzy("Acme Corp"))
    assert K.jaccard(c, d) == 1.0  # must merge


def test_directed_uuid_map_chain():
    # ref test_bulk_utils.py:190-233 — chain collapse, direction preserved
    m = K.directed_uuid_map([("a", "b"), ("b", "c")])
    assert m == {"a": "c", "b": "c", "c": "c"}
    # direction preserved even when alias sorts before canonical
    m2 = K.directed_uuid_map([("z", "a")])
    assert m2 == {"z": "a", "a": "a"}


def test_min_uuid_map():
    m = K.min_uuid_map([("b", "c"), ("c", "d"), ("x", "y")])
    assert m == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_lucene_sanitize_ported():
    # values ported from reference tests/helpers_test.py:177-189
    from graphiti_spark.kernels import lucene_sanitize

    assert (
        lucene_sanitize('This has every escape character + - && || ! ( ) { } [ ] ^ " ~ * ? : \\ /')
        == '\\This has every escape character \\+ \\- \\&\\& \\|\\| \\! \\( \\) \\{ \\} \\[ \\] \\^ \\" \\~ \\* \\? \\: \\\\ \\/'
    )
    assert lucene_sanitize('this has no escape characters') == 'this has no escape characters'
