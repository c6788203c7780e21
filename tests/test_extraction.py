"""Extraction-kernel tests: html->text byte identity, mention/triple
contracts (ref prompts/extract_nodes.py:25-34, prompts/extract_edges.py:25-41,
DATETIME RULES :118-125), and the deterministic embedder."""

from datetime import datetime, timezone

from graphiti_spark import extraction as X
from graphiti_spark.datagen import generate_web_pages

REF = datetime(2024, 6, 1, 12, 0, tzinfo=timezone.utc)


def test_html_roundtrip_byte_identical():
    for text in [
        "Alice Johnson works at Acme Corp.",
        "Para one.\n\nPara two with <angle> & ampersand.",
        "",
    ]:
        assert X.html_to_text(X.render_html(text, "t")) == text


def test_html_roundtrip_on_generated_pages():
    for row in generate_web_pages(n_pages=50, seed=42):
        assert X.html_to_text(row["html"]) == row["text"]


def test_datagen_deterministic():
    a = generate_web_pages(n_pages=30, seed=42)
    b = generate_web_pages(n_pages=30, seed=42)
    assert a == b
    assert len({r["url"] for r in a}) < len(a) or True  # re-crawls may exist


def test_extract_mentions_basic():
    ms = X.extract_mentions("Alice Johnson works at Acme Corp. She visited Springfield.")
    names = [m["name"] for m in ms]
    assert names == ["Alice Johnson", "Acme Corp", "Springfield"]
    types = {m["name"]: m["entity_type"] for m in ms}
    assert types["Acme Corp"] == "Organization"
    assert types["Alice Johnson"] == "Person"


def test_extract_mentions_skips_stopwords_and_dedupes():
    ms = X.extract_mentions("The report. Alice Johnson met Alice Johnson's team. Since then.")
    names = [m["name"] for m in ms]
    assert "The" not in names and "Since" not in names
    assert names.count("Alice Johnson") == 1


def test_extract_triples_present_tense_uses_reference_time():
    ts = X.extract_triples("Alice Johnson works at Acme Corp.", REF)
    assert len(ts) == 1
    t = ts[0]
    assert (t["subject"], t["predicate"], t["object"]) == ("Alice Johnson", "WORKS_AT", "Acme Corp")
    assert t["valid_at"] == REF and t["invalid_at"] is None
    assert t["fact"] == "Alice Johnson works at Acme Corp."


def test_extract_triples_explicit_dates():
    ts = X.extract_triples("Bob Dylan works at Globex Inc since 2024-03-15.", REF)
    assert ts[0]["valid_at"] == datetime(2024, 3, 15, tzinfo=timezone.utc)
    ts2 = X.extract_triples("Carol Mendez worked at Initech Systems until 2024-05-01.", REF)
    assert ts2[0]["invalid_at"] == datetime(2024, 5, 1, tzinfo=timezone.utc)
    assert ts2[0]["predicate"] == "WORKS_AT"


def test_extract_triples_sentence_scoped():
    two = X.extract_triples(
        "Alice Johnson works at Acme Corp. Bob Dylan lives in Springfield.", REF
    )
    assert {(t["subject"], t["object"]) for t in two} == {
        ("Alice Johnson", "Acme Corp"),
        ("Bob Dylan", "Springfield"),
    }
    # no cross-sentence pairing
    assert all(t["predicate"] in ("WORKS_AT", "LIVES_IN") for t in two)


def test_screaming_snake_predicates():
    import re

    for _, pred in X.PREDICATE_LEXICON:
        assert re.fullmatch(r"[A-Z][A-Z_]*", pred)


def test_det_id_stable():
    assert X.det_id("a", "b") == X.det_id("a", "b")
    assert X.det_id("a", "b") != X.det_id("a", "c")
    assert len(X.det_id("x")) == 40


def test_embedding_properties():
    v = X.embed_text("Acme Corp")
    assert len(v) == X.EMBEDDING_DIM
    assert abs(sum(x * x for x in v) - 1.0) < 1e-6
    assert v == X.embed_text("Acme  Corp".replace("  ", " "))
    # related strings more similar than unrelated
    sim_related = X.cosine(X.embed_text("acme corp offices"), X.embed_text("acme corp hq"))
    sim_unrelated = X.cosine(X.embed_text("acme corp offices"), X.embed_text("zebra quilt festival"))
    assert sim_related > sim_unrelated
    assert X.cosine([], [1.0]) == 0.0
    assert X.cosine([0.0, 0.0], [1.0, 0.0]) == 0.0
