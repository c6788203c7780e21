"""Deterministic synthetic web_pages generator (seed-fixed, no Spark needed).

Produces the BASELINE input_hint table
    (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
with the failure modes the pipeline must handle baked in:

- exact-duplicate entity surface forms (case variants)        -> D1 path
- fuzzy variants with identical fuzzy-normalized form
  (hyphen/ampersand punctuation)                              -> D4-D9 path
- near-miss names that must NOT merge (Jaccard < 0.9)         -> D9 negative
- low-entropy names that only exact-match                     -> D3 gate
- a hub organization present in ~20% of sentences             -> skew (D15/T4)
- re-crawled urls at later warc_ts with changed facts         -> T6 invalidation
- explicit in-text ISO dates ("since 2024-03-15")             -> E3 date rules
- a sprinkle of non-en rows                                   -> lang filter

html is a deterministic template around text (extraction.render_html), so the
html->text UDF has a byte-identical target per url.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from graphiti_spark.extraction import render_html

PERSONS = [
    "Alice Johnson", "Bob Dylan", "Bob Dyllan", "Carol Mendez", "David Okafor",
    "Emma Larsen", "Frank Moreau", "Grace Kim", "Hiro Tanaka", "Isabel Costa",
    "Jack Nguyen", "Karen Steel", "Liam Walsh", "Maria Petrova", "Noah Berg",
    "Olga Ivanova", "Paul Santos", "Quinn Harper", "Rosa Diaz", "Sam Patel",
    "Tara Singh", "Uma Rao", "Victor Hugo", "Wendy Zhao", "Xavier Leroy",
    "Yara Haddad", "Zoe Martin", "Bo Bo", "Al Jo",
]

# Each org is a list of surface variants: index 0 is canonical; the rest are
# exact-dup (case) or fuzzy-dup (punctuation) variants that the dedup stages
# must collapse.
ORGS = [
    ["Acme Corp", "ACME Corp", "Acme-Corp"],          # the hub entity (skew)
    ["Globex Inc", "Globex-Inc"],
    ["Initech Systems", "INITECH Systems"],
    ["Umbrella Labs", "Umbrella-Labs"],
    ["Stark Technologies"],
    ["Wayne Holdings", "Wayne-Holdings"],
    ["Hooli Inc"],
    ["Pied Piper Company"],
    ["Johnson & Sons Company", "Johnson Sons Company"],
    ["Vandelay Industries Group"],
    ["Oscorp Labs"],
    ["Tyrell Corporation"],
]

PLACES = [
    "Springfield", "Shelbyville", "Lakeview City", "Crystal Bay", "Iron Valley",
    "Maple County", "Cedar Springs", "Porttown", "Stone Island", "Sunny Park",
]

_TEMPLATES = [
    ("{p} works at {o}.", None),
    ("{p} works at {o} since {d}.", "since"),
    ("{p2} worked at {o} until {d}.", "until"),
    ("{p} is the ceo of {o}.", None),
    ("{p} moved to {l} on {d}.", "on"),
    ("{p} lives in {l}.", None),
    ("{o} acquired {o2} on {d}.", "on"),
    ("{o} is based in {l}.", None),
    ("{p} studied at {o}.", None),
    ("{p} married {p2} on {d}.", "on"),
    ("{p} visited {l}.", None),
    ("{o} partnered with {o2}.", None),
    ("{p} invested in {o}.", None),
    ("{p} met {p2} in {l}.", None),
    ("{p} was born in {l}.", None),
]

_FILLER = [
    "The quarterly report was published without further comment.",
    "Weather in the region stayed mild through the season.",
    "Local markets saw modest gains across the board.",
    "A new bridge opened after years of construction delays.",
]

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _pick_org(rng: random.Random) -> str:
    # ~20% of org references hit the hub entity (variant-weighted) for skew.
    if rng.random() < 0.2:
        return rng.choice(ORGS[0])
    grp = rng.choice(ORGS[1:])
    return rng.choice(grp)


def _sentence(rng: random.Random) -> str:
    tpl, _kind = rng.choice(_TEMPLATES)
    d = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    p = rng.choice(PERSONS)
    p2 = rng.choice([x for x in PERSONS if x != p])
    return tpl.format(
        p=p, p2=p2, o=_pick_org(rng), o2=_pick_org(rng), l=rng.choice(PLACES), d=d
    )


def generate_web_pages(
    n_pages: int = 200,
    seed: int = 42,
    n_groups: int = 4,
    n_hosts: int = 8,
    recrawl_fraction: float = 0.15,
    nonen_fraction: float = 0.04,
) -> list[dict]:
    """Return web_pages rows as dicts; fully determined by (n_pages, seed)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n_pages):
        group = f"g{i % n_groups}"
        host = f"site{i % n_hosts}"
        url = f"https://{host}.example/{group}/page{i}"
        warc_ts = EPOCH + timedelta(hours=i)
        n_sent = rng.randint(3, 8)
        sents = [_sentence(rng) for _ in range(n_sent)]
        if rng.random() < 0.3:
            sents.insert(rng.randrange(len(sents) + 1), rng.choice(_FILLER))
        # two paragraphs so html round-trip exercises the join
        mid = max(1, len(sents) // 2)
        text = " ".join(sents[:mid]) + "\n\n" + " ".join(sents[mid:])
        lang = "de" if rng.random() < nonen_fraction else "en"
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": render_html(text, title=f"{host} {group} {i}"),
                "text": text,
                "lang": lang,
            }
        )
        # re-crawl: same url, later snapshot, one changed employment fact ->
        # exercises temporal contradiction invalidation (T6)
        if rng.random() < recrawl_fraction:
            p = rng.choice(PERSONS)
            old_org = _pick_org(rng)
            new_org = _pick_org(rng)
            if old_org != new_org:
                t2 = text + f" {p} works at {new_org}."
                rows.append(
                    {
                        "url": url,
                        "warc_ts": warc_ts + timedelta(days=30),
                        "html": render_html(t2, title=f"{host} {group} {i}"),
                        "text": t2,
                        "lang": lang,
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# Distributed datagen: page content is a pure function of (seed, page_id) so
# the corpus can be generated inside executors (spark.range -> mapInPandas)
# at any scale with zero driver upload, identically at every parallelism
# level. The entity vocabulary grows with corpus size (like a real crawl),
# which keeps per-(subject, predicate) edge density bounded.
# ---------------------------------------------------------------------------

_FIRST = [
    "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Hiro", "Isabel",
    "Jack", "Karen", "Liam", "Maria", "Noah", "Olga", "Paul", "Quinn", "Rosa",
    "Sam", "Tara", "Uma", "Victor", "Wendy", "Xavier", "Yara", "Zoe", "Amir",
    "Bela", "Chen", "Dara", "Egon", "Faye", "Gil", "Hana", "Ivo", "Jana",
]
_LAST = [
    "Johnson", "Dylan", "Mendez", "Okafor", "Larsen", "Moreau", "Kim", "Tanaka",
    "Costa", "Nguyen", "Steel", "Walsh", "Petrova", "Berg", "Ivanova", "Santos",
    "Harper", "Diaz", "Patel", "Singh", "Rao", "Hugo", "Zhao", "Leroy",
    "Haddad", "Martin", "Keller", "Novak", "Silva", "Weber", "Fontaine", "Ricci",
]
_ORG_A = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Hooli", "Vandelay",
    "Oscorp", "Tyrell", "Cyberdyne", "Nakatomi", "Wonka", "Duff", "Sirius",
    "Gringotts", "Aperture", "BlackMesa", "Weyland", "Yutani", "Massive", "Rekall",
]
_ORG_B = ["Corp", "Inc", "Labs", "Systems", "Technologies", "Holdings", "Group", "Company"]
_PLACE_A = [
    "Spring", "Shelby", "Lake", "Crystal", "Iron", "Maple", "Cedar", "Port",
    "Stone", "Sunny", "Raven", "Gold", "Silver", "North", "South", "Amber",
]
_PLACE_B = ["field", "ville", "view City", "Bay", "Valley", "County", "Springs", "town", "Island", "Park"]


class ScaledVocab:
    """Procedural entity vocabulary sized to the corpus (~1 person / 40
    pages). Variant surface forms (case / punctuation) are attached to a
    deterministic subset so exact + fuzzy dedup see real work at any scale."""

    def __init__(self, n_pages: int, seed: int = 42):
        rng = random.Random(f"vocab:{seed}")
        n_person = min(len(_FIRST) * len(_LAST), max(40, n_pages // 40))
        n_org = min(len(_ORG_A) * len(_ORG_B), max(12, n_pages // 120))
        n_place = min(len(_PLACE_A) * len(_PLACE_B), max(10, n_pages // 200))

        def sample_pairs(a, b, n):
            combos = rng.sample([(x, y) for x in a for y in b], n)
            return combos

        self.persons = [f"{a} {b}" for a, b in sample_pairs(_FIRST, _LAST, n_person)]
        self.orgs = []
        for a, b in sample_pairs(_ORG_A, _ORG_B, n_org):
            base = f"{a} {b}"
            variants = [base]
            r = random.Random(f"orgvar:{seed}:{base}")
            if r.random() < 0.4:
                variants.append(f"{a.upper()} {b}")      # exact-dup (case)
            if r.random() < 0.4:
                variants.append(f"{a}-{b}")               # fuzzy-dup (punct)
            self.orgs.append(variants)
        self.places = [f"{a}{b}" for a, b in sample_pairs(_PLACE_A, _PLACE_B, n_place)]

    def pick_org(self, rng: random.Random) -> str:
        # ~20% of references hit org 0 (the hub entity) for join skew
        grp = self.orgs[0] if rng.random() < 0.2 else rng.choice(self.orgs)
        return rng.choice(grp)


def page_rows_for_index(
    i: int,
    vocab: ScaledVocab,
    seed: int = 42,
    n_groups: int = 16,
    n_hosts: int = 64,
    recrawl_fraction: float = 0.15,
    nonen_fraction: float = 0.04,
) -> list[dict]:
    """All rows for page index i (the page + optionally its re-crawl) —
    pure function of (seed, i, vocab), independent of every other index."""
    rng = random.Random(f"page:{seed}:{i}")
    group = f"g{i % n_groups}"
    host = f"site{i % n_hosts}"
    url = f"https://{host}.example/{group}/page{i}"
    warc_ts = EPOCH + timedelta(minutes=i % (365 * 24 * 60))

    def sentence() -> str:
        tpl, _kind = rng.choice(_TEMPLATES)
        d = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        p = rng.choice(vocab.persons)
        p2 = rng.choice(vocab.persons)
        while p2 == p:
            p2 = rng.choice(vocab.persons)
        return tpl.format(
            p=p, p2=p2, o=vocab.pick_org(rng), o2=vocab.pick_org(rng),
            l=rng.choice(vocab.places), d=d,
        )

    sents = [sentence() for _ in range(rng.randint(3, 8))]
    if rng.random() < 0.3:
        sents.insert(rng.randrange(len(sents) + 1), rng.choice(_FILLER))
    mid = max(1, len(sents) // 2)
    text = " ".join(sents[:mid]) + "\n\n" + " ".join(sents[mid:])
    lang = "de" if rng.random() < nonen_fraction else "en"
    rows = [
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": render_html(text, title=f"{host} {group} {i}"),
            "text": text,
            "lang": lang,
        }
    ]
    if rng.random() < recrawl_fraction:
        p = rng.choice(vocab.persons)
        new_org = vocab.pick_org(rng)
        t2 = text + f" {p} works at {new_org}."
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts + timedelta(days=30),
                "html": render_html(t2, title=f"{host} {group} {i}"),
                "text": t2,
                "lang": lang,
            }
        )
    return rows


def distributed_pages(spark, n_pages: int, seed: int = 42, partitions: int | None = None):
    """web_pages DataFrame generated inside executors — scalable to any
    n_pages with no driver bottleneck; byte-identical at every parallelism
    level because content derives only from (seed, page_id)."""
    from graphiti_spark.schemas import WEB_PAGES

    parts = partitions or max(spark.sparkContext.defaultParallelism * 2, 16)

    def gen(batches):
        import pandas as pd

        vocab = ScaledVocab(n_pages, seed)
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rows.extend(page_rows_for_index(int(i), vocab, seed))
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_pages, numPartitions=parts)
        .mapInPandas(gen, schema=WEB_PAGES)
    )


def closed_form_pages(orders_df):
    """web_pages whose KG-pipeline output has a CLOSED FORM — the basis of
    the kg_pipeline_edges_closed DuckDB value oracle (round-3 verdict ask):
    every page derives from one `orders` row by pure integer/format-string
    arithmetic both engines can compute, and the construction provably
    never activates the two non-SQL-expressible legs:

    - entity names collide ONLY exactly (case variants normalize to one
      norm_exact key; distinct names are far below the 0.9 shingle-Jaccard
      fuzzy bar — asserted empty in tests/test_closed_oracle.py), so node
      canonicalization is pure exact dedup;
    - every post-T1 endpoint pair carries exactly ONE edge (the normalized
      fact is a function of the endpoint pair), so the cosine near-dup
      merge has zero candidate pairs (asserted in the same test).

    What the slice DOES exercise end-to-end: html-less S3 ingest, sentence
    split, mention + predicate-lexicon extraction with since/until date
    rules (extraction.py:33,71-76), exact node dedup over case variants,
    D15 pointer rewrite, T1 first-wins fact dedup with provenance merge,
    and the full two-phase T6/T7 temporal algebra — all against a
    recomputable SQL twin (see __spark_entry__._ORACLES).

    Per orders row (k=o_orderkey, c=o_custkey), with s=(c%1000)*37+(k%40):
      person 'Pat C<d1>b<d2>d<d3>f<d4>g<d5>h<d6> Moreau'  (Person; d1..d6 =
             zero-padded digits of c, separator-anchored — see below)
      org    'Orgunit K<k%40:02d> Corp' (Organization; UPPERCASE first word
                                         when k%3==0 -> exact-dup variant)
      zone   'Zone Z<s%12:02d> Springs' (Place)
      sentence 1 (t=s%8):  t<=5  '<person> works at <org>.'
                           t==6  '... works at ... since 2024-MM-DD.'
                           t==7  '... worked at ... until 2024-MM-DD.'
      sentence 2:          '<org> is based in <zone>.'
      (+ a mention-free filler sentence when s%4==0)
      url https://h<c%8>.example/p<k>   (group = url host)
      warc_ts 2024-01-01 + k minutes    (unique per page -> total arrival
                                         order, so T6 arrival ranks reduce
                                         to created_at comparisons)
    """
    from pyspark.sql import functions as F

    k, c = F.col("o_orderkey"), F.col("o_custkey")
    df = orders_df.select(
        k.alias("k"), c.alias("c"), ((c % 1000) * 37 + (k % 40)).alias("s")
    )
    s = F.col("s")
    t = s % 8
    date_str = F.format_string(
        "2024-%02d-%02d",
        (F.lit(1) + s % 12).cast("int"),
        (F.lit(1) + (s * 7) % 28).cast("int"),
    )
    # PROVABLY fuzzy-inert ids. The fuzzy leg judges char-3-gram Jaccard of
    # the space-stripped name at >= 0.9; plain digit ids defeat both naive
    # and zero-padded rendering ('c112' vs 'c1112' -> 0.93; padded '011010'
    # vs '010110' have IDENTICAL trigram sets). Person ids therefore
    # interleave the 6 padded digits with separator letters (b,d,f,g,h)
    # that occur exactly once in the whole name: every trigram touching a
    # digit contains a unique-position anchor, so a digit change removes 3
    # trigrams that cannot re-match elsewhere -> Jaccard <= (N-3)/(N+3) ~
    # 0.73 for ANY distinct pair. Org/zone 2-digit ids are anchored the
    # same way by the adjacent unique letters (k/z) and the digit-free rest
    # of the name (>= 2 trigram diffs -> <= 0.75). Asserted empty at driver
    # scale in tests/test_closed_oracle.py.
    pad = F.format_string("%06d", F.col("c"))
    person = F.concat(
        F.lit("Pat C"),
        F.substring(pad, 1, 1), F.lit("b"), F.substring(pad, 2, 1), F.lit("d"),
        F.substring(pad, 3, 1), F.lit("f"), F.substring(pad, 4, 1), F.lit("g"),
        F.substring(pad, 5, 1), F.lit("h"), F.substring(pad, 6, 1),
        F.lit(" Moreau"),
    )
    org = F.concat(
        F.when(F.col("k") % 3 == 0, F.lit("ORGUNIT")).otherwise(F.lit("Orgunit")),
        F.format_string(" K%02d Corp", F.col("k") % 40),
    )
    zone = F.format_string("Zone Z%02d Springs", s % 12)
    sent1 = (
        F.when(t <= 5, F.concat(person, F.lit(" works at "), org, F.lit(".")))
        .when(t == 6, F.concat(person, F.lit(" works at "), org, F.lit(" since "), date_str, F.lit(".")))
        .otherwise(F.concat(person, F.lit(" worked at "), org, F.lit(" until "), date_str, F.lit(".")))
    )
    sent2 = F.concat(org, F.lit(" is based in "), zone, F.lit("."))
    filler = F.when(s % 4 == 0, F.lit(" " + _FILLER[0])).otherwise(F.lit(""))
    return df.select(
        F.format_string("https://h%d.example/p%d", F.col("c") % 8, F.col("k")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("k") * 60).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat(sent1, F.lit(" "), sent2, filler).alias("text"),
        F.lit("en").alias("lang"),
    )


def closed_form_pages_fuzzy(orders_df):
    """closed_form_pages variant that PLANTS fuzzy node duplicates with a
    closed form — the basis of the kg_pipeline_edges_fuzzy_closed DuckDB
    value oracle (round-4 verdict ask #3: drive D2-D9/T4-T5 through the
    REAL run_pipeline with a value-checkable twin; ref semantics
    /root/reference/graphiti_core/utils/maintenance/dedup_helpers.py:198-246).

    Deltas vs closed_form_pages, per orders row
    (k=o_orderkey, c=o_custkey, r=k%40, s=(c%1000)*37+r,
    v=((c div 8) + r) % 2 — the parity of c div 8, NOT of c: customers in
    a group share c % 8, so c's own parity is constant per group while
    (c div 8) % 2 alternates, guaranteeing both spellings co-occur):

      org surface  v=0: 'Orgunit K<r:02d> Corp'  (spaced, 3 tokens)
                   v=1: 'Orgunit-K<r:02d>-Corp'  (hyphenated, 1 token)
      zone index   z = 2*(s%6) + v  (zone parity == spelling parity)
      tense/date   unchanged (t=s%8, same date formula); k%3 case variant
                   unchanged (exact-dup leg keeps its work)

    Why the fuzzy leg's outcome is CLOSED FORM: the two org spellings have
    different normalize_exact keys but the SAME normalize_fuzzy form
    ('orgunit k<r> corp'), hence IDENTICAL char-3-gram shingle sets —
    Jaccard exactly 1.0 and bit-identical minhash signatures / LSH band
    keys, so candidacy is structural, not hash luck. Every other distinct
    pair stays <= ~0.75 by closed_form_pages' separator-anchoring argument
    (unchanged here). The merged pair set is therefore exactly the
    same-(group, fuzzy-norm) classes, and the canonical display name is
    min(norm_exact) over the class (build_canonical_nodes) — all
    SQL-recomputable. Asserted against the real LSH leg at driver scale in
    tests/test_closed_oracle_fuzzy.py.

    Why the EDGE near-dup leg stays inert: a WORKS_AT fact is a pure
    function of (c, r) — v is fixed per endpoint pair — and a BASED_IN
    endpoint pair (org, zone) only ever receives the spelling of the
    zone's parity, so every post-T1 endpoint pair still carries exactly
    ONE norm_fact and T4/T5 has zero candidates (also asserted)."""
    from pyspark.sql import functions as F

    k, c = F.col("o_orderkey"), F.col("o_custkey")
    df = orders_df.select(
        k.alias("k"),
        c.alias("c"),
        (k % 40).alias("r"),
        ((c % 1000) * 37 + (k % 40)).alias("s"),
        # (c div 8) % 2 as exact integer arithmetic: (c % 16) >= 8
        ((F.when(c % 16 >= 8, 1).otherwise(0) + k % 40) % 2).alias("v"),
    )
    s = F.col("s")
    t = s % 8
    date_str = F.format_string(
        "2024-%02d-%02d",
        (F.lit(1) + s % 12).cast("int"),
        (F.lit(1) + (s * 7) % 28).cast("int"),
    )
    pad = F.format_string("%06d", F.col("c"))
    person = F.concat(
        F.lit("Pat C"),
        F.substring(pad, 1, 1), F.lit("b"), F.substring(pad, 2, 1), F.lit("d"),
        F.substring(pad, 3, 1), F.lit("f"), F.substring(pad, 4, 1), F.lit("g"),
        F.substring(pad, 5, 1), F.lit("h"), F.substring(pad, 6, 1),
        F.lit(" Moreau"),
    )
    head = F.when(F.col("k") % 3 == 0, F.lit("ORGUNIT")).otherwise(F.lit("Orgunit"))
    org = F.when(
        F.col("v") == 1, F.concat(head, F.format_string("-K%02d-Corp", F.col("r")))
    ).otherwise(F.concat(head, F.format_string(" K%02d Corp", F.col("r"))))
    zone = F.format_string("Zone Z%02d Springs", (s % 6) * 2 + F.col("v"))
    sent1 = (
        F.when(t <= 5, F.concat(person, F.lit(" works at "), org, F.lit(".")))
        .when(t == 6, F.concat(person, F.lit(" works at "), org, F.lit(" since "), date_str, F.lit(".")))
        .otherwise(F.concat(person, F.lit(" worked at "), org, F.lit(" until "), date_str, F.lit(".")))
    )
    sent2 = F.concat(org, F.lit(" is based in "), zone, F.lit("."))
    filler = F.when(s % 4 == 0, F.lit(" " + _FILLER[0])).otherwise(F.lit(""))
    return df.select(
        F.format_string("https://h%d.example/p%d", F.col("c") % 8, F.col("k")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("k") * 60).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat(sent1, F.lit(" "), sent2, filler).alias("text"),
        F.lit("en").alias("lang"),
    )


def write_web_pages_parquet(path: str, n_pages: int = 200, seed: int = 42) -> int:
    """Materialize the generator to a parquet file via pyarrow (no Spark)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_web_pages(n_pages=n_pages, seed=seed)
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], type=pa.timestamp("us", tz="UTC")),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    pq.write_table(table, path)
    return len(rows)


def png_encode(pixels, filters=None) -> bytes:
    """Minimal spec-correct PNG encoder over the Python stdlib (zlib for
    the IDAT deflate stream and CRCs) — exists so tests and synthetic
    multimodal columns can round-trip dataops._png_decode against known
    pixel arrays without an image library.

    ``pixels`` is an (H, W, C) uint8 array with C in {1, 2, 3, 4}
    (grey / grey+alpha / RGB / RGBA). ``filters`` optionally gives the
    scanline filter type (0-4) per row; defaults to 0 (None) everywhere.
    Forward-filters each row per the public spec, deflates, and wraps in
    signature + IHDR/IDAT/IEND chunks.
    """
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if filters is None:
        filters = [0] * h
    flat = px.reshape(h, w * nch).astype(np.int64)
    stride = w * nch
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        row = flat[y]
        left = np.zeros(stride, dtype=np.int64)
        left[nch:] = row[:-nch]
        up_left = np.zeros(stride, dtype=np.int64)
        up_left[nch:] = prev[:-nch]
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - up_left
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - up_left)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, up_left)
            )
            enc = row - pred
        else:
            raise ValueError(f"bad filter {f}")
        out.append(f)
        out += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )
