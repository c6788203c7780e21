"""Deterministic extraction kernels (pure Python — no Spark imports).

The reference extracts entity mentions and (subj, pred, obj) fact triples
with LLM calls (/root/reference/graphiti_core/utils/maintenance/
node_operations.py:85-199, edge_operations.py:89-224; output contracts in
prompts/extract_nodes.py:25-34 and prompts/extract_edges.py:25-41). This
engine replaces those calls with deterministic, batched kernels that honor
the same output contracts:

- mentions  -> list of {name, entity_type}            (ExtractedEntity shape)
- triples   -> list of {predicate, subj_idx, obj_idx, fact, valid_at,
               invalid_at}                            (ExtractedEdge shape)
- predicates are SCREAMING_SNAKE_CASE (ref prompts/extract_edges.py:26,112)
- per-fact valid_at defaults to the episode reference time for
  present-tense facts (DATETIME RULES, ref prompts/extract_edges.py:118-125)

Both the Spark pandas UDFs and the single-process reference-semantics
oracle import THESE functions, so triple P/R divergence can only come from
the distributed dedup strategy, never from extraction itself.
"""

from __future__ import annotations

import html as _html
import re
from datetime import datetime, timezone
from hashlib import blake2b, sha1

DEFAULT_PREDICATE = "RELATES_TO"  # ref edge_operations.py:46

# Capitalized-token-sequence mention pattern. Tokens may carry digits,
# apostrophes and hyphens ("O'Brien", "Umbrella-Labs").
MENTION_RE = re.compile(r"\b[A-Z][A-Za-z0-9'\-]*(?:[ ][A-Z][A-Za-z0-9'\-]*)*")

# Single capitalized words that are sentence furniture, not entities.
_STOP_MENTIONS = frozenset(
    """the a an and or but so in on at of for with from by to it he she they we i
    this that these those however meanwhile later earlier yesterday today tomorrow
    after before then when while since until where who which what as""".split()
)

ORG_SUFFIXES = frozenset(
    "inc corp corporation labs ltd llc company systems technologies university institute group holdings".split()
)
PLACE_SUFFIXES = frozenset("city island valley bay park county springs ville town".split())

# Ordered predicate lexicon: phrase (lowercased, matched on word boundaries)
# -> SCREAMING_SNAKE predicate. Longest phrases first so "is the ceo of"
# beats "of".
PREDICATE_LEXICON: list[tuple[str, str]] = [
    ("is the ceo of", "CEO_OF"),
    ("became the ceo of", "CEO_OF"),
    ("is based in", "BASED_IN"),
    ("is located in", "LOCATED_IN"),
    ("was born in", "BORN_IN"),
    ("partnered with", "PARTNERED_WITH"),
    ("invested in", "INVESTED_IN"),
    ("studied at", "STUDIED_AT"),
    ("works at", "WORKS_AT"),
    ("worked at", "WORKS_AT"),
    ("works for", "WORKS_AT"),
    ("moved to", "MOVED_TO"),
    ("lives in", "LIVES_IN"),
    ("lived in", "LIVES_IN"),
    ("acquired", "ACQUIRED"),
    ("founded", "FOUNDED"),
    ("married", "MARRIED_TO"),
    ("visited", "VISITED"),
    ("met", "MET"),
]
_PRED_RES = [(re.compile(r"\b" + re.escape(p) + r"\b"), name) for p, name in PREDICATE_LEXICON]

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_ISO_DATE = re.compile(r"\b(\d{4}-\d{2}-\d{2})\b")
_SINCE_DATE = re.compile(r"\b(?:since|from|on)\s+(\d{4}-\d{2}-\d{2})\b")
_UNTIL_DATE = re.compile(r"\buntil\s+(\d{4}-\d{2}-\d{2})\b")


def det_id(*parts: str) -> str:
    """Deterministic 40-hex content id (replaces the reference's uuid4 so the
    pipeline is idempotent and resumable; see SURVEY.md §1.4)."""
    return sha1("\x1f".join(parts).encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# html -> text (byte-identical per url, per BASELINE input_hint)
# ---------------------------------------------------------------------------

_P_BLOCK = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def render_html(text: str, title: str = "") -> bytes:
    """Deterministic page template used by the synthetic web_pages generator.

    Paragraphs (split on blank lines) become <p> blocks; entities are
    HTML-escaped so extraction has real unescaping work to do.
    """
    paras = text.split("\n\n")
    body = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in paras)
    return (
        f"<html><head><title>{_html.escape(title, quote=False)}</title></head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")


def html_to_text(raw: bytes | str) -> str:
    """Inverse of render_html: extract <p> blocks, unescape, join with blank
    lines. Byte-identical to the original text for template-rendered pages."""
    doc = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    paras = [_html.unescape(m.group(1)) for m in _P_BLOCK.finditer(doc)]
    return "\n\n".join(paras)


# ---------------------------------------------------------------------------
# E1 — entity mention extraction
# ---------------------------------------------------------------------------


def classify_mention(name: str) -> str:
    toks = name.lower().split()
    if toks and (toks[-1].strip(".") in ORG_SUFFIXES):
        return "Organization"
    if toks and (toks[-1] in PLACE_SUFFIXES or len(toks) == 1):
        return "Place" if toks[-1] in PLACE_SUFFIXES else "Entity"
    if len(toks) >= 2:
        return "Person"
    return "Entity"


def extract_mentions(text: str) -> list[dict]:
    """All entity mentions in reading order, deduped on first occurrence of
    the exact surface form. Returns [{'name','entity_type','start'}...]."""
    out: list[dict] = []
    seen: set[str] = set()
    for m in MENTION_RE.finditer(text):
        name = m.group(0).rstrip("-")
        if not name or name.lower() in _STOP_MENTIONS:
            continue
        if name in seen:
            continue
        seen.add(name)
        out.append({"name": name, "entity_type": classify_mention(name), "start": m.start()})
    return out


# ---------------------------------------------------------------------------
# E2 — reflexion second pass ("missed entities")
# ---------------------------------------------------------------------------

# Naming-cue pattern: lowercase names the capitalized-mention pass cannot
# see, introduced by an explicit cue ("the startup called acme labs").
# Capture is capped at TWO tokens: lowercase spans carry no capitalization
# boundary, so a longer window would swallow the following verb.
_REFLEXION_CUE = re.compile(
    r"\b(?:called|named|known as|aka)\s+"
    r"([a-z][a-z0-9'\-]*(?:[ ][a-z][a-z0-9'\-]*)?)"
)


def extract_reflexion_mentions(text: str, already: list[dict] | None = None) -> list[dict]:
    """E2 — deterministic replacement for the reference's reflexion retry
    (node_operations.py:62-82: after extraction an LLM is asked which
    entities were MISSED and the answers are appended; default-off via
    MAX_REFLEXION_ITERATIONS=0). Here the 'missed entities' critic is a
    second pattern family: lowercase names introduced by a naming cue,
    which MENTION_RE (capitalized sequences) provably cannot match.
    Candidates containing any stop token are rejected ("named after the
    war" never becomes an entity), and names already found by the first
    pass (case-insensitively) are skipped — the reference also dedupes the
    reflexion output against the found-entity list. One pass is a fixpoint:
    the rule is deterministic, so further iterations add nothing."""
    seen = {m["name"].lower() for m in (already or [])}
    out: list[dict] = []
    for h in _REFLEXION_CUE.finditer(text):
        name = h.group(1).rstrip("-")
        toks = name.split()
        if not toks or any(t in _STOP_MENTIONS for t in toks):
            continue
        if name.lower() in seen:
            continue
        seen.add(name.lower())
        out.append(
            {"name": name, "entity_type": classify_mention(name), "start": h.start(1)}
        )
    return out


def extract_mentions_with_reflexion(text: str) -> list[dict]:
    """First-pass mentions + the E2 reflexion second pass, in reading
    order within each pass (reference appends missed entities after the
    initial extraction)."""
    first = extract_mentions(text)
    return first + extract_reflexion_mentions(text, first)


# ---------------------------------------------------------------------------
# E3 — open triple extraction with temporal attribute resolution
# ---------------------------------------------------------------------------


def _parse_date(s: str) -> datetime | None:
    # Wild web text contains invalid calendar dates ("2024-02-31"); those
    # must degrade to "no explicit date", never kill the task.
    try:
        return datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def extract_triples(text: str, reference_time: datetime) -> list[dict]:
    """Sentence-scoped predicate-lexicon triple extraction.

    For every predicate phrase occurring in a sentence, the subject is the
    nearest mention ending before the phrase and the object the nearest
    mention starting after it. valid_at resolves to an explicit in-sentence
    ISO date when present ("since/from/on YYYY-MM-DD"), otherwise to the
    episode reference time (the reference's present-tense rule); "until
    YYYY-MM-DD" sets invalid_at. Fact text = the sentence, stripped.
    """
    if reference_time.tzinfo is None:
        reference_time = reference_time.replace(tzinfo=timezone.utc)
    triples: list[dict] = []
    pos = 0
    for sentence in _SENT_SPLIT.split(text):
        s = sentence.strip()
        if not s:
            pos += len(sentence) + 1
            continue
        mentions = []
        for m in MENTION_RE.finditer(s):
            nm = m.group(0).rstrip("-")
            if nm and nm.lower() not in _STOP_MENTIONS:
                mentions.append((m.start(), m.end(), nm))
        if len(mentions) >= 2:
            low = s.lower()
            since = _SINCE_DATE.search(low)
            until = _UNTIL_DATE.search(low)
            valid_at = (_parse_date(since.group(1)) if since else None) or reference_time
            invalid_at = _parse_date(until.group(1)) if until else None
            for pred_re, pred in _PRED_RES:
                for hit in pred_re.finditer(low):
                    subj = None
                    for st, en, nm in mentions:
                        if en <= hit.start():
                            subj = nm
                    obj = None
                    for st, en, nm in reversed(mentions):
                        if st >= hit.end():
                            obj = nm
                    if subj and obj and subj != obj:
                        triples.append(
                            {
                                "predicate": pred,
                                "subject": subj,
                                "object": obj,
                                "fact": s,
                                "valid_at": valid_at,
                                "invalid_at": invalid_at,
                            }
                        )
        pos += len(sentence) + 1
    return triples


# ---------------------------------------------------------------------------
# E7 — deterministic feature-hashing embedder (replaces network embedder;
# ref graphiti_core/embedder/client.py — batched, newline-stripped input)
# ---------------------------------------------------------------------------

EMBEDDING_DIM = 64


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> list[float]:
    """Feature-hashed unit-norm embedding: each lowercased token (and its
    char-3-grams, for fuzziness) hashes to a dimension and a ±1 sign.
    Deterministic across processes; cosine between related strings is
    meaningfully > 0, so the reference's cosine>=0.6 candidate rule keeps
    real behavior."""
    vec = [0.0] * dim
    cleaned = text.replace("\n", " ").lower()
    feats = cleaned.split()
    for tok in list(feats):
        if len(tok) > 3:
            feats.extend(tok[i : i + 3] for i in range(len(tok) - 2))
    for f in feats:
        d = blake2b(f.encode("utf-8"), digest_size=8).digest()
        idx = int.from_bytes(d[:4], "big") % dim
        sign = 1.0 if d[4] & 1 else -1.0
        vec[idx] += sign
    norm = sum(v * v for v in vec) ** 0.5
    if norm == 0.0:
        return vec
    return [v / norm for v in vec]


def cosine(a: list[float], b: list[float]) -> float:
    """Zero-norm-safe cosine (ref search_utils.py:75-86 / helpers.py:99-102)."""
    if not a or not b:
        return 0.0
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    if na == 0.0 or nb == 0.0:
        return 0.0
    return sum(x * y for x, y in zip(a, b)) / (na * nb)
