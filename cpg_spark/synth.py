"""Deterministic synthetic corpus + golden fixtures (no external data).

Mirrors the reference's test strategy (SURVEY.md §5): one small fixture
per behavior with exact expected outputs, the way cpg pairs fixture
source files with exact graph-shape assertions
(cpg-core/src/test/resources/, EOGTest.kt:63-110). The golden triples
here are computed by an INDEPENDENT pure-python implementation of the
pipeline spec (union-find CC, greedy mention regex), so pipeline bugs
cannot leak into the fixtures.

Everything is seeded (seed=42 conventions per TESTDATA.md); page text is
all-lowercase filler with Capitalized entity surfaces, so the
capitalized-run mention detector has an exact golden answer.
"""

from __future__ import annotations

import hashlib
import random
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from .functions.hashing import entity_id_py, inferred_id_py
from .functions.text import escape_html_py, split_sentences_py

TARGET_LANGS = ("en", "de", "es", "fr")

# capitalized-run mention detector (1-3 words) — the NER-heuristic spec
# shared by the pipeline (operators/extract.py) and the golden computation.
MENTION_REGEX = r"[A-Z][a-z']+(?: [A-Z][a-z']+){0,2}"

FILLER = (
    "the quick report said that during spring many travelers visited and "
    "wrote about local markets while new roads connected small villages to "
    "ports where fresh goods arrived daily from distant farms bringing "
    "news stories songs recipes tools cloth spices grain timber salt"
).split()

OOV_NAMES = ("Zubrin Kale", "Qorvath", "Velmora Insk")


@dataclass
class Entity:
    name: str
    entity_type: str
    aliases: tuple[str, ...]  # surface forms, Title Case
    prior: float
    eid: str = field(init=False)

    def __post_init__(self) -> None:
        self.eid = entity_id_py(self.name, self.entity_type)


def build_world() -> list[Entity]:
    """Fixed entity world covering FIXTURES.md §5 component shapes:
    a chain (A-B-C-D via shared aliases), a star, a big skewed component,
    an ambiguous cross-type alias, a hot (skew) alias, and singletons."""
    ents: list[Entity] = []

    # duplicate ORG pair -> 2-member component via shared alias "Acme"
    ents.append(Entity("Acme Corp", "ORG", ("Acme Corp", "Acme"), 0.8))
    ents.append(Entity("Acme Corporation", "ORG", ("Acme Corporation", "Acme"), 0.6))

    # chain component: Pa-Pb share "Arin", Pb-Pc share "Borel", Pc-Pd share "Corin"
    ents.append(Entity("Arin Vale", "PLACE", ("Arin Vale", "Arin"), 0.7))
    ents.append(Entity("Arin Hollow", "PLACE", ("Arin Hollow", "Arin", "Borel"), 0.5))
    ents.append(Entity("Borel Heights", "PLACE", ("Borel Heights", "Borel", "Corin"), 0.6))
    ents.append(Entity("Corin Fields", "PLACE", ("Corin Fields", "Corin"), 0.4))

    # star component: center shares a distinct alias with each spoke
    ents.append(
        Entity("Nordwind Labs", "ORG", ("Nordwind Labs", "Nordwind", "Nwl", "Windlab"), 0.9)
    )
    ents.append(Entity("Nordwind Gmbh", "ORG", ("Nordwind Gmbh", "Nordwind"), 0.5))
    ents.append(Entity("Nwl Holdings", "ORG", ("Nwl Holdings", "Nwl"), 0.5))
    ents.append(Entity("Windlab Oy", "ORG", ("Windlab Oy", "Windlab"), 0.5))

    # big skewed component: 6 orgs all sharing "Megacorp"
    for i in range(6):
        ents.append(
            Entity(f"Megacorp Unit{i}", "ORG", (f"Megacorp Unit{i}", "Megacorp"), 0.3 + 0.05 * i)
        )

    # ambiguous alias ACROSS types (no merge, link competition only)
    ents.append(Entity("Orion Vale", "PERSON", ("Orion Vale", "Orion"), 0.75))
    ents.append(Entity("Orion Systems", "ORG", ("Orion Systems", "Orion"), 0.55))

    # singleton persons / places / works
    for name, typ, prior in [
        ("Mira Talvek", "PERSON", 0.85),
        ("Oren Dask", "PERSON", 0.8),
        ("Sela Brind", "PERSON", 0.7),
        ("Tavren Holt", "PERSON", 0.65),
        ("Dorvik", "PLACE", 0.9),
        ("Elmsworth", "PLACE", 0.8),
        ("Cantara Bay", "PLACE", 0.75),
        ("Silent Meridian", "WORK", 0.7),
        ("Glass Harvest", "WORK", 0.6),
    ]:
        ents.append(Entity(name, typ, (name,), prior))
    return ents


def alias_dict_rows(world: list[Entity]) -> list[dict]:
    rows = []
    for e in world:
        for a in e.aliases:
            rows.append(
                {
                    "alias": a.lower(),
                    "entity_id": e.eid,
                    "entity_name": e.name,
                    "entity_type": e.entity_type,
                    "prior": e.prior,
                }
            )
    return rows


# --- independent union-find canonicalization (golden side) -----------------


def expected_components(world: list[Entity]) -> dict[str, str]:
    """member eid -> canonical eid (= min member id), via union-find over
    shared (alias, entity_type) — the TypeResolver-dedup analog computed
    independently of Spark."""
    parent: dict[str, str] = {e.eid: e.eid for e in world}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_key: dict[tuple[str, str], list[str]] = {}
    for e in world:
        for a in e.aliases:
            by_key.setdefault((a.lower(), e.entity_type), []).append(e.eid)
    for members in by_key.values():
        for m in members[1:]:
            union(members[0], m)
    # canonical = min member id in component
    comp_members: dict[str, list[str]] = {}
    for e in world:
        comp_members.setdefault(find(e.eid), []).append(e.eid)
    out: dict[str, str] = {}
    for members in comp_members.values():
        canon = min(members)
        for m in members:
            out[m] = canon
    return out


# --- page generation --------------------------------------------------------


def page_html(text: str, lang: str, title: str) -> bytes:
    """The page template. extract_text (functions/text.py) is its exact
    byte-level inverse for ANY input text: the body escapes &, <, > so no
    tag-like bytes survive, and injected markup strips to zero bytes."""
    body = escape_html_py(text).replace(". ", ".</p><p> ")
    html = (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>{title}</title><style>body{{font-family:serif}}</style>"
        f'<script>var t="x";</script></head><body><nav>home | about</nav>'
        f"<article><p>{body}</p></article>"
        f"<footer>&copy; 2024 example.org</footer></body></html>"
    )
    return html.encode("utf-8")


def make_corpus(n_pages: int, seed: int = 42) -> dict[str, list[dict]]:
    """Generate pages + alias_dict + golden fixtures.

    Returns dict of row-lists: pages, alias_dict, golden_triples,
    golden_text, expected_components.
    """
    rng = random.Random(seed)
    world = build_world()
    dict_rows = alias_dict_rows(world)
    canon = expected_components(world)
    by_alias: dict[str, list[Entity]] = {}
    for e in world:
        for a in e.aliases:
            by_alias.setdefault(a.lower(), []).append(e)

    hot = world[0]  # "Acme Corp" — hot entity on >=10% of pages (skew)
    epoch = datetime(2024, 1, 1)

    pages: list[dict] = []
    for i in range(n_pages):
        lang = rng.choice(TARGET_LANGS + TARGET_LANGS + ("zz",))  # ~1/9 non-target
        if rng.random() < 0.04:
            text = rng.choice(["", "   ", " \n \t "])  # empty/whitespace pages
        else:
            n_sent = rng.randint(2, 6)
            sents = []
            for _ in range(n_sent):
                words: list[str] = rng.sample(FILLER, rng.randint(2, 4))
                n_ment = rng.choice([0, 1, 1, 2, 2, 3])
                for _ in range(n_ment):
                    r = rng.random()
                    if r < 0.12:
                        surface = rng.choice(hot.aliases)
                    elif r < 0.17:
                        surface = rng.choice(OOV_NAMES)
                    else:
                        ent = rng.choice(world)
                        surface = rng.choice(ent.aliases)
                    words.append(surface)
                    words.extend(rng.sample(FILLER, rng.randint(1, 3)))
                sents.append(" ".join(words) + rng.choice([".", ".", ".", "!", "?"]))
            text = " ".join(sents)
        url = f"https://example.org/{lang}/p{i}"
        pages.append(
            {
                "url": url,
                "warc_ts": epoch + timedelta(seconds=i),
                "html": page_html(text, lang, f"page {i}"),
                "text": text,
                "lang": lang,
            }
        )

    golden_triples = _golden_triples(pages, by_alias, canon)
    golden_text = [
        {
            "url": p["url"],
            "text_sha256": hashlib.sha256(p["text"].encode()).hexdigest(),
            "text_len": len(p["text"].encode()),
        }
        for p in pages
    ]
    comp_rows = [
        {"member_id": m, "component_id": c} for m, c in sorted(canon.items())
    ]
    return {
        "pages": pages,
        "alias_dict": dict_rows,
        "golden_triples": golden_triples,
        "golden_text": golden_text,
        "expected_components": comp_rows,
    }


def _golden_triples(
    pages: list[dict],
    by_alias: dict[str, list[Entity]],
    canon: dict[str, str],
) -> list[dict]:
    """Pure-python pipeline spec: detect -> link (best prior, tie-break min
    entity id) -> canonicalize -> emit mentions / co_occurs_with /
    typed_as / linked_to."""
    rgx = re.compile(MENTION_REGEX)
    triples: set[tuple] = set()
    mentioned_types: dict[str, str] = {}

    for p in pages:
        if p["lang"] not in TARGET_LANGS:
            continue
        for sent_idx, sent in enumerate(split_sentences_py(p["text"])):
            eids = []
            for m in rgx.findall(sent):
                alias_norm = m.lower()
                cands = by_alias.get(alias_norm)
                if cands:
                    # link rule: highest prior, tie-break min entity id
                    best = sorted(cands, key=lambda e: (-e.prior, e.eid))[0]
                    eid = canon[best.eid]
                    mentioned_types[eid] = best.entity_type
                else:
                    eid = inferred_id_py(alias_norm)
                    mentioned_types[eid] = "UNKNOWN"
                eids.append(eid)
                triples.add((p["url"], "mentions", eid, p["url"], sent_idx))
            for a_i in range(len(eids)):
                for b_i in range(a_i + 1, len(eids)):
                    a, b = sorted((eids[a_i], eids[b_i]))
                    if a != b:
                        triples.add((a, "co_occurs_with", b, p["url"], sent_idx))

    for eid, typ in mentioned_types.items():
        triples.add((eid, "typed_as", typ, None, None))
    for member, c in canon.items():
        if member != c:
            triples.add((member, "linked_to", c, None, None))

    return [
        {"subj": s, "pred": pr, "obj": o, "url": u, "sent_idx": si}
        for (s, pr, o, u, si) in sorted(triples, key=lambda t: tuple(str(x) for x in t))
    ]
