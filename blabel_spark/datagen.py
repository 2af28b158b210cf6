"""Deterministic synthetic transcript corpus with extraction ground truth.

Shape per the driver input_hint / FIXTURES.md §1:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp)``.  Seeded — the same (seed, n_convs) always produces the
same corpus byte-for-byte, so tests and benchmarks are reproducible and
extraction precision/recall is measurable against exact ground truth.

Entity model: organisations and cities are in the gazetteer (linkable →
IRIs); people are NOT (→ blank nodes, giving the bnode-rich graphs the
canonicalizer exists for).  Facts are embedded as rigid template sentences;
filler and distractor sentences (lowercase subjects, unknown verbs) are
interleaved and must NOT be extracted.
"""

from __future__ import annotations

import datetime as dt
import random

PEOPLE = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace",
          "Heidi", "Ivan", "Judy", "Mallory", "Niaj", "Olivia", "Peggy",
          "Rupert", "Sybil", "Trent", "Victor", "Walter", "Yolanda"]
ORGS = ["Acme", "Globex", "Initech", "Umbrella", "Hooli", "Stark",
        "Wayne", "Wonka"]
CITIES = ["Paris", "London", "Tokyo", "Berlin", "Madrid", "Oslo",
          "Lima", "Cairo"]
TOOLS = ["search", "calculator", "browser", "none"]

# relation → (subject domain, object domain)
RELATIONS = {
    "works at": ("person", "org"),
    "lives in": ("person", "city"),
    "knows": ("person", "person"),
    "visited": ("person", "city"),
    "founded": ("person", "org"),
}

FILLER = [
    "Thanks for the update.",
    "Let me check that for you.",
    "That sounds reasonable overall.",
    "Could you elaborate on the previous point?",
    "Here is the summary you requested.",
]
# distractors: must not match the extraction grammar
DISTRACTORS = [
    "alice works at acme.",                  # lowercase → not a mention
    "Bob maybe-knows Carol.",                # unknown relation
    "Paris is large.",                       # no relation phrase
    "Dave works at.",                        # missing object
]


def gazetteer() -> list[tuple[str, str]]:
    """(surface, iri) rows for linkable entities."""
    rows = [(o, f"<ent:org/{o.lower()}>") for o in ORGS]
    rows += [(c, f"<ent:city/{c.lower()}>") for c in CITIES]
    return rows


def term_for(surface: str) -> str:
    """Ground-truth term for a mention surface: gazetteer IRI or person
    bnode (conversation-scoped via graph_id at canonicalization time)."""
    if surface in ORGS:
        return f"<ent:org/{surface.lower()}>"
    if surface in CITIES:
        return f"<ent:city/{surface.lower()}>"
    return f"_:p_{surface.lower()}"


def pred_for(rel: str) -> str:
    return f"<rel:{rel.replace(' ', '_')}>"


def generate(seed: int = 42, n_convs: int = 100, turns_per_conv: int = 8,
             facts_per_turn: int = 2):
    """Returns (transcript_rows, truth_rows).

    transcript_rows: (conv_id, turn_idx, role, text, tool, ts)
    truth_rows: (conv_id, turn_idx, subj, pred, obj) — expected distinct
    triples per conversation graph.
    """
    rng = random.Random(seed)
    t0 = dt.datetime(2026, 1, 1)
    transcripts, truth = [], []
    for c in range(n_convs):
        conv_id = f"conv{seed}_{c:06d}"
        # each conversation uses a small cast so bnodes recur across turns
        cast = rng.sample(PEOPLE, k=rng.randint(2, 5))
        ts = t0 + dt.timedelta(minutes=c)
        for t in range(turns_per_conv):
            role = ("user", "assistant", "tool")[
                t % 3 if t % 3 < 2 or rng.random() < 0.3 else 1]
            tool = rng.choice(TOOLS) if role == "tool" else ""
            sentences = [rng.choice(FILLER)]
            if rng.random() < 0.25:
                sentences.append(rng.choice(DISTRACTORS))
            for _ in range(rng.randint(0, facts_per_turn)):
                rel = rng.choice(sorted(RELATIONS))
                dom, ran = RELATIONS[rel]
                subj = rng.choice(cast)
                if ran == "person":
                    others = [p for p in cast if p != subj]
                    if not others:
                        continue
                    obj = rng.choice(others)
                elif ran == "org":
                    obj = rng.choice(ORGS)
                else:
                    obj = rng.choice(CITIES)
                sentences.append(f"{subj} {rel} {obj}.")
                truth.append((conv_id, t, term_for(subj), pred_for(rel),
                              term_for(obj)))
            rng.shuffle(sentences)
            transcripts.append((conv_id, t, role, " ".join(sentences),
                                tool, ts + dt.timedelta(seconds=t * 30)))
    return transcripts, truth


TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")
TRUTH_SCHEMA = ("conv_id string, turn_idx int, subj string, pred string, "
                "obj string")


def transcripts_df(spark, seed: int = 42, n_convs: int = 100,
                   turns_per_conv: int = 8):
    rows, truth = generate(seed, n_convs, turns_per_conv)
    return (spark.createDataFrame(rows, TRANSCRIPT_SCHEMA),
            spark.createDataFrame(truth, TRUTH_SCHEMA))
