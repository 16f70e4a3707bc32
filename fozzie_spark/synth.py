"""Deterministic synthetic corpus of interleaved text+media documents.

Generates the BASELINE.json input_hint shape:
    (doc_id string, spans array<struct<kind string, text string,
                                       media_ref string, offset int>>)
plus a ground-truth `entity_id` for F1 evaluation.

Entity clusters follow the reference vignette's mutation protocol
(vignettes/overview.Rmd:55-63): each entity has a base text and 1..4
variants produced by single-character edits, so true matches sit within a
small edit/jaccard distance of each other.

Generation is fully distributed and seed-deterministic: `spark.range` over
(entity, variant) ids -> mapInPandas, each row derived from a counter-based
RNG keyed on (seed, entity, variant). No driver-side data, no shuffle.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
DOC_SCHEMA = f"doc_id string, entity_id long, spans {SPAN_SCHEMA}"

# fixed vocabulary: F1/F2 names + a DICTIONARY-like word pool (seeded, public)
_NAMES = [
    "liam", "noah", "oliver", "theodore", "james", "olivia", "emma", "amelia",
    "charlotte", "mia", "sophia", "isabella", "ava", "evelyn", "luna", "harper",
]
_ALPHABET = "abcdefghijklmnopqrstuvwxyz"

#: procedural vocabulary — a realistic corpus has a LARGE vocabulary (and
#: therefore a long-tailed q-gram document-frequency distribution, which is
#: what makes inverted-index blocking sub-quadratic). A small fixed pool
#: would make every q-gram hot and any blocking scheme quadratic. Vocabulary
#: grows with corpus size (Heaps' law): see `_vocab_size`.
VOCAB_SIZE = 5000


def _vocab_size(n_entities: int) -> int:
    return max(VOCAB_SIZE, n_entities)


from functools import lru_cache


@lru_cache(maxsize=1 << 20)
def _word(i: int) -> str:
    rng = random.Random(0xF022EE ^ (i * 2654435761))
    return "".join(rng.choice(_ALPHABET) for _ in range(rng.randint(4, 9)))


def _base_text(rng: random.Random, vocab: int) -> str:
    n = rng.randint(5, 10)
    words = [rng.choice(_NAMES)] + [_word(rng.randrange(vocab)) for _ in range(n - 1)]
    return " ".join(words)


def _mutate(text: str, rng: random.Random, n_edits: int) -> str:
    """Apply n single-character edits (sub/insert/delete/adjacent-swap)."""
    s = list(text)
    for _ in range(n_edits):
        if not s:
            break
        op = rng.randint(0, 3)
        i = rng.randrange(len(s))
        if op == 0:
            s[i] = rng.choice(_ALPHABET)
        elif op == 1:
            s.insert(i, rng.choice(_ALPHABET))
        elif op == 2 and len(s) > 1:
            del s[i]
        elif i + 1 < len(s):
            s[i], s[i + 1] = s[i + 1], s[i]
    return "".join(s)


def n_variants(entity: int, seed: int) -> int:
    return 1 + random.Random((seed << 20) ^ entity).randint(0, 3)


def make_doc(entity: int, variant: int, seed: int, vocab: int = VOCAB_SIZE) -> tuple[str, int, list]:
    """Deterministic document for (entity, variant): counter-based RNG."""
    base_rng = random.Random((seed << 40) ^ (entity << 8))
    text = _base_text(base_rng, vocab)
    if variant > 0:
        vrng = random.Random((seed << 40) ^ (entity << 8) ^ variant)
        text = _mutate(text, vrng, n_edits=vrng.randint(1, 2))

    # split into 1-4 text spans, interleave 0-2 media spans
    srng = random.Random((seed << 40) ^ (entity << 8) ^ (variant << 4) ^ 0xA5)
    words = text.split(" ")
    cuts = sorted(srng.sample(range(1, len(words)), min(srng.randint(0, 3), len(words) - 1))) if len(words) > 1 else []
    pieces, prev = [], 0
    for c in cuts + [len(words)]:
        pieces.append(" ".join(words[prev:c]))
        prev = c

    spans, offset = [], 0
    for k, piece in enumerate(pieces):
        if srng.random() < 0.4:
            kind = srng.choice(["image", "audio"])
            ref = f"media://{kind}/{entity:08d}/{variant}/{k}"
            spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": offset})
        spans.append({"kind": "text", "text": piece, "media_ref": None, "offset": offset})
        offset += len(piece) + 1
    doc_id = f"doc-{entity:010d}-{variant}"
    return doc_id, entity, spans


def synth_documents(
    spark: SparkSession, n_entities: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: ~2.5 docs/entity on average."""
    max_v = 4
    vocab = _vocab_size(n_entities)
    base = spark.range(0, n_entities * max_v, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                entity, variant = divmod(int(i), max_v)
                if variant >= n_variants(entity, seed):
                    continue
                rows.append(make_doc(entity, variant, seed, vocab))
            yield pd.DataFrame(rows, columns=["doc_id", "entity_id", "spans"])

    return base.mapInPandas(gen, DOC_SCHEMA)


def doc_text_key(spans_col: str = "spans"):
    """The pipeline join key: ordered concatenation of text-span texts.

    Array order IS span order (offsets ascending by construction); media
    spans contribute nothing. Single JVM-side expression — no UDF.
    """
    from pyspark.sql import functions as F

    return F.array_join(
        F.transform(
            F.filter(F.col(spans_col), lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )
