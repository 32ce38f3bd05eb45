"""Deterministic synthetic Common-Crawl-style web-page corpus.

Produces a parquet table with the exact ``BASELINE.json:input_hint`` schema:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Mirrors the reference's document model (title + abstract text,
``/root/reference/internal/domain/models/document.go:3-13``) rendered as web
pages. The ``text`` column is **defined as** ``extract_text(html)`` so the
per-row byte-identical extraction invariant holds by construction and is
re-verified by tests/test_corpus.py.

Design goals (FIXTURES.md §1):
- Zipfian vocabulary with deliberate head-term skew (top term in ~60% of
  docs) to exercise salting / skew handling;
- EN (90%) + RU (10%) pages; numeric tokens; mixed-case; punctuation;
  multi-byte Cyrillic tokens (byte-length min-length semantics); rare
  21-digit numerics (Go ParseUint overflow → non-numeric).

Everything is seeded (seed=42): same inputs → same bytes.
"""

from __future__ import annotations

import argparse
import html as _htmllib
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fts_engine_spark.extract import extract_text  # noqa: E402

SEED = 42

_EN_BASES = [
    "turtle", "search", "engine", "index", "query", "token", "filter",
    "hotel", "river", "mountain", "castle", "bridge", "garden", "market",
    "station", "library", "museum", "theater", "harbor", "village",
    "history", "culture", "science", "physics", "chemistry", "biology",
    "computer", "network", "system", "process", "memory", "storage",
    "nation", "government", "election", "economy", "industry", "company",
    "music", "painting", "novel", "poetry", "festival", "tradition",
    "weather", "climate", "forest", "desert", "island", "ocean",
    "football", "running", "swimming", "cycling", "championship",
    "recipe", "cooking", "bread", "cheese", "coffee", "dinner",
    "doctor", "hospital", "medicine", "disease", "treatment",
    "school", "student", "teacher", "lesson", "education",
    "travel", "journey", "ticket", "airport", "luggage",
    "beauty", "beautiful", "generate", "general", "relation", "national",
    "connect", "connection", "create", "creation", "operate", "operation",
    "happy", "happiness", "quick", "quickly", "strong", "strongly",
    "build", "building", "meet", "meeting", "run", "inning", "proceed",
    "french", "german", "russian", "italian", "spanish", "english",
]
_EN_SUFFIXES = ["", "s", "ing", "ed", "ly", "ness", "ation", "er", "est"]

_RU_BASES = [
    "машина", "поезд", "город", "река", "гора", "замок", "мост", "сад",
    "рынок", "станция", "библиотека", "музей", "театр", "гавань", "деревня",
    "история", "культура", "наука", "физика", "химия", "биология",
    "компьютер", "сеть", "система", "процесс", "память", "хранилище",
    "музыка", "картина", "роман", "поэзия", "фестиваль", "традиция",
    "погода", "климат", "лес", "пустыня", "остров", "океан", "год",
    "школа", "студент", "учитель", "урок", "образование", "красивый",
]
_RU_SUFFIXES = ["", "ы", "ов", "ами", "ом", "е", "у"]

_EN_FILLER = [
    "the", "was", "in", "of", "a", "and", "to", "with", "for", "on",
    "is", "at", "by", "from", "as", "it", "that", "this",
]
_RU_FILLER = ["и", "в", "не", "на", "с", "был", "быть", "что", "как", "по"]


def _build_vocab(bases: list[str], suffixes: list[str], rng: random.Random) -> list[str]:
    vocab: list[str] = []
    for b in bases:
        for s in suffixes:
            w = b + s
            if len(w) >= 2:
                vocab.append(w)
    # dedupe preserving order
    seen: set[str] = set()
    out = []
    for w in vocab:
        if w not in seen:
            seen.add(w)
            out.append(w)
    rng.shuffle(out)
    return out


def _zipf_weights(n: int, s: float = 1.07) -> list[float]:
    return [1.0 / (i + 1) ** s for i in range(n)]


def _sentence(rng: random.Random, vocab: list[str], weights: list[float],
              filler: list[str], lang: str) -> str:
    n = rng.randint(5, 14)
    words = rng.choices(vocab, weights=weights, k=n)
    # interleave filler/stopwords and the occasional number
    out: list[str] = []
    for w in words:
        if rng.random() < 0.35:
            out.append(rng.choice(filler))
        if rng.random() < 0.06:
            out.append(str(rng.randint(0, 2100)))
        if rng.random() < 0.004:
            out.append(str(rng.randint(10**20, 10**21 - 1)))  # non-numeric per ParseUint
        out.append(w)
    if out:
        out[0] = out[0].capitalize()
    punct = rng.choice([".", ".", ".", "!", "?"])
    return " ".join(out) + punct


def gen_rows(n_docs: int, seed: int = SEED, min_sents: int = 2, max_sents: int = 8):
    rng = random.Random(seed)
    en_vocab = _build_vocab(_EN_BASES, _EN_SUFFIXES, rng)
    ru_vocab = _build_vocab(_RU_BASES, _RU_SUFFIXES, rng)
    en_w = _zipf_weights(len(en_vocab))
    ru_w = _zipf_weights(len(ru_vocab))
    head_term = "turtle"  # deliberate skew: appears in ~60% of EN docs

    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_docs):
        lang = "ru" if rng.random() < 0.10 else "en"
        vocab, w, filler = (
            (ru_vocab, ru_w, _RU_FILLER) if lang == "ru" else (en_vocab, en_w, _EN_FILLER)
        )
        n_sent = rng.randint(min_sents, max_sents)
        sents = [_sentence(rng, vocab, w, filler, lang) for _ in range(n_sent)]
        if lang == "en" and rng.random() < 0.60:
            sents.insert(rng.randrange(len(sents) + 1),
                         f"The {head_term} was seen near the {rng.choice(vocab)}.")
        title_words = rng.choices(vocab, weights=w, k=rng.randint(2, 4))
        title = " ".join(t.capitalize() for t in title_words)
        body = " ".join(sents)
        html = (
            "<html><head><title>{t}</title></head><body><h1>{t}</h1>"
            "<script>var tracker = 1;</script>"
            "<p>{b}</p></body></html>"
        ).format(t=_htmllib.escape(title), b=_htmllib.escape(body)).encode("utf-8")

        urls.append(f"https://site{i % 97}.example/wiki/Page_{i}")
        tss.append(t0 + timedelta(seconds=137 * i))
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(lang)
    return urls, tss, htmls, texts, langs


SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_corpus(
    path: str,
    n_docs: int,
    seed: int = SEED,
    min_sents: int = 2,
    max_sents: int = 8,
    chunk: int = 20_000,
) -> None:
    """Chunked write: bounded memory for large corpora; small row groups
    keep the single-file corpus splittable for parallel scans."""
    writer = pq.ParquetWriter(path, SCHEMA)
    try:
        done = 0
        part = 0
        while done < n_docs:
            n = min(chunk, n_docs - done)
            # per-chunk seed derived deterministically; urls offset by chunk
            urls, tss, htmls, texts, langs = gen_rows(
                n, seed + part * 7919, min_sents, max_sents
            )
            if part:
                urls = [u.replace("/wiki/Page_", f"/wiki/P{part}_") for u in urls]
                tss = [t + timedelta(seconds=done * 137) for t in tss]
            writer.write_table(
                pa.table(
                    {
                        "url": urls,
                        "warc_ts": tss,
                        "html": htmls,
                        "text": texts,
                        "lang": langs,
                    },
                    schema=SCHEMA,
                ),
                row_group_size=4096,
            )
            done += n
            part += 1
    finally:
        writer.close()


# Reference query set (FIXTURES.md §2): multi-term OR, single terms, a
# duplicated token (unique-match double-count quirk, engine.go:96-123),
# stopword-only, numeric, unknown terms, Russian, mixed-script, stem
# collisions (beauty/beautiful -> beauti).
REFERENCE_QUERIES: list[dict] = [
    {"query_id": 1, "query": "french hotel", "k": 10},
    {"query_id": 2, "query": "turtle", "k": 10},
    {"query_id": 3, "query": "hotel hotel", "k": 10},
    {"query_id": 4, "query": "the was", "k": 10},
    {"query_id": 5, "query": "1990", "k": 10},
    {"query_id": 6, "query": "zzzunknownzzz", "k": 10},
    {"query_id": 7, "query": "машины поездов", "k": 10},
    {"query_id": 8, "query": "history of the nation", "k": 10},
    {"query_id": 9, "query": "beauty", "k": 10},
    {"query_id": 10, "query": "beautiful", "k": 10},
    {"query_id": 11, "query": "search engine index", "k": 10},
    {"query_id": 12, "query": "Quick quickly quickness", "k": 10},
    {"query_id": 13, "query": "mountain river castle bridge", "k": 10},
    {"query_id": 14, "query": "running swimming", "k": 5},
    {"query_id": 15, "query": "машина города", "k": 10},
    {"query_id": 16, "query": "cars и машины", "k": 10},
    {"query_id": 17, "query": "2024", "k": 10},
    {"query_id": 18, "query": "education student teacher", "k": 20},
    {"query_id": 19, "query": "coffee dinner recipe", "k": 10},
    {"query_id": 20, "query": "connection creation operation", "k": 10},
    {"query_id": 21, "query": "turtle search", "k": 10},
    {"query_id": 22, "query": "Hotel", "k": 10},
    {"query_id": 23, "query": "german french italian spanish", "k": 10},
    {"query_id": 24, "query": "the the the turtle", "k": 10},
    {"query_id": 25, "query": "library museum", "k": 3},
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output parquet path")
    ap.add_argument("--docs", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=SEED)
    ap.add_argument("--min-sents", type=int, default=2)
    ap.add_argument("--max-sents", type=int, default=8)
    args = ap.parse_args()
    write_corpus(args.out, args.docs, args.seed, args.min_sents, args.max_sents)
    print(f"wrote {args.docs} docs -> {args.out}")


if __name__ == "__main__":
    main()
