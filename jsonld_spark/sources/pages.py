"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Shape fixed by BASELINE.json ``input_hint``:
``pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``.

Generation follows FIXTURES.md §1-2: skew-realistic URLs (~30% of rows
on a handful of mega-domains, exercising subject-key salting), 0-3
embedded ld+json blocks per page drawn from the JSON-LD 1.1 feature
templates, ``<base href>`` pages, ~2% malformed-JSON scripts, ~1%
unresolvable remote contexts (executor must emit an error row, never
fetch), plus cross-page sameAs links driving the entity-linking pass.

Pure pyarrow writer (no Spark needed) so tests and bench can materialize
any scale quickly and reproducibly (seeded RNG, no wall-clock reads).
"""

from __future__ import annotations

import datetime
import json
import random
import zlib

FIXTURE_CTX_V1 = "https://fixture.example/ctx/v1"
FIXTURE_CTX_PRODUCT = "https://fixture.example/ctx/product"
FIXTURE_CTX_SCOPED = "https://fixture.example/ctx/scoped"
ABSENT_CTX = "https://absent.example/ctx"

VOCAB = "http://vocab.example/"
SAME_AS = "http://schema.org/sameAs"

MEGA_DOMAINS = [f"https://mega{i}.example.com" for i in range(5)]


def build_context_cache_entries() -> dict[str, dict]:
    """Fixture remote contexts (broadcast to executors; FIXTURES.md §4)."""
    return {
        FIXTURE_CTX_V1: {
            "@context": {
                "@vocab": VOCAB,
                "name": VOCAB + "name",
                "knows": {"@id": VOCAB + "knows", "@type": "@id"},
                "age": {"@id": VOCAB + "age"},
            }
        },
        FIXTURE_CTX_PRODUCT: {
            "@context": {
                "@vocab": "http://schema.org/",
                "price": {
                    "@id": "http://schema.org/price",
                    "@type": "http://www.w3.org/2001/XMLSchema#double",
                },
                "sameAs": {"@id": "http://schema.org/sameAs", "@type": "@id"},
            }
        },
        FIXTURE_CTX_SCOPED: {
            "@context": {
                "@protected": True,
                "@vocab": VOCAB,
                "Person": {
                    "@id": VOCAB + "Person",
                    "@context": {"name": "http://person.example/name"},
                },
            }
        },
    }


def _person_inline(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {
            "@vocab": VOCAB,
            "knows": {"@id": VOCAB + "knows", "@type": "@id"},
        },
        "@id": ent,
        "@type": "Person",
        "name": f"Person {rng.randrange(10_000)}",
        "age": rng.randrange(18, 99),
        "address": {"street": f"{rng.randrange(999)} Main St", "zip": str(rng.randrange(99999))},
    }


def _product_remote(rng: random.Random, ent: str) -> dict:
    return {
        "@context": FIXTURE_CTX_PRODUCT,
        "@id": ent,
        "@type": "Product",
        "name": f"Widget {rng.randrange(10_000)}",
        "price": round(rng.uniform(0.5, 500.0), 2),
    }


def _article_list(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {
            "@vocab": VOCAB,
            "authors": {"@id": VOCAB + "authors", "@container": "@list"},
        },
        "@id": ent,
        "@type": "Article",
        "authors": [f"Author {rng.randrange(50)}" for _ in range(rng.randrange(1, 4))],
    }


def _lang_map(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {
            "@vocab": VOCAB,
            "label": {"@id": VOCAB + "label", "@container": "@language"},
        },
        "@id": ent,
        "label": {"en": "color", "de": "Farbe", "ja": "色"},
    }


def _index_map(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {
            "@vocab": VOCAB,
            "posts": {"@id": VOCAB + "posts", "@container": "@index"},
        },
        "@id": ent,
        "posts": {
            "2024": {"title": f"Post {rng.randrange(100)}"},
            "2025": {"title": f"Post {rng.randrange(100)}"},
        },
    }


def _reverse(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {
            "@vocab": VOCAB,
            "children": {"@reverse": VOCAB + "parent"},
        },
        "@id": ent,
        "children": [{"@id": ent + "/child"}],
    }


def _named_graph(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {"@vocab": VOCAB},
        "@id": ent + "/graph",
        "@graph": [{"@id": ent, "claim": f"c{rng.randrange(100)}"}],
    }


def _edge_values(rng: random.Random, ent: str) -> dict:
    return {
        "@context": {
            "@vocab": VOCAB,
            "meta": {"@id": VOCAB + "meta", "@type": "@json"},
        },
        "@id": ent,
        "ratio": rng.random(),
        "big": 10.0 ** rng.randrange(20, 24),
        "count": rng.randrange(1_000_000),
        "flag": rng.random() < 0.5,
        "meta": {"b": 1, "a": [True, None]},
    }


def _same_as(rng: random.Random, ent: str) -> dict:
    # link this entity to its canonical twin on another domain
    # zlib.crc32, NOT hash(): Python's hash() is randomized per process
    # (PYTHONHASHSEED), which would silently break the generator's
    # determinism guarantee across runs
    twin = f"https://canonical.example/entity/{zlib.crc32(ent.encode()) % 1000}"
    return {
        "@context": FIXTURE_CTX_PRODUCT,
        "@id": ent,
        "@type": "Product",
        "name": "Linked product",
        "sameAs": twin,
    }


_TEMPLATES = [
    _person_inline,
    _product_remote,
    _article_list,
    _lang_map,
    _index_map,
    _reverse,
    _named_graph,
    _edge_values,
    _same_as,
]

_LANGS = ["en", "en", "en", "de", "ja", "fr", "x!!bad"]


def gen_page(
    i: int, rng: random.Random, scriptless_frac: float = 0.0
) -> tuple[str, datetime.datetime, bytes, str, str]:
    # URL skew: ~30% mega-domains
    if rng.random() < 0.30:
        domain = MEGA_DOMAINS[rng.randrange(len(MEGA_DOMAINS))]
    else:
        domain = f"https://site-{i}.example.org"
    url = f"{domain}/page/{i}"
    ent = f"{domain}/entity/{i}"
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)
    if scriptless_frac and rng.random() < scriptless_frac:
        # crawl-realistic no-JSON-LD page: bulkier body (real pages
        # average tens of KB), zero ld+json — exercises the JVM
        # pre-filter A/B (KGPipeline.extract skip_scriptless)
        filler = f"<p>Paragraph {i} filler content of ordinary prose.</p>" * 200
        text = f"Plain page {i} on {domain}."
        html = (
            f"<!DOCTYPE html><html><head><title>Page {i}</title></head>"
            f"<body><p>{text}</p>{filler}</body></html>"
        ).encode("utf-8")
        return url, ts, html, text, _LANGS[i % len(_LANGS)]
    n_scripts = rng.choices([0, 1, 2, 3], weights=[5, 55, 30, 10])[0]
    scripts = []
    for s in range(n_scripts):
        r = rng.random()
        if r < 0.02:
            body = '{"@context": {"@vocab": "http://vocab.example/", "broken": '  # malformed
        elif r < 0.03:
            body = json.dumps({"@context": ABSENT_CTX, "@id": ent, "p": "v"})
        else:
            tmpl = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
            body = json.dumps(tmpl(rng, ent if s == 0 else f"{ent}/s{s}"))
        scripts.append(f'<script type="application/ld+json">{body}</script>')
    base_tag = (
        f'<base href="{domain}/base/">' if rng.random() < 0.10 else ""
    )
    text = f"Extracted text of page {i} on {domain}."
    html = (
        f"<!DOCTYPE html><html><head>{base_tag}<title>Page {i}</title>"
        + "".join(scripts)
        + f"</head><body><p>{text}</p></body></html>"
    ).encode("utf-8")
    lang = _LANGS[i % len(_LANGS)]
    return url, ts, html, text, lang


def generate_pages(n_rows: int, seed: int = 42, scriptless_frac: float = 0.0):
    """Yield page tuples deterministically.  ``scriptless_frac`` mixes
    in crawl-realistic no-JSON-LD pages (default 0.0 keeps every
    historical corpus byte-identical)."""
    rng = random.Random(seed)
    for i in range(n_rows):
        yield gen_page(i, rng, scriptless_frac)


def _rows_to_table(rows):
    import pyarrow as pa

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for url, ts, html, text, lang in rows:
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(
    path: str, n_rows: int, seed: int = 42, n_files: int = 1,
    scriptless_frac: float = 0.0,
) -> str:
    """Write the synthetic crawl.  ``n_files > 1`` writes a directory of
    part files so a Spark scan gets parallel splits out of the box (a
    100 TB crawl has thousands of splits; one small local file does not).
    Content is identical regardless of ``n_files``."""
    import os

    import pyarrow.parquet as pq

    gen = generate_pages(n_rows, seed, scriptless_frac)
    if n_files <= 1:
        pq.write_table(_rows_to_table(gen), path)
        return path
    os.makedirs(path, exist_ok=True)
    per = (n_rows + n_files - 1) // n_files
    buf = []
    idx = 0
    for row in gen:
        buf.append(row)
        if len(buf) >= per:
            pq.write_table(_rows_to_table(buf), os.path.join(path, f"part-{idx:05d}.parquet"))
            buf, idx = [], idx + 1
    if buf:
        pq.write_table(_rows_to_table(buf), os.path.join(path, f"part-{idx:05d}.parquet"))
    return path


def ensure_pages(
    path: str, n_rows: int, seed: int = 42, n_files: int = 1,
    scriptless_frac: float = 0.0,
) -> str:
    """Materialize once; reuse across test sessions.

    Atomic: written under a temp name and renamed into place — an
    existence-only guard over an incremental write would silently reuse
    a TRUNCATED directory forever after an interrupted materialization
    (bench numbers claiming 3.2M rows over 500k actual)."""
    import os

    if not os.path.exists(path):
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        write_pages_parquet(
            tmp, n_rows, seed, n_files=n_files,
            scriptless_frac=scriptless_frac,
        )
        os.rename(tmp, path)
    return path
