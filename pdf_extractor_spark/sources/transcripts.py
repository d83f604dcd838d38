"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Every turn is a pure function of (seed, conv_numeric_id, turn_idx), so the
same rows can be produced driver-side (pure Python, for goldens) and
distributed (mapInPandas over spark.range, for benchmarks at any scale) with
byte-identical content. Heavy-tailed turns-per-conversation exercises skew
handling; the generator shuffles the row order so stable-ordering windows are
actually load-bearing.

~10% of assistant turns embed a payload: a paged pseudo-PDF (base64,
``%PDF`` magic, ``# Page n`` sections, optional TOC outline), an HTML
document with boilerplate, or a layout-JSON document (base64 JSON of
positioned blocks, read back by coordinate reading order) — the three
non-plain dialects the F2 router dispatches to different kernels.
"""
from __future__ import annotations

import base64
import datetime as dt
import random
from typing import Dict, Iterator, List

import pandas as pd

from ..config import MARKDOWN_SECTION_SEPARATOR
from ..kernels.segment import PDF_PAYLOAD_PREFIX

_BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "balance account total payment transaction revenue expense statement "
    "report summary credit debit amount transfer deposit withdrawal bank "
    "customer invoice ledger quarterly annual audit asset liability equity"
).split()

_FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()

_TITLES = ["Financial Reports", "Trial Balance", "Bank Statements", "Summary",
           "דוחות כספיים", "דוח דירקטוריון", "תקציר"]


def _sentence(rng: random.Random, n: int, vocab: List[str]) -> str:
    return " ".join(rng.choice(vocab) for _ in range(n))


def _make_table(rng: random.Random, rows: int, with_numbers: bool = True) -> str:
    lines = ["| Date | Description | Amount | Balance |",
             "| --- | --- | --- | --- |"]
    balance = rng.randint(1000, 100000) / 10.0
    for i in range(rows):
        amount = rng.randint(100, 50000) / 100.0
        balance = balance + amount if rng.random() < 0.5 else balance - amount
        if with_numbers:
            lines.append(
                f"| 0{1 + i % 9}.0{1 + i % 9}.2025 | {rng.choice(_WORDS)} "
                f"| {amount:,.2f} | {balance:,.2f} |"
            )
        else:
            lines.append(f"| {rng.choice(_WORDS)} | {rng.choice(_WORDS)} |  |  |")
    return "\n".join(lines)


def _make_page(rng: random.Random, page_num: int) -> str:
    """One pseudo-PDF page: heading + paragraphs + usually a table. A slice of
    pages is deliberately degenerate to exercise the detectors."""
    roll = rng.random()
    if roll < 0.05:  # very short page -> low_content_density
        return f"# Page {page_num}\n\n{_sentence(rng, 3, _WORDS)}"
    if roll < 0.08:  # empty-table page
        empties = "\n".join("|  |  |  |" for _ in range(6))
        return (f"# Page {page_num}\n\n| A | B | C |\n| --- | --- | --- |\n"
                + empties)
    if roll < 0.11:  # repetitive numbers
        n = rng.randint(100, 9999)
        return (f"# Page {page_num}\n\n"
                + _sentence(rng, 30, _WORDS) + f"\n\n| {n} | {n} | {n} |\n"
                + _sentence(rng, 30, _WORDS))
    if roll < 0.14:  # markdown image page -> the image-aware repair route
        fig = rng.randint(1, 99)
        # deliberately messy: trailing whitespace + blank runs around the
        # image ref, so the image-aware repair has real work and its
        # byte-exact-image / repaired-prose split is observable
        return (f"# Page {page_num}   \n\n\n"
                + _sentence(rng, rng.randint(10, 25), _WORDS) + "  \n\n\n\n"
                + f"![chart {fig}](figures/fig_{fig}.png)  \n\n\n"
                + _sentence(rng, rng.randint(10, 25), _WORDS))
    parts = [f"# Page {page_num}", _sentence(rng, rng.randint(20, 60), _WORDS)]
    if rng.random() < 0.7:
        parts.append(_make_table(rng, rng.randint(3, 12)))
    if rng.random() < 0.3:
        parts.append(_sentence(rng, rng.randint(20, 50), _FILLER))
    return "\n\n".join(parts)


def make_pdf_payload(rng: random.Random) -> str:
    """Base64 pseudo-PDF with 1-40 pages and an optional 2-6-entry TOC."""
    n_pages = 1 + int(39 * (rng.random() ** 2))
    toc = ""
    if n_pages > 15 and rng.random() < 0.7:
        n_outlines = rng.randint(2, 6)
        starts = sorted(rng.sample(range(n_pages), min(n_outlines, n_pages)))
        toc = "\n".join(
            f"== {rng.choice(_TITLES)} @ page {p} ==" for p in starts
        ) + "\n"
    pages = [_make_page(rng, i + 1) for i in range(n_pages)]
    raw = "%PDF-1.7\n" + toc + MARKDOWN_SECTION_SEPARATOR.join(pages)
    return PDF_PAYLOAD_PREFIX + base64.b64encode(raw.encode("utf-8")).decode("ascii")


def make_layout_payload(rng: random.Random) -> str:
    """Base64 layout-JSON payload (FIXTURES.md §1c): 1-8 pages of positioned
    blocks. Columns are generated in order then SHUFFLED, so the kernel's
    coordinate-based reading-order reconstruction is load-bearing; a footer
    block exercises the layout-level boilerplate drop."""
    import json

    from ..kernels.layout import LAYOUT_PAYLOAD_PREFIX

    n_pages = 1 + int(7 * (rng.random() ** 2))
    pages = []
    for p in range(n_pages):
        blocks = [{
            "x": 72, "y": 40, "w": 300, "h": 18,
            "role": "title", "text": rng.choice(_TITLES),
        }]
        two_col = rng.random() < 0.5
        for col_x in ([72, 320] if two_col else [72]):
            y = 80
            for _ in range(rng.randint(1, 4)):
                role = "table" if rng.random() < 0.25 else "paragraph"
                text = (
                    _make_table(rng, rng.randint(2, 5)) if role == "table"
                    else _sentence(rng, rng.randint(10, 40), _WORDS + _FILLER)
                )
                blocks.append({
                    "x": col_x, "y": y, "w": 220, "h": 60,
                    "role": role, "text": text,
                })
                y += rng.randint(70, 120)
        if rng.random() < 0.5:
            blocks.append({
                "x": 72, "y": 760, "w": 400, "h": 12,
                "role": "footer", "text": f"page {p + 1} — confidential",
            })
        rng.shuffle(blocks)
        pages.append({"number": p + 1, "width": 612, "blocks": blocks})
    raw = json.dumps({"pages": pages})
    return LAYOUT_PAYLOAD_PREFIX + base64.b64encode(
        raw.encode("utf-8")
    ).decode("ascii")


def make_html_payload(rng: random.Random) -> str:
    nav_links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(_WORDS, 6)
    )
    main_paras = "".join(
        f"<p>{_sentence(rng, rng.randint(15, 40), _WORDS + _FILLER)}</p>"
        for _ in range(rng.randint(2, 6))
    )
    return (
        "<html><head><title>doc</title><style>body{margin:0}</style></head>"
        f"<body><nav>{nav_links}</nav><header><a href='/'>home</a></header>"
        f"<div id='main'>{main_paras}</div>"
        f"<footer>{nav_links}</footer></body></html>"
    )


def conv_turns(conv_num: int, seed: int = 42) -> List[Dict]:
    """All turns of one conversation — pure function of (seed, conv_num)."""
    rng = random.Random(f"{seed}:{conv_num}")
    n_turns = 1 + int(199 * (rng.random() ** 4))  # heavy-tailed 1..200
    conv_id = f"conv_{conv_num:08d}"
    rows = []
    for turn_idx in range(n_turns):
        role = ("user", "assistant", "tool")[
            0 if turn_idx % 2 == 0 else (2 if rng.random() < 0.1 else 1)
        ]
        tool = rng.choice(["search", "calculator", "browser"]) if role == "tool" else None
        if role == "assistant" and rng.random() < 0.10:
            roll = rng.random()
            payload = (
                make_pdf_payload(rng) if roll < 0.55
                else make_html_payload(rng) if roll < 0.8
                else make_layout_payload(rng)
            )
            text = _sentence(rng, 8, _WORDS) + " " + payload
        else:
            text = _sentence(rng, rng.randint(5, 60), _WORDS + _FILLER)
        rows.append({
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": _BASE_TS + dt.timedelta(minutes=turn_idx),
        })
    # Shuffle row order so downstream stable-ordering logic is exercised.
    rng.shuffle(rows)
    return rows


def generate_local(n_convs: int, seed: int = 42) -> List[Dict]:
    """Driver-side generation (goldens / small tests)."""
    out: List[Dict] = []
    for c in range(n_convs):
        out.extend(conv_turns(c, seed))
    return out


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_df(spark, n_convs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: one task generates a slice of conversations via
    mapInPandas over spark.range — scales to any corpus size with no driver
    materialization, and produces rows byte-identical to generate_local."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism * 2, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_num in pdf["id"]:
                rows.extend(conv_turns(int(conv_num), seed))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "role", "text", "tool", "ts",
            ])

    return (
        spark.range(n_convs).repartition(partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )
