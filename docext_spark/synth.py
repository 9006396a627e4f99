"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Seeded (default 42, matching driver testdata convention) — same args always
produce byte-identical tables. Produces the input_hint shape:

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Payload mix: html 40%, pdf_text 20%, md_table 15%, json_payload 10%,
plain 15%. One hot conversation gets ~50× the median turn count (skew
exercise for the segmented reassembly path).

Rows are emitted in shuffled order — correct ordering must be restored by
the window over (conv_id, turn_idx), never by read order.
"""
from __future__ import annotations

import datetime as dt
import random

_WORDS = ("ledger invoice total amount shipment carrier contract clause party "
          "witness signature payment schedule balance account transfer audit "
          "report quarter revenue margin forecast region customer order item "
          "quantity price discount tax summary analysis the a of to in and is "
          "for with on it this that").split()

_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)


def _sentence(rng: random.Random, lo=5, hi=14) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def _html_payload(rng: random.Random) -> str:
    nav_links = "".join(f'<a href="/x{i}">{rng.choice(_WORDS)}</a> '
                        for i in range(rng.randint(3, 6)))
    paras = "".join(f"<p>{_sentence(rng)}</p>" for _ in range(rng.randint(2, 4)))
    linkfarm = "".join(f'<a href="/l{i}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>, '
                       for i in range(rng.randint(4, 8)))
    table = ""
    if rng.random() < 0.5:
        rs = ' rowspan="2"' if rng.random() < 0.3 else ""
        table = (f"<table><tr><th>item</th><th>qty</th></tr>"
                 f"<tr><td{rs}>{rng.choice(_WORDS)}</td><td>{rng.randint(1, 99)}</td></tr>"
                 f"<tr><td>{rng.choice(_WORDS)}</td><td>{rng.randint(1, 99)}</td></tr></table>")
    checkbox = ('<p>approved <input type="checkbox" checked> rejected '
                '<input type="checkbox"></p>') if rng.random() < 0.3 else ""
    watermark = (f'<div class="watermark">{rng.choice(_WORDS).upper()}</div>'
                 if rng.random() < 0.2 else "")
    pageno = (f'<span class="pageno">{rng.randint(1, 40)}</span>'
              if rng.random() < 0.2 else "")
    return (f"<html><head><style>.x{{color:red}}</style>"
            f"<script>var t={rng.randint(0, 9)};</script></head><body>"
            f"<nav>{nav_links}</nav>"
            f"{watermark}<h1>{_sentence(rng, 2, 5)}</h1>"
            f"{paras}{table}{checkbox}{pageno}"
            f"<div>{linkfarm}</div>"
            f"<footer>&copy; 2026 {rng.choice(_WORDS)}</footer></body></html>")


def _pdf_payload(rng: random.Random) -> str:
    lines = []
    n_pages = rng.randint(1, 3)
    for p in range(1, n_pages + 1):
        for b in range(rng.randint(2, 5)):
            lines.append(f"{p}|{b * 100 + rng.randint(0, 40)}|{rng.randint(0, 300)}|"
                         f"{_sentence(rng, 3, 8)}")
    rng.shuffle(lines)
    return "\n".join(lines)


def _md_table_payload(rng: random.Random) -> str:
    rows = "\n".join(f"| {rng.choice(_WORDS)} | {rng.randint(1, 500)} |"
                     for _ in range(rng.randint(2, 5)))
    return (f"{_sentence(rng)}\n\n| name | value |\n|---|---|\n{rows}\n\n"
            f"{_sentence(rng)}")


def _json_payload(rng: random.Random) -> str:
    obj = (f'{{"tool": "{rng.choice(("browser", "shell", "pdf_reader"))}", '
           f'"status": {rng.randint(0, 1)}, "items": [{rng.randint(1, 9)}, '
           f'{rng.randint(10, 99)}]}}')
    roll = rng.random()
    if roll < 0.3:  # trailing comma
        obj = obj[:-1] + ",}"
    elif roll < 0.5:  # single quotes
        obj = obj.replace('"', "'")
    return obj


def _plain_payload(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.05:
        return ""
    if roll < 0.1:
        return "   \n  "
    return "invoice_number: INV-%04d\ninvoice_date: 2026-0%d-1%d\n%s" % (
        rng.randint(1, 9999), rng.randint(1, 9), rng.randint(0, 9),
        _sentence(rng)) if roll < 0.4 else _sentence(rng, 8, 30)


_KIND_MAKERS = [("html", _html_payload, 0.40), ("pdf_text", _pdf_payload, 0.20),
                ("md_table", _md_table_payload, 0.15),
                ("json_payload", _json_payload, 0.10),
                ("plain", _plain_payload, 0.15)]
_ROLES = ["user", "assistant", "tool"]


def generate_transcripts(n_convs: int = 100, median_turns: int = 8,
                         seed: int = 42, hot_factor: int = 50) -> list[dict]:
    """Generate transcript rows (list of dicts, shuffled order)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for c in range(n_convs):
        conv_id = f"conv_{c:06d}"
        n_turns = median_turns * hot_factor if c == 0 else rng.randint(
            max(2, median_turns // 2), median_turns * 2)
        for t in range(n_turns):
            role = _ROLES[t % 3]
            roll = rng.random()
            acc = 0.0
            for _kind, maker, w in _KIND_MAKERS:
                acc += w
                if roll < acc:
                    text = maker(rng)
                    break
            rows.append({
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": rng.choice(("browser", "pdf_reader", "shell"))
                        if role == "tool" else "",
                "ts": _BASE_TS + dt.timedelta(minutes=t),
            })
    rng.shuffle(rows)  # ordering must be restored by window, not read order
    return rows


def transcripts_df(spark, n_convs: int = 100, median_turns: int = 8,
                   seed: int = 42, hot_factor: int = 50, partitions: int = 32):
    """Spark DataFrame carrier for the synthetic transcripts."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    rows = generate_transcripts(n_convs, median_turns, seed, hot_factor)
    return spark.createDataFrame(rows, schema=schema).repartition(partitions)
