"""Deterministic, versioned HTML → text extractor.

The per-row invariant (BASELINE.json input_hint): extracted ``text``
must be byte-identical per ``url`` versus the reference table. The
extractor is a pure function of the html bytes — body innerText —
and is versioned so any change is an explicit, detectable event
(SURVEY.md §7 hard part 3).

Vectorized via pandas string ops inside mapInPandas (Arrow-batched).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

EXTRACTOR_VERSION = 1

_BODY_OPEN = b"<body>"
_BODY_CLOSE = b"</body>"


def extract_text_bytes(html: bytes) -> str:
    """Pure scalar extractor: UTF-8 text between <body> and </body>."""
    i = html.find(_BODY_OPEN)
    if i < 0:
        return ""
    j = html.find(_BODY_CLOSE, i)
    if j < 0:
        j = len(html)
    return html[i + len(_BODY_OPEN):j].decode("utf-8", errors="replace")


def extract_text_batch(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


def extracted_text_column(html):
    """Pure-Column twin of ``extract_text_bytes`` — JVM-side, no Arrow
    round-trip. Equality with the byte-level kernel holds because the
    fixture html is valid UTF-8 and '<body>' is ASCII: slicing the
    decoded string at the char positions locate() returns yields the
    same text as slicing the bytes then decoding (UTF-8 is
    self-synchronizing, so no code point spans the tag boundary).
    tests/test_pipeline.py asserts exact equality against the pandas
    kernel on the committed fixture."""
    from pyspark.sql import functions as F

    s = html.cast("string")
    i = F.instr(s, "<body>")                      # 1-based, 0 = absent
    j = F.call_function("locate", F.lit("</body>"), s, i)
    start = i + F.lit(len(_BODY_OPEN))
    end = F.when(j == 0, F.length(s) + 1).otherwise(j)
    return F.when(i == 0, F.lit("")).otherwise(
        F.substring(s, start, end - start))


def with_extracted_text(df, html_col: str = "html",
                        out_col: str = "extracted_text",
                        use_arrow: bool = False):
    if not use_arrow:
        from pyspark.sql import functions as F
        return df.withColumn(out_col,
                             extracted_text_column(F.col(html_col)))

    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    schema = f"{out_fields}, {out_col} string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            pdf[out_col] = extract_text_batch(pdf[html_col])
            yield pdf

    return df.mapInPandas(gen, schema=schema)
