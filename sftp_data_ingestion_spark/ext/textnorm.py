"""Unicode normalization audit — the NFC conformance pass a
multilingual corpus pipeline runs before hashing or deduplicating
text (two canonically-equivalent strings — 'é' composed vs
'e' + U+0301 decomposed — hash differently, so un-normalized corpora
silently under-deduplicate and double-count tokens).

Spark has no built-in Unicode-normalization expression, so this is an
honest vectorized-Python path: one Arrow ``mapInPandas`` kernel
(stdlib ``unicodedata``) computes per-document NFC flags; everything
downstream is plain relational aggregation. Same execution-path
discipline as the codec kernels in :mod:`ext.multimodal` — Arrow
batches, never row-pickled UDFs.

The DuckDB oracle twin is ``nfc_normalize()`` (utf8proc). Both
implement Unicode canonical composition; the planted fixtures stick
to long-stable codepoints (Latin letters + combining acute) where
every Unicode version agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def nfc_flags(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-document NFC conformance flags: returns
    ``(source, non_nfc, cp_delta)`` — 1 if the text is NOT in NFC
    form, and the signed codepoint delta under NFC (positive for the
    common composed-shorter case; composition exclusions such as
    U+0958 → U+0915 U+093C can make it negative).

    Scale shape: one Arrow-batched map over the scan (no shuffle, no
    driver traffic); callers aggregate the flags. At 100 TB this runs
    scan-local on every executor like any projection."""
    missing = [c for c in (text_col, group_col) if c not in df.columns]
    if missing:
        raise ValueError(
            f"nfc_flags: column(s) {missing} not in input "
            f"(have {df.columns})"
        )

    def fn(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            s = pdf[text_col]
            norm = s.map(
                lambda x: None
                if x is None
                else unicodedata.normalize("NFC", x)
            )
            yield pd.DataFrame(
                {
                    "source": pdf[group_col],
                    "non_nfc": (s != norm).astype("int32"),
                    "cp_delta": (
                        s.str.len() - norm.str.len()
                    ).fillna(0).astype("int64"),
                }
            )

    return df.mapInPandas(
        fn, "source string, non_nfc int, cp_delta long"
    )
