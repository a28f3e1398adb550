"""Python UDTFs (SURVEY.md §2.10, Spark 4 user-defined TABLE functions).

The reference's per-row expansion scripts (one input row -> many output
rows, e.g. a scraped page exploding into events) map to Spark 4's Python
UDTF surface: a class whose ``eval`` yields rows, invocable from SQL with
``LATERAL``. This is the sanctioned integration point for row-expanding
Python logic that doesn't fit a scalar UDF — still Python (keep it OFF the
relational hot path; explode(split()) covers the pure-SQL cases), but
Arrow-batched when ``spark.sql.execution.pythonUDTF.arrow.enabled`` is on,
and partition-parallel like any projection.

``ChunkWords`` is the demonstration op: document -> one row per
``chunk_size``-word window (non-overlapping) — the context-window chunking
step that turns curated documents into training/embedding samples. Split
semantics are deterministic and oracle-reproducible (``\\S+`` word runs =
str.split in Python, regexp_extract_all in DuckDB; 1-based chunk index),
so even the Python path carries a cell-exact DuckDB gate.

``SplitSentences`` (split on ``[.!?]+``) shares the same contract for
punctuated corpora.

Both UDTFs run Arrow-optimized (``useArrow=True``): the row expansion
crosses the JVM/Python boundary as Arrow batches (ArrowEvalPythonUDTF in
the plan), not pickled rows — the same rule every other Python kernel in
this package follows, enforced registry-wide by
tests/test_plans.py::test_no_cartesian_or_row_python_anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SPLIT = re.compile(r"[.!?]+")
_WORD = re.compile(r"\S+")
_TRIMCHARS = " \t\n\r"

CHUNK_SIZE = 32


@udtf(returnType="chunk_idx int, chunk string, n_words int", useArrow=True)
class ChunkWords:
    """One row per non-overlapping CHUNK_SIZE-word window of the text."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        words = _WORD.findall(text or "")
        for c in range(0, len(words), CHUNK_SIZE):
            piece = words[c : c + CHUNK_SIZE]
            yield c // CHUNK_SIZE + 1, " ".join(piece), len(piece)


@udtf(returnType="sent_idx int, sentence string, n_words int", useArrow=True)
class SplitSentences:
    """One row per non-empty sentence of the input text."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        idx = 0
        for part in _SPLIT.split(text or ""):
            part = part.strip(_TRIMCHARS)
            if part:
                idx += 1
                yield idx, part, len(_WORD.findall(part))


def register_udtfs(spark) -> None:
    """Idempotently register every UDTF on the session."""
    spark.udtf.register("chunk_words", ChunkWords)
    spark.udtf.register("split_sentences", SplitSentences)
