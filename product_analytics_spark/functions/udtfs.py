"""Python UDTF surface (SURVEY.md §2.10).

The reference has NO runtime UDFs/UDTFs (pure SQL + compile-time Jinja
macros — macros/generate_schema_name.sql:1-13), and this engine keeps
the hot path entirely inside Catalyst built-ins for the same reason.
This module exists to prove the engine's *table-function* door works —
user-defined row expanders callable from SQL via ``LATERAL`` — because
a complete engine must let users drop to imperative row logic when the
built-ins genuinely cannot express their transform.

Design rules:

- **UDTFs are the slow path and are treated as such.** Every UDTF here
  has a built-in-expression twin (``explode(split(...))``) and the
  tests assert row-for-row equivalence; production pipelines use the
  built-in form unless the logic is inexpressible.
- **Arrow transfer when available.** ``useArrow=True`` batches rows
  through Arrow instead of pickling one at a time (~10x on wide
  batches); we fall back to the pickled path on older runtimes.
- **Deterministic output.** No state across ``eval`` calls, no
  ordering assumptions — the planner may split/reorder input
  partitions arbitrarily at 100 TB.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


class _TokenizeImpl:
    """One row per whitespace token, with its 0-based position.

    Matches the engine's built-in tokenizer (``explode(split(text,
    ' '))`` with empties dropped) and Python's ``str.split()`` on
    single-space-separated text.
    """

    def eval(self, text: str):  # noqa: D102 — UDTF protocol method
        if text is None:
            return
        pos = 0
        for tok in text.split(" "):
            if tok:
                yield pos, tok
                pos += 1


_RETURN_TYPE = "pos: int, token: string"


def tokenize_udtf():
    """Build the Tokenize UDTF, Arrow-batched when the runtime supports
    it. Returned object registers via ``spark.udtf.register`` and is
    callable from SQL: ``... FROM docs d, LATERAL tokenize(d.text) t``.
    """
    try:
        return udtf(_TokenizeImpl, returnType=_RETURN_TYPE, useArrow=True)
    except TypeError:  # runtime without the useArrow kwarg
        return udtf(_TokenizeImpl, returnType=_RETURN_TYPE)


def register_all(spark) -> None:
    """Register every engine UDTF on the session (idempotent)."""
    spark.udtf.register("tokenize", tokenize_udtf())
