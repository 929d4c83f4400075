"""HTML → text extraction — the first transform after crawl ingest
in every C4-style corpus pipeline (WARC response bodies are mostly
``text/html``; training corpora want the text).

Two tiers, honest about their envelopes:

- :func:`html_strip_tags` — a pure COLUMN EXPRESSION built from
  built-in ``regexp_replace``/``replace`` only, so the whole
  extraction runs JVM-side inside whole-stage codegen: comments,
  ``<script>``/``<style>`` blocks (content dropped), all tags →
  space, the five XML entities + ``&nbsp;`` decoded (``&amp;``
  LAST, so ``&amp;lt;`` correctly yields the literal ``&lt;``),
  whitespace collapsed. Numeric and exotic named entities are left
  verbatim — that is the documented envelope, not an oversight.
  Every pattern is written to the common subset of Java regex
  (Spark) and RE2 (DuckDB) semantics — non-greedy ``.*?``, inline
  ``(?is)`` flags, ``\\s`` — so the SAME chain is expressible as
  the DuckDB oracle and `corpus_html_extract` gets a true
  cross-engine value oracle over REAL document text, like the
  TPC-H heads.
- :func:`html_extract_text_udf` — the full-entity tier: an
  Arrow-batched ``pandas_udf`` applying the same structural strip,
  then stdlib ``html.unescape`` (the REFEREE for entity semantics:
  all named entities + decimal/hex numeric forms). On inputs inside
  the basic-entity envelope it must agree with the column
  expression EXACTLY (pinned by test); reach for it only when a
  corpus actually carries exotic entities — Python costs ~an order
  over the codegen tier.

Scale shape: the codegen tier is a few regex passes per row —
no Python, no shuffle, fully pipelined with the scan. 100 TB of
HTML extracts at scan speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_strip_tags", "html_extract_text_udf"]

#: (pattern, replacement) structural passes, in order; the same
#: strings feed the DuckDB oracle (Java-regex ∩ RE2 subset only)
_STRUCT_PATTERNS = [
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"<[^>]*>", " "),
]

#: literal entity decodes, in order — ``&amp;`` strictly LAST
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_strip_tags(col) -> Column:
    """JVM-side HTML→text column expression (see module doc): the
    hot path for crawl-scale extraction — whole-stage codegen, no
    Python worker, the exact chain the DuckDB oracle mirrors."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _STRUCT_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_strip_tags_sql(expr: str) -> str:
    """The SAME chain as DuckDB SQL over ``expr`` — the oracle half
    of :func:`html_strip_tags` (DuckDB regexp_replace needs the
    explicit 'g' flag; replace() is global in both engines)."""
    c = expr
    for pat, repl in _STRUCT_PATTERNS:
        # standard-SQL '...' literals pass backslashes through to
        # RE2 verbatim; only quotes would need doubling (none do)
        c = f"regexp_replace({c}, '{pat}', '{repl}', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def html_extract_text_udf():
    """Arrow-batched full-entity tier: structural strip with the
    SAME patterns, then stdlib ``html.unescape`` for the complete
    named + numeric entity set. Agrees exactly with
    :func:`html_strip_tags` on basic-entity inputs (tested); spends
    a Python worker, so keep it off the hot path unless the corpus
    needs it."""
    import re

    from pyspark.sql.functions import pandas_udf

    compiled = [(re.compile(p), r) for p, r in _STRUCT_PATTERNS]
    ws = re.compile(r"\s+")

    @pandas_udf("string")
    def extract(s: pd.Series) -> pd.Series:
        import html as _html

        def one(v):
            if v is None:
                return None
            for pat, repl in compiled:
                v = pat.sub(repl, v)
            return ws.sub(" ", _html.unescape(v)).strip()

        return s.map(one)

    return extract
