"""Text normalization / cleanup — the canonicalization pass every
web-scale training corpus runs before filtering and dedup (training-
pipeline closure, SURVEY.md §2.11).

The dedup operators hash *normalized* forms (operators/lines.py,
operators/dedup.py); this module is the corpus-wide canonicalization
applied to the text itself: control-character stripping, whitespace
discipline, typographic-punctuation folding, and repair of the most
common mojibake class (UTF-8 bytes mis-decoded as Latin-1/cp1252 —
"â€™" for a right quote, "Ã©" for é), which in web crawls is frequent
enough to distort n-gram statistics and break exact dedup between the
clean and mangled copies of the same page.

Everything here is a composition of JVM builtin expressions
(regexp_replace / replace / lower) — whole-stage-codegen'd, no Python
in the path, safe to run over 100 TB as a map-only stage fused into the
scan. Unicode NFC/NFKC is deliberately NOT attempted: Spark has no
builtin normalizer, and a Pandas-UDF pass for it would put Python in
the hottest map stage; the punctuation fold below covers the cases that
matter for dedup/hash stability.

Each transform is exposed separately so pipelines can opt out (e.g.
code corpora keep tabs and repeated blank lines)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# C0 controls minus \t\n, DEL, C1 block — the characters PDF/OCR text
# extraction leaks most often.
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"

# Typographic → ASCII fold. Ordered list, applied with F.replace (exact
# substring, codegen'd) — not one big regex, so each mapping stays
# readable and auditable.
_PUNCT_FOLD = [
    ("‘", "'"), ("’", "'"), ("‚", "'"), ("‛", "'"),
    ("“", '"'), ("”", '"'), ("„", '"'),
    ("–", "-"), ("—", "-"), ("−", "-"),
    ("…", "..."),
    (" ", " "), (" ", " "), (" ", " "), (" ", " "),
    (" ", " "),
    ("​", ""), ("﻿", ""),  # zero-width space / BOM
]

# The cp1252-mojibake repair table: UTF-8 bytes of a codepoint read back
# as cp1252. Most-frequent-first; multi-char sequences before their
# prefixes so replacement is unambiguous.
_MOJIBAKE = [
    ("â€™", "'"),   # â€™  right single quote
    ("â€œ", '"'),   # â€œ  left double quote
    ("â€", '"'),   # â€?  right double quote
    ("â€“", "-"),   # â€“  en dash
    ("â€”", "-"),   # â€”  em dash
    ("â€¦", "..."), # â€¦  ellipsis
    ("â€˜", "'"),   # left single quote (U+2018 bytes read as cp1252)
    ("Ã©", "é"),    # Ã©  é
    ("Ã¨", "è"),    # Ã¨  è
    ("Ã¡", "á"),    # Ã¡  á
    ("Ã³", "ó"),    # Ã³  ó
    ("Ãº", "ú"),    # Ãº  ú
    ("Ã±", "ñ"),    # Ã±  ñ
    ("Ã¼", "ü"),    # Ã¼  ü
    ("Ã§", "ç"),    # Ã§  ç
    ("Ã¤", "ä"),    # Ã¤  ä
    ("Ã¶", "ö"),    # Ã¶  ö
    ("Â ", " "),         # Â + nbsp
]


def strip_control(col: Column) -> Column:
    """Remove C0/C1 control characters (keeps \\t and \\n)."""
    return F.regexp_replace(col, _CONTROL_RE, "")


def fold_punctuation(col: Column) -> Column:
    """Fold typographic quotes/dashes/spaces to their ASCII forms."""
    for src, dst in _PUNCT_FOLD:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def fix_mojibake(col: Column) -> Column:
    """Repair the common UTF-8-read-as-cp1252 sequences."""
    for src, dst in _MOJIBAKE:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def collapse_whitespace(col: Column) -> Column:
    """Runs of spaces/tabs → one space; 3+ newlines → paragraph break;
    strip spaces around newlines; trim."""
    col = F.regexp_replace(col, r"[ \t]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{3,}", "\n\n")
    return F.trim(col)


def normalize_text(
    col: Column,
    *,
    mojibake: bool = True,
    control: bool = True,
    punctuation: bool = True,
    whitespace: bool = True,
    lowercase: bool = False,
) -> Column:
    """The full cleanup composition, each stage optional. Mojibake
    repair runs first (its source sequences contain C1 characters the
    control strip would otherwise destroy)."""
    if mojibake:
        col = fix_mojibake(col)
    if control:
        col = strip_control(col)
    if punctuation:
        col = fold_punctuation(col)
    if whitespace:
        col = collapse_whitespace(col)
    if lowercase:
        col = F.lower(col)
    return col


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_oracle_sql(expr: str) -> str:
    """DuckDB SQL re-deriving ``normalize_text(expr)`` (default stages,
    no lowercase) — the C27 value-oracle fold (r12). Same replace chain
    in the same order, generated from the same tables so the two
    engines cannot drift; regexes carry the 'g' flag DuckDB needs for
    global replacement (Spark's regexp_replace is global by default)."""
    out = expr
    for src, dst in _MOJIBAKE:
        out = f"replace({out}, {_sql_lit(src)}, {_sql_lit(dst)})"
    out = f"regexp_replace({out}, {_sql_lit(_CONTROL_RE)}, '', 'g')"
    for src, dst in _PUNCT_FOLD:
        out = f"replace({out}, {_sql_lit(src)}, {_sql_lit(dst)})"
    out = f"regexp_replace({out}, '[ \\t]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"trim({out})"


# Deterministic dirty-text injection for the C27 fold: every mojibake
# and punctuation-fold table entry, C0/C1 controls (incl. DEL and a C1
# byte), tab/space runs, and a 5-newline run — so the normalization
# chain is exercised entry-for-entry on every row, not vacuously over
# already-clean fixture text. Built from the operator's own tables so
# fold coverage tracks table edits automatically.
DIRTY_PROBE = (
    "  "
    + "|".join(src for src, _ in _MOJIBAKE)
    + "|"
    + "|".join(src for src, _ in _PUNCT_FOLD)
    + "|\x07\x0b\x7f\x9c|\n\n\n\n\n x\t\ty  "
)


def normalize_docs(
    docs: DataFrame, text_col: str = "text", **kwargs
) -> DataFrame:
    """docs with text_col normalized in place — a map-only stage that
    fuses into the scan (no shuffle, no Python)."""
    return docs.withColumn(text_col, normalize_text(F.col(text_col), **kwargs))
