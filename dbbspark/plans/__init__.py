"""Plan-time helpers: declared metadata schemas and template compilation.

These run at plan-build time on the driver (they parameterize the
DataFrame plan); nothing here scales with data volume.
"""

from .keywords import KeywordSchema, parse_keyword_csv

__all__ = ["KeywordSchema", "parse_keyword_csv"]
