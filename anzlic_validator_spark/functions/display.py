"""Derived display-field functions (P5) — pure Catalyst scalar rewrites.

Reference: the plugin's report panel derives presentation text from raw
fields (linz_metadata.py):
- camel-case tag names split + title-cased for field labels
  (``re.sub('([A-Z])', r' \\1', t1).title()``, linz_metadata.py:1313)
- a markdown subset rewritten to HTML for the abstract display
  (paired ``**bold**`` / ``*italic*`` loops, ``[name](link)`` anchors and
  per-line ``<br>``, linz_metadata.py:1373-1405)

Both compile to chains of ``regexp_replace``/``initcap`` — whole-stage
codegen, no UDF. The paired-replacement loops of the reference are
equivalent to pair-matching regexes for well-formed markdown; unpaired
markers are left untouched in both implementations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def camel_title(col: Column) -> Column:
    """'pointOfContact' → 'Point Of Contact' (field-label derivation)."""
    return F.initcap(F.regexp_replace(col, "([A-Z])", " $1"))


def md_to_html(col: Column) -> Column:
    """Markdown-subset → HTML, matching the reference's rewrite order:
    bold pairs, then italic pairs, then links, then line breaks (every
    line — including the last — gets a trailing ``<br>``)."""
    out = F.regexp_replace(col, r"\*\*([^*]+)\*\*", "<b>$1</b>")
    out = F.regexp_replace(out, r"\*([^*]+)\*", "<i>$1</i>")
    out = F.regexp_replace(out, r"\[([^\[\]]+)\]\(([^()\[\]]+)\)", '<a href="$2">$1</a>')
    out = F.regexp_replace(out, r"\n", "<br>")
    return F.when(F.length(col) > 0, F.concat(out, F.lit("<br>"))).otherwise(col)
