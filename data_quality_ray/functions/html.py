"""HTML → text extraction (trafilatura-lite) — the first transform a
web-crawl corpus passes through before any quality rule. Deliberately a
small, exactly-specified subset so the SQL oracle can replay it
byte-for-byte (swap in a real extractor for production HTML):

1. drop <script>…</script> and <style>…</style> blocks (case-
   insensitive, dot-matches-newline, non-greedy — two separate patterns
   because RE2 has no backreferences);
2. every remaining <…> tag → one space;
3. unescape the common entities — &nbsp; &lt; &gt; &quot; &#39; first,
   &amp; LAST (so '&amp;lt;' decodes to '&lt;', not '<');
4. collapse whitespace runs to single spaces and trim.

All constants are shared with the oracle SQL via this module.
"""

from __future__ import annotations

import pandas as pd

SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
TAG_RE = r"(?s)<[^>]*>"
WS_RE = r"\s+"
# (entity, replacement) in APPLICATION ORDER — &amp; must come last
ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
            ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def strip_html(s: pd.Series) -> pd.Series:
    """Vectorized extraction per the module contract; nulls propagate."""
    out = s.astype("string")
    out = out.str.replace(SCRIPT_RE, " ", regex=True)
    out = out.str.replace(STYLE_RE, " ", regex=True)
    out = out.str.replace(TAG_RE, " ", regex=True)
    for ent, rep in ENTITIES:
        out = out.str.replace(ent, rep, regex=False)
    return out.str.replace(WS_RE, " ", regex=True).str.strip()


def add_stripped_html(ds, col: str, out_col: str = "text_clean"):
    """Streaming stage: append the extracted text column. Stateless
    vectorized pass, zero shuffle."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = strip_html(b[col]).astype(object)
        return b

    return ds.map_batches(stage, batch_format="pandas")
