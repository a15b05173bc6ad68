"""Mixed-block refinement (M4 web analogue).

Reference: ``/root/reference/utils/image/layout/refinement.py:41-120``
``refine_mixed_candidate`` — a candidate containing both text mass and
visual mass is re-segmented, keeping the coherent part and flagging
``needs_review``. The web analogue: an *accepted* content block whose text
carries an inline boilerplate fragment (social-share chains, "read more" /
"related" tails appended by templates inside the same ``<p>/<div>``) gets
the fragment stripped; the block is flagged for review.

Trailing fragments may use loose separators (spaces count); INTERIOR
fragments are stripped only when explicitly delimited (pipe/bullet-joined
share chains) — the reference's conservatism: refinement never deletes
coherent interior mass, and an undelimited interior word run could be
prose.
"""

from __future__ import annotations

import re

# share-chain words that templates append inline
_SHARE_WORDS = r"(?:Share|Tweet|Pin(?: it)?|Email|Print|Save|Like|Follow us)"
_SEP = r"(?:\s*[|·•/]\s*|\s+)"

TRAILING_FRAGMENT_RES: list[re.Pattern] = [
    # "... Share | Tweet | Email" chains (≥2 share words) at block end
    re.compile(
        rf"\s*{_SHARE_WORDS}(?:{_SEP}{_SHARE_WORDS})+[.!]?\s*$"
    ),
    # "Read more", "Continue reading", "Related articles: ..." tails
    re.compile(
        r"\s*(?:Read more|Continue reading|Related(?: articles| posts)?:"
        r"[^.]*)\s*$",
        re.IGNORECASE,
    ),
]


# interior share chains: ≥2 share words joined by EXPLICIT separators
# (pipes/bullets), surrounded by whitespace on both sides; replaced by a
# single space so the flanking prose joins cleanly
# the lookbehind stops a sub-chain match inside a longer chain that starts
# at position 0 (e.g. "Share | Tweet | Email is…" must not lose " Tweet |
# Email " while keeping its head)
_INTERIOR_FRAGMENT_RE = re.compile(
    rf"(?<![|·•/])\s{_SHARE_WORDS}(?:\s*[|·•/]\s*{_SHARE_WORDS})+\s"
)

# every fragment pattern needs one of these words somewhere in the block;
# a C-level substring scan skips the regex work entirely
_GUARD_WORDS = ("share", "tweet", "pin", "email", "print", "save", "like",
                "follow us", "read more", "continue reading", "related")


def refine_text(text: str) -> tuple[str, bool]:
    """Strip trailing + interior boilerplate fragments; (text, refined)."""
    lowered = text.lower()
    if not any(w in lowered for w in _GUARD_WORDS):
        return text, False
    refined = False
    changed = True
    while changed:
        changed = False
        for rx in TRAILING_FRAGMENT_RES:
            new = rx.sub("", text)
            if new != text:
                text, refined, changed = new, True, True
    new = _INTERIOR_FRAGMENT_RE.sub(" ", text)
    if new != text:
        text, refined = new, True
    return text.rstrip(), refined
