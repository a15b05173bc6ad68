"""Mixed-block refinement (M4 web analogue).

Reference: ``/root/reference/utils/image/layout/refinement.py:41-120``
``refine_mixed_candidate`` — a candidate containing both text mass and
visual mass is re-segmented, keeping the coherent part and flagging
``needs_review``. The web analogue: an *accepted* content block whose text
carries an inline boilerplate fragment (social-share chains, "read more" /
"related" tails appended by templates inside the same ``<p>/<div>``) gets
the fragment stripped; the block is flagged for review.

Only trailing fragments are stripped — mid-text matches are left alone
(same conservatism as the reference: refinement never deletes coherent
interior mass).
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


# every fragment pattern needs one of these words somewhere near the block
# end; a C-level substring scan of the tail skips the regex fixpoint loop
_GUARD_WORDS = ("share", "tweet", "pin", "email", "print", "save", "like",
                "follow us", "read more", "continue reading", "related")


def refine_text(text: str) -> tuple[str, bool]:
    """Strip trailing boilerplate fragments; returns (text, refined)."""
    tail = text[-160:].lower()
    if not any(w in tail for w in _GUARD_WORDS):
        return text, False
    refined = False
    changed = True
    while changed:
        changed = False
        for rx in TRAILING_FRAGMENT_RES:
            new = rx.sub("", text)
            if new != text:
                text, refined, changed = new, True, True
    return text.rstrip(), refined
