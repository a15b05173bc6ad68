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

# kept for reference/tests: the regex form of the trailing share-chain rule.
# NOT used on the hot path — the separator's pipe/space alternatives overlap
# on whitespace, so a failing attempt over a long chain backtracks
# exponentially (measured 97-174 s on ' Share |' * 20k within the 2 MiB
# input cap). _strip_trailing_share_chain below is the linear backwards-peel
# equivalent; equivalence is pinned by the differential fuzz in
# tests/test_kernel_refine.py.
TRAILING_SHARE_CHAIN_RE = re.compile(
    rf"\s*{_SHARE_WORDS}(?:{_SEP}{_SHARE_WORDS})+[.!]?\s*$"
)

# "Read more", "Continue reading", "Related articles: ..." tails — literal
# prefixes fail in O(1) per position; no ambiguity, safe as a regex.
# (?:^|\s) anchors the phrase at a word start: without it, \s* matched
# EMPTY and the rule truncated legitimate prose mid-word ('largely unread
# more' lost 'read more' out of 'unread'; review-found). The boundary is
# consumed only when it is whitespace, which the strip already removes.
_READMORE_RE = re.compile(
    r"(?:(?<=\s)|^)(?:Read more|Continue reading|Related(?: articles| posts)?:"
    r"[^.]*)\s*$",
    re.IGNORECASE,
)

_SHARE_SUFFIX_RE = re.compile(_SHARE_WORDS + r"$")
_PIPES = "|·•/"


def _strip_trailing_share_chain(text: str) -> str:
    """Linear equivalent of ``TRAILING_SHARE_CHAIN_RE.sub("", text)``.

    The regex strips the maximal suffix decomposable as
    ``\\s* SHARE (SEP SHARE)+ [.!]? \\s* $`` — computed here by peeling
    tokens backwards from the end (str.isspace() is the same character
    class CPython's ``\\s`` uses). Greedy backwards peeling is exact: a
    share word always follows its separator immediately, so at each
    boundary only one separator form can precede it."""
    n = len(text)
    i = n
    while i > 0 and text[i - 1].isspace():            # \s*$
        i -= 1
    if i > 0 and text[i - 1] in ".!":                 # [.!]?
        i -= 1
    count = 0
    first_share_start = -1
    j = i
    while True:
        m = _SHARE_SUFFIX_RE.search(text, max(0, j - 9), j)
        if m is None:                                 # no share word ends here
            break
        count += 1
        first_share_start = m.start()
        k = m.start()
        w2 = k
        while w2 > 0 and text[w2 - 1].isspace():
            w2 -= 1
        if w2 > 0 and text[w2 - 1] in _PIPES:         # \s*[|·•/]\s* form
            w1 = w2 - 1
            while w1 > 0 and text[w1 - 1].isspace():
                w1 -= 1
            j = w1
        elif w2 < k:                                  # \s+ form
            j = w2
        else:                                         # chain starts here
            break
    if count >= 2:
        cut = first_share_start
        while cut > 0 and text[cut - 1].isspace():    # leading \s*
            cut -= 1
        return text[:cut]
    return text


# interior share chains: ≥2 share words joined by EXPLICIT separators
# (pipes/bullets), surrounded by whitespace on both sides; replaced by a
# single space so the flanking prose joins cleanly
# the lookbehind stops a sub-chain match inside a longer chain that starts
# at position 0 (e.g. "Share | Tweet | Email is…" must not lose " Tweet |
# Email " while keeping its head)
_INTERIOR_FRAGMENT_RE = re.compile(
    rf"(?<![|·•/])\s{_SHARE_WORDS}(?>\s*[|·•/]\s*{_SHARE_WORDS})+\s"
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
        new = _strip_trailing_share_chain(text)
        if new != text:
            text, refined, changed = new, True, True
        new = _READMORE_RE.sub("", text)
        if new != text:
            text, refined, changed = new, True, True
    new = _INTERIOR_FRAGMENT_RE.sub(" ", text)
    if new != text:
        text, refined = new, True
    return text.rstrip(), refined
