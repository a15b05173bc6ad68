"""Hepburn romanization — the reference's pure-Python fallback path.

The reference romanizes via pykakasi when installed, else via a built-in
greedy table (``/root/reference/src/martial_arts_ocr/japanese/processor.py:
557-779 _simple_romanization``). pykakasi is absent both in this sandbox and
in the reference's offline degradation, so the fallback *is* the semantics
(SURVEY.md §2.9 L4/L5). Algorithm reproduced exactly: longest-match-first
(2-char digraphs), sokuon (っ/ッ) doubles the next romaji consonant, long
vowel mark ー → '-', ASCII and unknown chars pass through.

Tables are standard Hepburn (public knowledge), generated programmatically
from the gojūon grid rather than hand-written glyph-by-glyph.
"""

from __future__ import annotations

_VOWELS = "aiueo"

# consonant rows of the gojūon: prefix + irregular overrides per row
_ROWS: list[tuple[str, str, dict[int, str]]] = [
    # (hiragana row start chars, consonant, {vowel-index: irregular romaji})
    ("あいうえお", "", {}),
    ("かきくけこ", "k", {}),
    ("がぎぐげご", "g", {}),
    ("さしすせそ", "s", {1: "shi"}),
    ("ざじずぜぞ", "z", {1: "ji"}),
    ("たちつてと", "t", {1: "chi", 2: "tsu"}),
    ("だぢづでど", "d", {1: "ji", 2: "zu"}),
    ("なにぬねの", "n", {}),
    ("はひふへほ", "h", {2: "fu"}),
    ("ばびぶべぼ", "b", {}),
    ("ぱぴぷぺぽ", "p", {}),
    ("まみむめも", "m", {}),
    ("らりるれろ", "r", {}),
]

# palatalized digraph consonants: base kana (i-column) → digraph prefix
_DIGRAPH_PREFIX = {
    "き": "ky", "ぎ": "gy", "し": "sh", "じ": "j", "ち": "ch",
    "に": "ny", "ひ": "hy", "び": "by", "ぴ": "py", "み": "my", "り": "ry",
}
_SMALL_Y = {"ゃ": "a", "ゅ": "u", "ょ": "o"}

# Kanji readings used by the reference's fallback table
# (japanese/processor.py:694-747) — standard single-reading Hepburn forms
# for common martial-arts / counting kanji; macron vowels preserved.
KANJI_READINGS: dict[str, str] = {
    "武": "bu", "道": "dō", "術": "jutsu", "空": "kara", "手": "te",
    "柔": "jū", "剣": "ken", "合": "ai", "気": "ki", "型": "kata",
    "組": "kumi", "先": "sen", "生": "sei", "師": "shi", "範": "han",
    "段": "dan", "級": "kyū", "帯": "obi", "礼": "rei", "心": "kokoro",
    "和": "wa", "流": "ryū", "会": "kai", "館": "kan", "場": "ba",
    "真": "shin", "正": "sei", "古": "ko", "新": "shin", "大": "dai",
    "小": "shō", "中": "chū", "上": "jō", "下": "ge", "前": "mae",
    "後": "ato", "左": "hidari", "右": "migi", "内": "uchi", "外": "soto",
    "自": "ji", "他": "ta",
    "一": "ichi", "二": "ni", "三": "san", "四": "shi", "五": "go",
    "六": "roku", "七": "shichi", "八": "hachi", "九": "kyū", "十": "jū",
}


def _build_map() -> dict[str, str]:
    m: dict[str, str] = {}
    # gojūon grid, hiragana + katakana (katakana = hiragana + 0x60)
    for chars, cons, irregular in _ROWS:
        for idx, ch in enumerate(chars):
            romaji = irregular.get(idx, cons + _VOWELS[idx])
            m[ch] = romaji
            m[chr(ord(ch) + 0x60)] = romaji
    # y/w rows + n
    for ch, r in [("や", "ya"), ("ゆ", "yu"), ("よ", "yo"),
                  ("わ", "wa"), ("ゐ", "wi"), ("ゑ", "we"), ("を", "wo"),
                  ("ん", "n")]:
        m[ch] = r
        m[chr(ord(ch) + 0x60)] = r
    # small ya/yu/yo standalone
    for ch, v in _SMALL_Y.items():
        m[ch] = "y" + v
        m[chr(ord(ch) + 0x60)] = "y" + v
    # digraphs (both scripts)
    for base, prefix in _DIGRAPH_PREFIX.items():
        for small, v in _SMALL_Y.items():
            m[base + small] = prefix + v
            m[chr(ord(base) + 0x60) + chr(ord(small) + 0x60)] = prefix + v
    # long-vowel mark and sokuon placeholders
    m["ー"] = "-"
    m["っ"] = ""
    m["ッ"] = ""
    # katakana extensions for loanwords (standard extended Hepburn)
    m.update({
        "ヴ": "vu", "ファ": "fa", "フィ": "fi", "フェ": "fe", "フォ": "fo",
        "ティ": "ti", "ディ": "di", "トゥ": "tu", "ドゥ": "du",
        "ウィ": "wi", "ウェ": "we", "ウォ": "wo",
    })
    m.update(KANJI_READINGS)
    return m


CHAR_MAP: dict[str, str] = _build_map()
_SOKUON = ("っ", "ッ")


def romanize(text: str) -> str:
    """Greedy 2-char-first romanization with sokuon consonant doubling —
    algorithm parity with japanese/processor.py:751-779."""
    out: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        if i + 1 < n:
            two = text[i : i + 2]
            if two in CHAR_MAP:
                out.append(CHAR_MAP[two])
                i += 2
                continue
        ch = text[i]
        if ch in _SOKUON:
            if i + 1 < n:
                nxt_two = text[i + 1 : i + 3]
                nxt = CHAR_MAP.get(nxt_two) if len(nxt_two) == 2 and nxt_two in CHAR_MAP else CHAR_MAP.get(text[i + 1], text[i + 1])
                if nxt and nxt[0].isalpha():
                    out.append(nxt[0])
        elif ch in CHAR_MAP:
            out.append(CHAR_MAP[ch])
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def overall_romaji(segment_texts: list[str]) -> str:
    """L8 (japanese/processor.py:1041-1067): per-segment romaji joined by
    single spaces; empty segments dropped."""
    parts = [romanize(t) for t in segment_texts]
    return " ".join(p for p in parts if p)
