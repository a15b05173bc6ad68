"""Script detection / segmentation / romanization golden tests (L1-L8)."""

from martial_arts_ocr_spark.kernel.romanize import overall_romaji, romanize
from martial_arts_ocr_spark.kernel.script import (
    classify_script,
    has_japanese,
    japanese_segments,
    language_composition,
)


def test_has_japanese():
    assert has_japanese("武道")
    assert has_japanese("ひらがな")
    assert has_japanese("カタカナ")
    assert not has_japanese("plain english")
    assert not has_japanese("")


def test_segments_with_spans():
    segs = japanese_segments("abc 武道の稽古 def カタカナ xyz")
    assert [(s.text, s.start, s.end) for s in segs] == [
        ("武道の稽古", 4, 9),
        ("カタカナ", 14, 18),
    ]


def test_classify_script():
    assert classify_script("ひらがな") == "hiragana"
    assert classify_script("カタカナ") == "katakana"
    assert classify_script("武道術") == "kanji"
    assert classify_script("武道のすべて") == "mixed"
    assert classify_script("abc") == "unknown"


def test_language_composition_mixed_interval():
    # reference uses open interval 0.1 < ratio < 0.9 (japanese/processor.py)
    comp = language_composition("武道 abc def ghi")
    assert comp["dominant"] == "en"
    assert comp["is_mixed"] is True
    pure = language_composition("abcdef")
    assert pure["is_mixed"] is False


# --- romanization (Hepburn fallback, japanese/processor.py:557-779 parity) ---

def test_basic_hiragana():
    assert romanize("ひらがな") == "hiragana"
    assert romanize("あいうえお") == "aiueo"


def test_irregular_rows():
    assert romanize("しちつふ") == "shichitsufu"
    assert romanize("じぢづ") == "jijizu"


def test_digraphs():
    assert romanize("きゃくしゃ") == "kyakusha"
    assert romanize("りゅう") == "ryuu"
    assert romanize("じゃじゅじょ") == "jajujo"


def test_sokuon_doubling():
    # っ doubles the next consonant (processor.py:764-769)
    assert romanize("きっと") == "kitto"
    assert romanize("ぜったい") == "zettai"


def test_katakana():
    assert romanize("カタカナ") == "katakana"
    assert romanize("ラーメン") == "ra-men"


def test_kanji_readings():
    assert romanize("武道") == "budō"
    assert romanize("柔術") == "jūjutsu"
    assert romanize("空手") == "karate"


def test_ascii_passthrough():
    assert romanize("abc 武道 xyz") == "abc budō xyz"


def test_unknown_kept():
    assert romanize("鑫") == "鑫"


def test_overall_romaji_joins_with_spaces():
    assert overall_romaji(["武道", "空手"]) == "budō karate"
