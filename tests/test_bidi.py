"""X4 bidi kernel tests: the mini-UBA must match python-bidi's get_display on
the cell-level subset the reference exercises (Hebrew bank-statement cells:
RTL words, digits, separators, currency marks, mirrors). Expected values are
hand-derived from UAX #9 (public spec); fixture shapes ported from
/root/reference/tests/test_validation_service.py:121-127,250-260."""
from pdf_extractor_spark.kernels.normalize import fix_bidi_text

HEB_WORD = "שלום"          # שלום
HEB_WORD_REV = "םולש"      # םולש
INCOME = "הכנסה"      # הכנסה
INCOME_REV = "הסנכה"  # הסנכה
SHACH = "ש״ח"                   # ש״ח (gershayim is class R)
SHACH_REV = "ח״ש"


def test_ltr_identity():
    assert fix_bidi_text("Hello world 123") == "Hello world 123"
    assert fix_bidi_text("") == ""
    assert fix_bidi_text("1,234.56") == "1,234.56"


def test_pure_rtl_reverses():
    assert fix_bidi_text(HEB_WORD) == HEB_WORD_REV


def test_rtl_with_trailing_number():
    # "הכנסה: 1,234" -> digits keep LTR order, colon flips to the number's
    # right, the word reverses: "1,234 :הסנכה"
    assert fix_bidi_text(f"{INCOME}: 1,234") == f"1,234 :{INCOME_REV}"


def test_number_then_rtl_currency():
    # "123 ש״ח" -> "ח״ש 123" (RTL paragraph: word first, digits stay LTR)
    assert fix_bidi_text(f"123 {SHACH}") == f"{SHACH_REV} 123"


def test_ltr_paragraph_with_embedded_rtl():
    assert fix_bidi_text(f"Total {HEB_WORD} end") == f"Total {HEB_WORD_REV} end"


def test_mirrored_brackets():
    assert fix_bidi_text(f"({HEB_WORD})") == f"({HEB_WORD_REV})"


def test_hebrew_mixed_numbers_fixture():
    # ported shape: "הכנסה: 1,234,567 ש״ח בשנת 2024"
    year = "בשנת"  # בשנת
    year_rev = "תנשב"
    logical = f"{INCOME}: 1,234,567 {SHACH} {year} 2024"
    # RTL display reads right-to-left: word, number, currency, word, year
    expected = f"2024 {year_rev} {SHACH_REV} 1,234,567 :{INCOME_REV}"
    assert fix_bidi_text(logical) == expected


def test_idempotent_on_ascii_and_stable_types():
    assert fix_bidi_text(None or "") == ""
    assert fix_bidi_text("a-b") == "a-b"


def test_multiline_per_paragraph_base():
    """UAX #9 P1 / reference per-paragraph get_display: each line gets its
    own base direction. An English first line must stay LTR even when the
    second line is Hebrew (and vice versa)."""
    two = f"Page 1 summary\n{INCOME}: 1,234"
    assert fix_bidi_text(two) == f"Page 1 summary\n1,234 :{INCOME_REV}"
    # RTL first line must not drag a following English line to RTL base
    other = f"{INCOME}: 7\nTotal 99"
    assert fix_bidi_text(other) == f"7 :{INCOME_REV}\nTotal 99"
    # blank lines survive the split/rejoin byte-exactly
    assert fix_bidi_text("a\n\nb") == "a\n\nb"
