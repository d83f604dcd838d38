"""Detector fixtures per FIXTURES.md §4 and
/root/reference/tests/test_validation_service.py:16-62 (semantics only)."""
from pdf_extractor_spark.config import ALL_PROBLEMS
from pdf_extractor_spark.kernels import detectors as d


def test_empty_tables_five_consecutive():
    content = ("| a | b | c |\n" + "|  |  |  |\n" * 5)
    assert d.detect_empty_tables(content)


def test_empty_tables_small_negative():
    content = "| a | b | c |\n" + "|  |  |  |\n" * 3
    assert not d.detect_empty_tables(content)


def test_low_content_density():
    assert d.detect_low_content_density("short")
    assert not d.detect_low_content_density("x" * 100)
    assert d.detect_low_content_density("")


def test_missing_numbers():
    content = "\n".join("| item | name |" for _ in range(10))
    assert d.detect_missing_numbers(content)
    content_with_nums = "\n".join(f"| item | {i} |" for i in range(10))
    assert not d.detect_missing_numbers(content_with_nums)


def test_inconsistent_columns():
    content = "| a | b | c |\n| a | b | c | d |\n| a | b | c | d | e |\n"
    assert d.detect_inconsistent_columns(content)
    consistent = "| a | b |\n| --- | --- |\n| 1 | 2 |\n"
    assert not d.detect_inconsistent_columns(consistent)


def test_repeated_characters():
    assert d.detect_repeated_characters("xxxxxxxxxxxx artifact")
    assert not d.detect_repeated_characters("------------ ruler is fine")
    assert not d.detect_repeated_characters("normal text")


def test_garbled_text():
    assert d.detect_garbled_text("ab@#$%^&*@#$%^&*")
    assert not d.detect_garbled_text("perfectly normal sentence with words 123")


def test_header_only_tables():
    content = "| a | b |\n| --- | --- |\n| 1 | 2 |"
    assert d.detect_header_only_tables(content)  # exactly 1 data row
    content2 = "| a | b |\n| --- | --- |\n| 1 | 2 |\n| 3 | 4 |"
    assert not d.detect_header_only_tables(content2)


def test_very_short_pages():
    assert d.detect_very_short_pages("tiny")
    assert not d.detect_very_short_pages("x" * 200)


def test_missing_keywords():
    filler = ("lorem ipsum dolor sit amet " * 30)
    assert d.detect_missing_keywords(filler)
    assert not d.detect_missing_keywords(filler + " balance")
    assert not d.detect_missing_keywords("short page")  # <500 chars skipped


def test_malformed_structure():
    content = "| a | b |\n| -x- | -y- |\n| 1 | 2 |"
    assert d.detect_malformed_structure(content)
    good = "| a | b |\n| --- | --- |\n| 1 | 2 |"
    assert not d.detect_malformed_structure(good)


def test_duplicate_content():
    para = "this paragraph is certainly longer than fifty characters in total"
    content = "\n\n".join([para, para, para])
    assert d.detect_duplicate_content(content)
    assert not d.detect_duplicate_content("\n\n".join([para, "other", "more"]))


def test_repetitive_numbers_table():
    assert d.detect_repetitive_numbers("| 1000 | 1000 | 1000 |")
    assert d.detect_repetitive_numbers("total 1000 1000 1000 end")
    assert not d.detect_repetitive_numbers("| 1000 | 2000 | 3000 |")


def test_unknown_characters():
    assert d.detect_unknown_characters("□□□ bad □□□")
    assert not d.detect_unknown_characters("clean text entirely")


def test_markdown_images():
    assert d.detect_markdown_images("![img-01.jpeg](img-01.jpeg)")
    assert not d.detect_markdown_images("no images [link](x) here")


def test_detect_problems_empty_content():
    assert d.detect_problems("") == ["empty_content"]


def test_detect_problems_enabled_subset():
    content = "tiny"
    out = d.detect_problems(content, enabled=["very_short_pages"])
    assert out == ["very_short_pages"]


def test_registry_complete():
    assert set(d.DETECTOR_REGISTRY) == set(ALL_PROBLEMS)


# --- C-speed counting parity (the [^\W_] == isalnum equivalence) ---

from hypothesis import given, settings
from hypothesis import strategies as st

_text = st.text(
    alphabet=st.characters(codec="utf-8"),
    max_size=400,
)


@given(_text)
@settings(max_examples=300, deadline=None)
def test_alnum_count_matches_isalnum(s):
    assert d._alnum_count(s) == sum(c.isalnum() for c in s)


@given(_text)
@settings(max_examples=300, deadline=None)
def test_garbled_matches_per_char_reference(s):
    alnum = sum(c.isalnum() for c in s)
    if not s:
        expect = False
    elif alnum == 0:
        expect = True
    else:
        special = sum(
            (not c.isalnum()) and c not in d._COMMON_CHARS for c in s
        )
        expect = special / alnum > 0.2
    assert d.detect_garbled_text(s) == expect


@given(_text)
@settings(max_examples=300, deadline=None)
def test_low_density_matches_per_char_reference(s):
    expect = True if not s else sum(c.isalnum() for c in s) < 100
    assert d.detect_low_content_density(s) == expect


def test_counting_on_mixed_scripts():
    s = 'דוח כספי 2024 — total: 1,234.56 ₪ (☐□) "quoted"\n| a | b |'
    assert d._alnum_count(s) == sum(c.isalnum() for c in s)
