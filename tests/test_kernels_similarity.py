"""Similarity fixtures per /root/reference/tests/test_validation_service.py:131-260
(semantics only)."""
from pdf_extractor_spark.kernels.similarity import (
    calculate_similarity,
    levenshtein_distance,
    quick_similarity,
    similarity_levenshtein,
    similarity_number_frequency,
)


def test_identical_numbers_different_text():
    a = "Revenue: 1,000 Expenses: 500 Profit: 500"
    b = "הכנסות 1000 הוצאות 500 רווח 500"
    assert similarity_number_frequency(a, b) > 0.999


def test_disjoint_numbers():
    assert similarity_number_frequency("100 200 300", "400 500 600") == 0.0


def test_format_agnostic():
    assert similarity_number_frequency("1,234.56", "1234.56") >= 0.95


def test_eu_vs_us_format():
    assert similarity_number_frequency("1.234,56", "1,234.56") >= 0.95


def test_ocr_digit_error():
    assert similarity_number_frequency("total 198", "total 193") == 0.0


def test_both_empty():
    assert similarity_number_frequency("", "") == 1.0


def test_no_numbers_both():
    assert similarity_number_frequency("hello world", "totally different") == 1.0


def test_one_empty_numbers():
    assert similarity_number_frequency("has 123", "no numbers") == 0.0


def test_frequency_sensitivity():
    sim = similarity_number_frequency("5 5 5", "5")
    assert 0.0 < sim <= 1.0


def test_levenshtein_identical():
    assert similarity_levenshtein("Hello, World!", "hello world") == 1.0


def test_levenshtein_hebrew():
    assert similarity_levenshtein("שלום עולם!", "שלום עולם") == 1.0


def test_levenshtein_empty_edges():
    assert similarity_levenshtein("", "") == 1.0
    assert similarity_levenshtein("a", "") == 0.0
    assert similarity_levenshtein("!!!", "???") == 1.0  # both normalize empty


def test_levenshtein_distance_basic():
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("abc", "abc") == 0


def test_quick_similarity_length_gate():
    assert quick_similarity("a" * 100, "a" * 50) == 0.0


def test_quick_similarity_identical():
    assert quick_similarity("the same words here", "the same words here") == 1.0


def test_dispatcher_early_exit():
    text = "identical content with many words " * 5
    assert calculate_similarity(text, text) == 1.0


def test_dispatcher_levenshtein_method():
    assert calculate_similarity("abc!", "abc?", method="levenshtein") == 1.0
