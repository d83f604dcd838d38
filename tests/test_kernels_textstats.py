from pdf_extractor_spark.kernels.normalize import normalize_for_comparison, safe_filename
from pdf_extractor_spark.kernels.textstats import (
    detect_language,
    fingerprint64,
    hamming64,
    jaccard_words,
    md5_fingerprint,
    minhash_signature,
    quality_score,
    shingles,
    simhash64,
    token_count,
    whitespace_token_count,
)


def test_normalize_hebrew_safe():
    assert normalize_for_comparison("Hello, World! 123") == "helloworld123"
    assert normalize_for_comparison("שלום עולם!") == "שלוםעולם"
    assert normalize_for_comparison("") == ""


def test_safe_filename():
    assert safe_filename("Report: Q3/2024 (final)") == "Report_Q32024_final"
    assert len(safe_filename("x" * 100)) <= 50


def test_token_count():
    assert token_count("hello world, 42!") == 5  # hello world , 42 !
    assert token_count("") == 0
    assert whitespace_token_count("a b  c") == 3


def test_detect_language():
    assert detect_language("the cat sat on the mat and it was good for all of us") == "en"
    assert detect_language("שלום עולם מה שלומך היום בבוקר") == "he"
    assert detect_language("") == "und"
    assert detect_language("zzz qqq xxx") == "und"


def test_quality_score_bounds():
    assert quality_score("") == 0.0
    good = "the quick brown fox jumps over the lazy dog and that is fine " * 4
    assert quality_score(good) > 0.7
    assert quality_score("@@@@") < 0.4


def test_fingerprints_deterministic():
    assert fingerprint64("abc") == fingerprint64("abc")
    assert fingerprint64("abc") != fingerprint64("abd")
    assert -(1 << 63) <= fingerprint64("x" * 1000) < (1 << 63)
    assert md5_fingerprint("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_shingles():
    assert shingles("a b c d", k=3) == ["a b c", "b c d"]
    assert shingles("a", k=3) == ["a"]
    assert shingles("", k=3) == []


def test_simhash_similar_texts_close():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("completely unrelated words about databases and engines")
    assert hamming64(a, b) < hamming64(a, c)


def test_minhash_signature_stable_and_similar():
    sig_a = minhash_signature("the quick brown fox jumps over the lazy dog", 8)
    sig_b = minhash_signature("the quick brown fox jumps over the lazy dog", 8)
    assert sig_a == sig_b
    sig_c = minhash_signature("entirely different text with other tokens here", 8)
    assert sum(x == y for x, y in zip(sig_a, sig_c)) < 8


def test_jaccard_words():
    assert jaccard_words("a b c", "a b c") == 1.0
    assert jaccard_words("a b", "c d") == 0.0
    assert jaccard_words("", "") == 1.0
