"""DOM-heuristic boilerplate stripping (kernels/html_strip.py)."""
from pdf_extractor_spark.kernels.html_strip import (
    MAX_TAG_DENSITY,
    extract_main_content,
    link_density,
    tag_density,
)

PARA = (
    "<p>This is a long enough paragraph of real article content that "
    "should clearly be kept by the extractor heuristics.</p>"
)


def test_paragraph_kept_menu_dropped():
    menu = (
        "<div>"
        + "".join(f"<span>Item {i}</span> <b>go</b> " for i in range(12))
        + "</div>"
    )
    text, spans = extract_main_content(menu + PARA)
    assert "real article content" in text
    assert "Item 3" not in text  # tag-dense widget dropped without anchors
    assert len(spans) == 1


def test_tag_density_values():
    # paragraph fragment (block tags are split boundaries -> inline only)
    assert tag_density("plain text with one <b>bold</b> word here") < 0.1
    taggy = "".join(f"<span>x{i}</span>" for i in range(10))
    assert tag_density(taggy) > MAX_TAG_DENSITY


def test_link_dense_block_dropped():
    links = "<p>" + " ".join(
        f'<a href="/{i}">navigation link number {i}</a>' for i in range(8)
    ) + "</p>"
    text, _ = extract_main_content(links + PARA)
    assert "navigation link" not in text
    assert "real article content" in text


def test_script_nav_regions_dropped():
    html = (
        "<script>var x = 'long enough script body to pass min chars';</script>"
        "<nav>Home About Contact Careers Press Blog Terms Privacy</nav>"
        + PARA
    )
    text, _ = extract_main_content(html)
    assert "script body" not in text
    assert "Careers" not in text
    assert "real article content" in text


def test_spans_index_into_result():
    html = PARA + "<p>Another sufficiently long second paragraph of body text.</p>"
    text, spans = extract_main_content(html)
    assert len(spans) == 2
    for off, length in spans:
        block = text[off:off + length]
        assert block == block.strip() and len(block) == length
    assert text[spans[0][0] + spans[0][1]:spans[1][0]] == "\n\n"


def test_empty_and_plain():
    assert extract_main_content("") == ("", [])
    assert link_density("no markup at all") == 0.0
    assert tag_density("") == 0.0
