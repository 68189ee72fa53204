"""Unit tests for the extended-XPath walker (sources/xpath_ext.py):
function predicates, non-child axes, and their composition with the
ElementTree subset — the Saxon-delegated surface of the reference
(ql:XPath, /root/reference/src/voc.ts:83) that ElementTree rejects.

Pure-Python tests (no Spark session needed)."""

import xml.etree.ElementTree as ET

import pytest

from rml_utils_processor_ts_spark.sources.registry import (
    _xml_findall,
    _xml_iter_records,
    ref_column_name,
)
from rml_utils_processor_ts_spark.sources.xpath_ext import (
    findall_ext,
    has_extended_syntax,
)

DOC = """
<lib>
  <shelf id="s1">
    <book id="b1" genre="scifi"><title>Dune</title><year>1965</year></book>
    <book id="b2" genre="fantasy"><title>Earthsea</title><year>1968</year></book>
    <book id="b3" genre="scifi"><title>Neuromancer</title><year>1984</year></book>
  </shelf>
  <shelf id="s2">
    <book id="b4" genre="essay"><title>Dune Messiah notes</title></book>
  </shelf>
</lib>
"""


@pytest.fixture(scope="module")
def root():
    return ET.fromstring(DOC)


def ids(elems):
    return [e.get("id") for e in elems]


def test_contains_predicate(root):
    assert ids(findall_ext(root, ".//book[contains(title, 'Dune')]")) == ["b1", "b4"]
    assert ids(findall_ext(root, ".//book[contains(@genre, 'sci')]")) == ["b1", "b3"]


def test_starts_with_predicate(root):
    assert ids(findall_ext(root, ".//book[starts-with(@id, 'b')]")) == [
        "b1", "b2", "b3", "b4"]
    assert ids(findall_ext(root, ".//book[starts-with(title, 'Neuro')]")) == ["b3"]


def test_not_and_position(root):
    assert ids(findall_ext(root, ".//book[not(@genre='scifi')]")) == ["b2", "b4"]
    assert ids(findall_ext(root, ".//book[not(year)]")) == ["b4"]
    # position within each parent shelf, ElementTree-compatible
    assert ids(findall_ext(root, ".//book[position()<=2]")) == ["b1", "b2", "b4"]


def test_following_and_preceding_sibling(root):
    assert ids(findall_ext(root, "shelf[1]/book[1]/following-sibling::book")) == [
        "b2", "b3"]
    # reverse axis counts by proximity: [1] is the NEAREST preceding
    got = findall_ext(root, "shelf[1]/book[3]/preceding-sibling::book[1]")
    assert ids(got) == ["b2"]
    assert findall_ext(root, "shelf[2]/book[1]/following-sibling::book") == []


def test_ancestor_and_parent(root):
    t = findall_ext(root, ".//book[@id='b4']/ancestor::shelf")
    assert ids(t) == ["s2"]
    assert [e.tag for e in findall_ext(root, ".//title[contains(., 'Earthsea')]/parent::book")] == ["book"]
    assert ids(findall_ext(root, ".//year/..[@genre='fantasy']")) == ["b2"]


def test_composition_axis_then_function(root):
    got = findall_ext(
        root, "shelf/book[1]/following-sibling::book[contains(@genre, 'fan')]")
    assert ids(got) == ["b2"]


def test_last_in_walker(root):
    assert ids(findall_ext(root, "shelf[1]/book[last()]")) == ["b3"]
    assert ids(findall_ext(root, "shelf[1]/book[last()-1]")) == ["b2"]


def test_findall_ladder_routes_extended(root):
    """_xml_findall must fall through to the walker for every extended
    form and keep ElementTree answers for its native subset."""
    assert ids(_xml_findall(root, "//book[contains(@id, '3')]")) == ["b3"]
    assert ids(_xml_findall(root, "//book[starts-with(@genre, 'ess')]")) == ["b4"]
    assert ids(_xml_findall(root, "//book[@genre='scifi']")) == ["b1", "b3"]  # ET native
    assert _xml_findall(root, "//book[unsupported-fn(@x)]") == []  # no crash


def test_iter_records_with_extended_refs():
    refs = ["@id", "title[contains(., 'Dune')]",
            "title/following-sibling::year/text()"]
    recs = _xml_iter_records(DOC, "//book[starts-with(@id, 'b')]", refs)
    by_id = {r[ref_column_name("@id")]: r for r in recs}
    assert set(by_id) == {"b1", "b2", "b3", "b4"}
    assert by_id["b1"][ref_column_name("title[contains(., 'Dune')]")] == "Dune"
    assert by_id["b2"][ref_column_name("title[contains(., 'Dune')]")] is None
    assert by_id["b1"][ref_column_name("title/following-sibling::year/text()")] == "1965"
    assert by_id["b4"][ref_column_name("title/following-sibling::year/text()")] is None


def test_has_extended_syntax_detector():
    assert has_extended_syntax("//a[contains(@x,'1')]")
    assert has_extended_syntax("a/following-sibling::b")
    assert not has_extended_syntax("//a[@x='1']/b[2]")


def test_union_paths(root):
    from rml_utils_processor_ts_spark.sources.xpath_ext import split_union

    assert split_union("//a[x='1 | 2'] ") is None  # '|' inside quotes
    assert split_union("a | b") == ["a", "b"]
    # absolute + descendant branches, cross-branch dedup, order kept
    got = _xml_findall(root, "//book[@genre='scifi'] | //book[contains(@id, '4')]")
    assert ids(got) == ["b1", "b3", "b4"]
    overlap = _xml_findall(root, "//book | //book[@id='b2']")
    assert ids(overlap) == ["b1", "b2", "b3", "b4"]
    # relative branches evaluate from the document root
    assert [e.get("id") for e in _xml_findall(root, "shelf[1] | shelf[2]")] == ["s1", "s2"]


def ids(nodes):
    return [e.get("id") for e in nodes]


def test_numeric_comparisons(root):
    """number()/implicit numeric predicates (r6): year > 1966 selects
    Earthsea+Neuromancer; a book with no year converts to NaN and fails
    every comparison."""
    assert ids(findall_ext(root, ".//book[year > 1966]")) == ["b2", "b3"]
    assert ids(findall_ext(root, ".//book[number(year) >= 1984]")) == ["b3"]
    assert ids(findall_ext(root, ".//book[year != 1965]")) == ["b2", "b3"]
    assert ids(findall_ext(root, ".//book[year < 1900]")) == []


def test_string_length_predicate(root):
    # titles: Dune=4, Earthsea=8, Neuromancer=11, Dune Messiah notes=18
    assert ids(findall_ext(root, ".//book[string-length(title) > 10]")) == ["b3", "b4"]
    assert ids(findall_ext(root, ".//book[string-length(title) = 4]")) == ["b1"]


def test_substring_in_comparisons(root):
    """XPath 1.0 substring(): 1-based, length optional; usable as the
    operand of = and contains()."""
    assert ids(findall_ext(root, ".//book[substring(title, 1, 4) = 'Dune']")) == ["b1", "b4"]
    assert ids(findall_ext(root, ".//book[contains(substring(title, 6), 'Messiah')]")) == ["b4"]


def test_attribute_wildcard(root):
    """@* matches any attribute: existence and as a comparison operand."""
    # every book has attributes; year/title elements have none
    assert ids(findall_ext(root, ".//book[@*]")) == ["b1", "b2", "b3", "b4"]
    assert ids(findall_ext(root, ".//book[@* = 'essay']")) == ["b4"]


def test_descendant_axes(root):
    assert ids(findall_ext(root, "descendant::book")) == ["b1", "b2", "b3", "b4"]
    shelf = findall_ext(root, ".//shelf[@id='s1']")[0]
    w_books = findall_ext(shelf, "descendant-or-self::book")
    assert ids(w_books) == ["b1", "b2", "b3"]
    assert ids(findall_ext(shelf, "descendant-or-self::shelf")) == ["s1"]
    assert ids(findall_ext(shelf, "self::shelf")) == ["s1"]
    assert findall_ext(shelf, "self::book") == []


def test_new_markers_route_extended():
    assert has_extended_syntax(".//book[number(year) > 1966]")
    assert has_extended_syntax(".//book[string-length(title) = 4]")
    assert has_extended_syntax(".//book[substring(title, 1, 4) = 'Dune']")
    assert has_extended_syntax("descendant-or-self::book")


# ---- r7: boolean connectives (and/or/parens) ----------------------------

def test_and_connective(root):
    ids = [e.get("id") for e in findall_ext(root, ".//book[@genre='scifi' and year > 1970]")]
    assert ids == ["b3"]


def test_or_connective(root):
    ids = [e.get("id") for e in findall_ext(root, ".//book[@genre='fantasy' or @genre='essay']")]
    assert ids == ["b2", "b4"]


def test_precedence_or_lower_than_and(root):
    # A or (B and C): scifi matches regardless of year; fantasy needs >1970
    ids = [
        e.get("id")
        for e in findall_ext(
            root, ".//book[@genre='scifi' or @genre='fantasy' and year > 1970]"
        )
    ]
    assert ids == ["b1", "b3"]


def test_paren_group_overrides_precedence(root):
    # (A or B) and C
    ids = [
        e.get("id")
        for e in findall_ext(
            root, ".//book[(@genre='scifi' or @genre='fantasy') and year > 1966]"
        )
    ]
    assert ids == ["b2", "b3"]


def test_not_over_connective(root):
    ids = [
        e.get("id")
        for e in findall_ext(root, ".//book[not(@genre='scifi' or @genre='fantasy')]")
    ]
    assert ids == ["b4"]


def test_quoted_connective_word_is_opaque(root):
    # ' and ' inside a string literal must not split
    assert findall_ext(root, ".//book[title=' and ']") == []
    ids = [e.get("id") for e in findall_ext(root, ".//book[contains(title, ' Messiah') and @id='b4']")]
    assert ids == ["b4"]


def test_connectives_flag_extended_syntax():
    assert has_extended_syntax(".//book[@a='x' and @b='y']")
    assert has_extended_syntax(".//book[@a='x' or @b='y']")
    assert not has_extended_syntax(".//book[@android='x']")  # no bare-word false positive


def test_namespace_wildcard_name_test():
    """*:name matches any-namespace local names (r7 VERDICT residual):
    routed to the walker (ElementTree can't parse it), elements from
    different namespaces and no namespace all match."""
    doc = (
        '<r xmlns:a="http://a/" xmlns:b="http://b/">'
        "<a:item id='1'>x</a:item><b:item id='2'>y</b:item>"
        "<item id='3'>z</item><other id='4'/></r>"
    )
    root = ET.fromstring(doc)
    assert has_extended_syntax("//*:item")
    got = _xml_findall(root, "//*:item")
    assert [e.get("id") for e in got] == ["1", "2", "3"]
    # composes with predicates and child steps
    got2 = _xml_findall(root, "//*:item[@id='2']")
    assert [e.text for e in got2] == ["y"]
    recs = _xml_iter_records(doc, "//*:item", ["@id", "text()"])
    assert [(r[ref_column_name("@id")], r[ref_column_name("text()")]) for r in recs] == [
        ("1", "x"), ("2", "y"), ("3", "z")
    ]
