"""Unit tests for the stat/string helpers (JS-semantics parity)."""

from scribe_js_ray.functions.stats import at, mean50, quantile, rangei, truthy
from scribe_js_ray.functions.textnorm import (
    calc_lang, get_text_script, remove_superscript, replace_ligatures,
    unescape_xml,
)


def test_quantile_js_floor_semantics():
    assert quantile([], 0.5) is None
    assert quantile([3], 0.5) == 3
    # len=4, ntile=0.5 → index floor(2)=2 of sorted
    assert quantile([4, 1, 3, 2], 0.5) == 3
    assert quantile([4, 1, 3], 0.5) == 3  # floor(1.5)=1 → sorted[1]=3


def test_mean50_short_arrays():
    assert mean50([]) is None
    assert mean50([7]) == 7
    assert mean50([1, 9]) == 9       # JS slice(-1, 2) → [9]
    assert mean50([1, 5, 9]) == 9    # JS slice(-1, 3) → [9]
    # n=4 → per25 = 0, per75 = ceil(3)-1 = 2 → slice(0, 3) = [1,2,3] → 2.0
    assert mean50([1, 2, 3, 4]) == 2.0


def test_rangei():
    assert rangei(1, 5) == [1, 2, 3, 4, 5]
    assert rangei(3, 2) == []


def test_truthy_and_at():
    assert not truthy(0)
    assert not truthy(None)
    assert truthy(-1)
    assert at([1, 2], 5) is None
    assert at([1, 2], -1) is None
    assert at([1, 2], 1) == 2


def test_unescape_xml():
    assert unescape_xml("a&amp;b &lt;c&gt; &#x41;") == "a&b <c> A"
    assert unescape_xml("soft­hyphen") == "soft-hyphen"
    assert unescape_xml("&quot;q&quot; &apos;a&apos; &#39;x&#39;") == "\"q\" 'a' 'x'"


def test_ligatures():
    assert replace_ligatures("ﬁne ﬂow oﬃce") == "fine flow office"
    assert replace_ligatures("plain") == "plain"


def test_remove_superscript():
    assert remove_superscript("x²") == "x2"
    assert remove_superscript("E=mc²") == "E=mc2"


def test_calc_lang():
    assert calc_lang("hello") == "eng"
    assert calc_lang("汉字 test") == "chi_sim"
    assert calc_lang("привет") == "rus"


def test_get_text_script():
    s = get_text_script(list("ab汉"))
    assert s == {"han": 1, "latin": 2}
