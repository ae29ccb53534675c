"""Snippet extraction unit semantics (the ES-highlighter analog;
oracle parity runs in test_oracle_parity via highlight_snippets)."""

from cb.highlight import best_window


def test_best_window_picks_densest_hit_anchor():
    # terms cluster late: window anchored at the first late hit wins
    toks = (
        ["x"] * 30 + ["alpha"] + ["x"] * 40 + ["alpha", "y", "beta", "z", "gamma"]
    )
    a, c, s = best_window(toks, ["alpha", "beta", "gamma"], width=15)
    assert a == 72  # 1-based position of the late "alpha"
    assert c == 3
    assert s.split()[0] == "alpha" and "gamma" in s


def test_best_window_tie_breaks_earliest():
    toks = ["a", "q", "x", "x", "x", "x", "q", "b"]
    a, c, s = best_window(toks, ["q"], width=3)
    assert (a, c) == (2, 1)  # both hits score 1; earliest anchor wins


def test_best_window_no_hits_and_width_clamp():
    assert best_window(["x", "y"], ["missing"]) is None
    a, c, s = best_window(["q"], ["q"], width=15)
    assert (a, c, s) == (1, 1, "q")  # window clamps at doc end
