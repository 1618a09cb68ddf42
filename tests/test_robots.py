"""RFC 9309 robots.txt kernel (kernel/robots.py): group selection,
longest-match precedence, wildcards/anchors, fail-open containment."""

from gmft_spark.kernel.robots import (
    parse_robots,
    robots_allowed,
    robots_decision,
)

_BASIC = """
# comment line
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/pub/
"""


def test_star_group_and_precedence():
    rules = parse_robots(_BASIC, "gmftbot")
    assert robots_decision(rules, "/private/x")[0] is False
    assert robots_decision(rules, "/private/pub/x")[0] is True  # longer allow
    assert robots_decision(rules, "/other") == (True, 0)


def test_agent_group_longest_prefix_wins():
    txt = (
        "User-agent: gmft\nDisallow: /a/\n\n"
        "User-agent: gmftbot\nDisallow: /b/\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # exact product token prefers its own (longest-prefix) group
    assert robots_allowed(txt, "/a/x", "gmftbot") is True
    assert robots_allowed(txt, "/b/x", "gmftbot") is False
    # an unrelated bot falls to the * deny-all
    assert robots_allowed(txt, "/anything", "otherbot") is False
    # case-insensitive agent match
    assert robots_allowed(txt, "/b/x", "GMFTBOT") is False


def test_multi_agent_group_and_merging():
    txt = (
        "User-agent: a\nUser-agent: b\nDisallow: /x/\n\n"
        "User-agent: b\nDisallow: /y/\n"
    )
    # group with two agent lines applies to both; same-token groups merge
    assert robots_allowed(txt, "/x/1", "a") is False
    assert robots_allowed(txt, "/x/1", "b") is False
    assert robots_allowed(txt, "/y/1", "b") is False
    assert robots_allowed(txt, "/y/1", "a") is True


def test_wildcards_and_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*core\n"
    rules = parse_robots(txt)
    assert robots_decision(rules, "/docs/a.pdf")[0] is False
    assert robots_decision(rules, "/docs/a.pdfx")[0] is True  # $ anchors
    assert robots_decision(rules, "/tmp/deep/core")[0] is False
    assert robots_decision(rules, "/tmpcore")[0] is False
    assert robots_decision(rules, "/core")[0] is True


def test_tie_breaks_least_restrictive():
    txt = "User-agent: *\nDisallow: /p/ab\nAllow: /p/ab\n"
    ok, ln = robots_decision(parse_robots(txt), "/p/abc")
    assert (ok, ln) == (True, 5)


def test_empty_disallow_and_fail_open():
    assert robots_allowed("User-agent: *\nDisallow:\n", "/anything") is True
    # malformed noise: no applicable rules → allowed
    assert robots_allowed("%%% not robots at all", "/x") is True
    assert robots_allowed("Disallow: /orphan\n", "/orphan") is True
    assert robots_allowed("", "/x") is True


def test_hostile_rule_count_capped():
    txt = "User-agent: *\n" + "".join(
        f"Disallow: /p{i}\n" for i in range(10_000)
    )
    rules = parse_robots(txt)
    assert len(rules) == 5000  # _MAX_RULES cap
    assert robots_decision(rules, "/p42")[0] is False


def test_empty_user_agent_token_matches_nothing():
    txt = (
        "User-agent:\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /private/\n"
    )
    # the '' group must not mask the * group
    assert robots_allowed(txt, "/private/x", "anybot") is False
    assert robots_allowed(txt, "/a", "anybot") is True


def test_many_star_rule_is_linear_not_backtracking():
    # before the glob matcher this regex-compiled to stacked '.*'
    # groups and backtracked catastrophically on near-miss paths
    import time

    pattern = "/" + "*a" * 24 + "$"
    txt = f"User-agent: *\nDisallow: {pattern}\n"
    rules = parse_robots(txt)
    path = "/" + "a" * 5000 + "b"  # near-miss: fails only at the end
    t0 = time.time()
    ok, _ = robots_decision(rules, path)
    assert time.time() - t0 < 2.0
    assert ok is True  # 'b' tail defeats the $-anchored match
    assert robots_decision(rules, "/" + "a" * 100)[0] is False
