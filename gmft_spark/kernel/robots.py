"""From-scratch robots.txt parser + matcher (RFC 9309, the Robots
Exclusion Protocol).

A crawl-derived corpus is expected to honor robots rules; this kernel
gives the pipeline that stage without external dependencies:

* group structure: consecutive ``User-agent`` lines open a group whose
  ``Allow``/``Disallow`` rules follow; the group whose agent token is
  the LONGEST case-insensitive substring-prefix match of the product
  token applies, else the ``*`` group (RFC 9309 §2.2.1);
* rule matching: byte-wise path prefix with ``*`` (any octet sequence)
  and ``$`` (end anchor) wildcards (§2.2.3);
* precedence: the MOST SPECIFIC rule wins — longest pattern in octets;
  on an exact length tie the least restrictive (Allow) wins (§2.2.2);
* an empty ``Disallow:`` value means allow-everything; files that
  fail to parse or carry no applicable group default to allowed
  (crawlers fail open on malformed robots, §2.3.1.2-.4 spirit —
  unreachable-robots handling is a fetch-layer policy, not ours).

``parse_robots`` → list of (pattern, allow) rules for one agent;
``robots_decision`` → (allowed, winning-pattern length) so callers can
bind WHY a page was kept. Pure functions; the Spark operator
(operators/webcorpus.robots_filter) broadcasts parsed rule lists and
evaluates inside a narrow map.
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["parse_robots", "robots_decision", "robots_allowed"]

_MAX_RULES = 5000  # hostile-input cap per agent group


def _clean(line: str) -> str:
    # comments start at '#'; surrounding whitespace is insignificant
    return line.split("#", 1)[0].strip()


def parse_robots(text: str, agent: str = "*") -> List[Tuple[str, bool]]:
    """robots.txt body → [(path_pattern, allow)] for ``agent``.

    Picks the group whose ``User-agent`` token is the longest
    case-insensitive prefix of ``agent`` (the ``*`` group as fallback),
    merging multiple groups with the same token (§2.2.1)."""
    agent_l = agent.lower()
    groups: dict = {}
    current: List[str] = []
    rules_open = False
    for raw in text.splitlines():
        line = _clean(raw)
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_open:
                current = []
                rules_open = False
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, [])
        elif field in ("allow", "disallow"):
            rules_open = True
            if not current:
                continue  # rule before any user-agent line: ignored
            if field == "disallow" and value == "":
                rule = None  # empty disallow = no restriction
            else:
                rule = (value, field == "allow")
            for a in current:
                lst = groups.setdefault(a, [])
                if rule is not None and len(lst) < _MAX_RULES:
                    lst.append(rule)
        # other fields (crawl-delay, sitemap, ...) don't affect matching
    best = None
    for a in groups:
        # an empty token matches nothing (it would otherwise
        # startswith-match EVERY agent and mask the '*' group)
        if a and a != "*" and agent_l.startswith(a):
            if best is None or len(a) > len(best):
                best = a
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def _glob_match(pattern: str, s: str) -> bool:
    """Iterative glob full-match ('*' = any octet run) — the classic
    two-pointer backtrack-to-last-star algorithm, O(|pattern|·|s|)
    worst case with NO regex engine underneath, so a hostile
    many-star robots rule cannot trigger catastrophic backtracking
    (consecutive stars cost nothing here)."""
    pi = si = 0
    star = -1
    mark = 0
    np_, ns = len(pattern), len(s)
    while si < ns:
        if pi < np_ and (pattern[pi] == s[si]):
            pi += 1
            si += 1
        elif pi < np_ and pattern[pi] == "*":
            star = pi
            mark = si
            pi += 1
        elif star >= 0:
            pi = star + 1
            mark += 1
            si = mark
        else:
            return False
    while pi < np_ and pattern[pi] == "*":
        pi += 1
    return pi == np_


def _rule_matches(pattern: str, path: str) -> bool:
    """RFC 9309 rule match: anchored at the path start; a trailing
    ``$`` anchors the end, otherwise any suffix may follow (prefix
    semantics = glob-match against ``pattern + '*'``)."""
    if pattern.endswith("$"):
        return _glob_match(pattern[:-1], path)
    return _glob_match(pattern + "*", path)


def robots_decision(
    rules: List[Tuple[str, bool]], path: str
) -> Tuple[bool, int]:
    """(allowed, winning-pattern length-in-octets). Most specific rule
    wins; Allow wins exact-length ties; no match → allowed (len 0)."""
    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        if not pattern:
            continue
        if _rule_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    if best_len < 0:
        return True, 0
    return best_allow, best_len


def robots_allowed(text: str, path: str, agent: str = "*") -> bool:
    """One-shot convenience: is ``path`` fetchable for ``agent``?"""
    return robots_decision(parse_robots(text, agent), path)[0]
