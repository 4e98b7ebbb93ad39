"""robots.txt parsing and matching (RFC 9309, the Robots Exclusion Protocol).

A compliant crawl pipeline must evaluate every candidate URL against its
host's robots.txt before fetch — and a *retention* pipeline re-evaluates at
curation time (pages whose host has since disallowed crawling get dropped).
This kernel parses the file once per host; rule evaluation then happens
either here (full wildcard support) or JVM-side in ``operators/robots.py``
(prefix rules — the overwhelmingly common case — as pure column
expressions over the parsed rule array).

Matching rules (RFC 9309 §2.2):
* groups are selected by user-agent product token — exact (case-insensitive)
  match wins over ``*``; adjacent ``User-agent`` lines share one group;
* the rule with the longest matched pattern wins; on a length tie, allow
  wins over disallow;
* an empty ``Disallow:`` matches nothing; no matching rule means allowed;
* ``*`` in a pattern matches any char run; ``$`` anchors the end.

Paths and patterns are compared verbatim, i.e. in the percent-encoded form
URLs arrive in (RFC 9309 §2.2.2 compares octets of the encoded form; do not
decode before matching — ``/a%2Fb`` and ``/a/b`` are different paths).
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional


class RobotsRule(NamedTuple):
    allow: bool
    pattern: str


def _parse_groups(
    text: str,
) -> tuple[dict[str, list[RobotsRule]], dict[str, float], list[str]]:
    """(rule groups, crawl-delay per group, sitemap URLs).

    Sitemaps are file-global (the Sitemaps protocol, not group-scoped);
    Crawl-delay is the de-facto group-scoped extension every major crawler
    honors.  Group bookkeeping: adjacent ``User-agent`` lines share one
    group; any directive line ends the adjacency run.  Multiple groups
    naming the same token are combined (RFC 9309 §2.2.1: "the matching
    groups' rules MUST be combined into one group") — real robots.txt
    files do repeat ``User-agent: *``, and dropping the later group would
    fail open (evaluation defaults to allow).
    """
    runs: list[tuple[list[str], list[RobotsRule]]] = []
    delays: dict[str, float] = {}
    sitemaps: list[str] = []
    current: list[RobotsRule] = []
    current_agents: list[str] = []
    rules_seen_since_agent = True  # adjacent User-agent lines share a group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_seen_since_agent:
                current = []
                current_agents = []
                runs.append((current_agents, current))
                rules_seen_since_agent = False
            current_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            rules_seen_since_agent = True
            if value:  # empty Disallow matches nothing — drop it
                current.append(RobotsRule(field == "allow", value))
        elif field == "sitemap":
            rules_seen_since_agent = True
            if value:
                sitemaps.append(value)
        elif field == "crawl-delay":
            rules_seen_since_agent = True
            try:
                delay = float(value)
            except ValueError:
                continue
            for name in current_agents:
                delays.setdefault(name, delay)
        else:  # unknown fields — not rules
            rules_seen_since_agent = True
    # Combine groups per token (RFC 9309 §2.2.1). A token repeated inside
    # one adjacency run contributes its rules once.
    groups: dict[str, list[RobotsRule]] = {}
    for agents, rules in runs:
        for name in dict.fromkeys(agents):
            groups.setdefault(name, []).extend(rules)
    return groups, delays, sitemaps


def parse_robots(text: str, agent: str = "*") -> list[RobotsRule]:
    """Rules of the group governing ``agent`` (RFC group selection)."""
    agent = agent.lower()
    groups, _, _ = _parse_groups(text)
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def robots_directives(text: str, agent: str = "*") -> dict:
    """Non-rule directives: ``{"sitemaps": [...], "crawl_delay": float|None}``.

    ``crawl_delay`` follows the same group selection as rules (exact agent
    match wins over ``*``; absent means no delay declared).
    """
    agent = agent.lower()
    _, delays, sitemaps = _parse_groups(text)
    delay = delays.get(agent, delays.get("*"))
    return {"sitemaps": sitemaps, "crawl_delay": delay}


def _pattern_regex(pattern: str) -> str:
    # '*' -> any run; trailing '$' -> end anchor; everything else literal.
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return "^" + body + ("$" if anchored else "")


def match_len(pattern: str, path: str) -> Optional[int]:
    """Length of ``pattern`` if it matches ``path``, else None.

    RFC "longest match" counts the pattern's octets (wildcards included),
    which is what real implementations (e.g. Googlebot's published matcher)
    compare — not the matched span length.
    """
    if "*" not in pattern and "$" not in pattern:
        return len(pattern) if path.startswith(pattern) else None
    return len(pattern) if re.match(_pattern_regex(pattern), path) else None


def is_allowed(rules: list[RobotsRule], path: str) -> bool:
    """Longest-match-wins evaluation; allow wins ties; default allow."""
    best: tuple[int, bool] = (-1, True)
    for rule in rules:
        length = match_len(rule.pattern, path)
        if length is None:
            continue
        # (len, allow) tuple compare: longer wins; same len -> allow(True)
        # sorts above disallow(False).
        if (length, rule.allow) > best:
            best = (length, rule.allow)
    return best[1]
