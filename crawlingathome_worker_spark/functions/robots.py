"""robots.txt → gate-ready rules (RFC 9309 subset) — completes the J6 chain.

The reference has no robots handling at all (VERDICT r2+: politeness is an
engine extension mandated by the north rule); `robots_gate`
(operators/politeness.py) consumes PRE-PARSED rules
`(host, disallow_prefixes, crawl_delay)`. This module parses raw fetched
robots.txt bodies into exactly that shape, so the chain runs from bytes on
the wire to the broadcast gate.

PINNED SEMANTICS — the subset of RFC 9309 (plus the de-facto Crawl-delay
extension) that the downstream gate can express. Shared contract for the
engine parser here, the independent golden reimplementation
(tests/golden_queries.py g45), and the fixture renderer
(sources/fixtures.py gen_robots_txt):

1.  Lines split on "\n"; a trailing "\r" is tolerated (CRLF input).
2.  "#" starts a comment — the rest of the line is dropped (RFC 9309 §2.2.4).
3.  A surviving line without ":" is ignored. Otherwise
    key = text before the FIRST ":", trimmed, lowercased;
    value = text after it, trimmed.
4.  Recognized keys: "user-agent", "disallow", "crawl-delay". EVERY other
    line (allow, sitemap, host, garbage) is ignored entirely and is
    INVISIBLE to grouping (RFC 9309 §2.2.3: ignore unrecognized rules) —
    "Allow" is deliberately out of the subset because the gate consumes
    disallow prefixes only.
5.  Grouping over the recognized-line sequence (RFC 9309 §2.2.1):
    consecutive user-agent lines STACK into one group header (blank /
    comment / unrecognized lines in between do not break the stack); the
    first rule line after a header closes it; a user-agent line after rules
    starts a new group. Rules before any user-agent line are ignored.
6.  Agent match per group: specificity 2 if any stacked agent value equals
    the crawler's product token case-insensitively, 1 if any is "*",
    else 0. ALL groups at the highest nonzero specificity merge, rules in
    document order (RFC 9309 §2.2.1: groups for the same agent combine).
    No nonzero group ⇒ no rules: ([], None).
7.  disallow_prefixes: the non-empty Disallow values of the merged groups in
    document order, duplicates kept (an empty Disallow means allow-all and
    contributes nothing).
8.  crawl_delay: the LAST Crawl-delay of the merged groups whose value is a
    nonnegative decimal literal (``\\d+(\\.\\d+)?`` — no sign, exponent,
    inf/nan, or locale forms); None if no such line exists.
"""

from __future__ import annotations

import re

_DELAY_RE = re.compile(r"\d+(\.\d+)?")

_RULE_KEYS = ("disallow", "crawl-delay")


def parse_robots_body(
    body: str | None, agent: str = "cah-worker"
) -> tuple[list[str], float | None]:
    """Parse one robots.txt body per the pinned semantics above.

    → (disallow_prefixes in document order, crawl_delay or None). Pure and
    deterministic; the Spark operator (operators/politeness.py
    parse_robots_txt) Arrow-batches this over the per-host dim table.
    """
    if not body:
        return [], None
    agent_lc = agent.lower()
    # groups: (stacked agent values lowercased, rule lines in document order)
    groups: list[tuple[set, list]] = []
    cur: tuple[set, list] | None = None
    in_header = False
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_header:
                cur = (set(), [])
                groups.append(cur)
                in_header = True
            cur[0].add(value.lower())
        elif key in _RULE_KEYS:
            if cur is None:
                continue  # rule before any group header (rule 5)
            in_header = False
            cur[1].append((key, value))
        # else: unrecognized line — invisible, including to header stacking

    def _spec(agents: set) -> int:
        return 2 if agent_lc in agents else (1 if "*" in agents else 0)

    best = max((_spec(a) for a, _ in groups), default=0)
    if best == 0:
        return [], None
    prefixes: list[str] = []
    delay: float | None = None
    for agents, rules in groups:
        if _spec(agents) != best:
            continue
        for key, value in rules:
            if key == "disallow":
                if value:
                    prefixes.append(value)
            elif _DELAY_RE.fullmatch(value):
                delay = float(value)
    return prefixes, delay
