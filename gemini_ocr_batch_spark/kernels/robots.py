"""robots.txt parsing kernel (RFC 9309 / original REP subset).

A crawl-curation pipeline is expected to honor robots rules
retroactively: given each domain's robots.txt capture, drop archived
pages the site disallowed.  This kernel parses the rule group for a
user-agent; the Spark operator (`operators/blocklist.robots_filter`)
evaluates the rules per url with the same first-match semantics.

Semantics (deliberately the stdlib-`urllib.robotparser`-compatible
subset, so the matcher can be fuzz-twinned against ``can_fetch``):

- the first ``User-agent`` group matching the agent applies ('*' is the
  default group; agent matching is a case-insensitive token test);
- within the group, rules apply in FILE ORDER and the FIRST rule whose
  path is a string prefix of the url path decides (stdlib behavior);
- ``Disallow:`` with an empty path allows everything; ``Allow:`` with
  an empty path matches everything;
- no ``*``/``$`` wildcards and no %-normalization — out of the shared
  subset, documented; a rule containing ``*`` or ``$`` is kept as a
  literal prefix (never silently re-interpreted).

The reference repo has no crawl-politeness analog; this follows the
public specs only.
"""

from __future__ import annotations


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt → ordered [(path_prefix, allow)] rules for ``agent``.

    Returns the applicable group's rules in file order (empty list =
    everything allowed).  Never raises on junk input.
    """
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    seen_rule = False  # a User-agent line after rules starts a new group

    def flush() -> None:
        nonlocal cur_agents, cur_rules, seen_rule
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, seen_rule = [], [], False

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if seen_rule:
                flush()
            cur_agents.append(value.lower())
        elif field in ("disallow", "allow") and cur_agents:
            seen_rule = True
            if field == "disallow" and value == "":
                # empty Disallow = allow all (matches everything, allow)
                cur_rules.append(("", True))
            else:
                cur_rules.append((value, field == "allow"))
    flush()

    # exact-agent group first (stdlib: first applicable entry wins,
    # '*' only as fallback)
    for agents, rules in groups:
        if any(a != "*" and a in agent for a in agents):
            return rules
    for agents, rules in groups:
        if "*" in agents:
            return rules
    return []


def robots_allows(rules: list[tuple[str, bool]], path: str) -> bool:
    """First-match decision over :func:`parse_robots` output (pure-python
    twin of the Spark matcher; default allow)."""
    if not path.startswith("/"):
        path = "/" + path
    for prefix, allow in rules:
        if prefix == "" or path.startswith(prefix):
            return allow
    return True
