"""robots.txt parsing → politeness table (north_star: "enforces robots.txt
and per-host crawl-delay").

The reference has no robots handling (its politeness is sequentiality);
this implements the minimal RFC 9309 subset a crawler needs: user-agent
groups, Disallow path prefixes, Crawl-delay. Parsing is a pure function
(property-testable) lifted over a robots corpus with a vectorized batch
UDF; the output rows feed ``CrawlEngine``'s politeness table, whose
``apply_robots`` stage enforces the prefixes JVM-side every round.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.canonicalize import host_of


def _normalize_rule(val: str) -> str:
    """RFC 9309 rule values are path patterns and MUST start with ``/`` —
    but the wild ships ``Allow: *.html`` (explicit leading wildcard, a
    well-defined pattern: match anywhere) and ``Disallow: admin`` (a bare
    word). The bare word is normalized to ``/admin``: matching it
    unanchored would let a short malformed Allow override a longer valid
    Disallow, the unsafe direction (round-4 ADVICE). Leading-wildcard
    patterns are kept verbatim."""
    if not val or val.startswith(("/", "*")):
        return val
    return "/" + val


def parse_robots(
    text: str | bytes | None, user_agent: str = "*"
) -> dict:
    """→ {"disallow": [patterns], "allow": [patterns],
    "crawl_delay_ms": int | None}.

    Group selection per RFC 9309: the most specific matching User-agent
    group wins (longest agent token that is a prefix of ``user_agent`` or
    ``*``); multiple UA lines stack onto one group; rules end at the next
    UA line that follows at least one rule. Patterns are kept VERBATIM —
    including RFC 9309 §2.2.3 wildcards (``*`` anywhere, ``$`` end
    anchor); matching semantics (longest-match, allow wins ties) live in
    ``politeness.apply_robots``, where Allow rules ride the politeness
    disallow array as ``"!"``-prefixed entries (paths always start with
    ``/``, so the sentinel is unambiguous).
    """
    if text is None:
        return {"disallow": [], "allow": [], "crawl_delay_ms": None}
    if isinstance(text, (bytes, bytearray, memoryview)):
        text = bytes(text).decode("utf-8", errors="replace")

    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    cur_allow: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_allow, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_allow, cur_delay))
        cur_agents, cur_rules, cur_allow, cur_delay, in_rules = (
            [], [], [], None, False,
        )

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            val = _normalize_rule(val)
            if val:
                cur_rules.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key == "allow":
            in_rules = True
            val = _normalize_rule(val)
            if val:
                cur_allow.append(val)
        elif key == "sitemap":
            in_rules = True  # group marker only; handled by sitemaps.py
    flush()

    ua = user_agent.lower()

    def _score(a: str) -> int | None:
        # prefix match (as documented): 'spark' must NOT capture
        # 'crawler-spark' the way substring containment did — that made
        # the crawler obey another bot's group over its own '*' fallback
        if a == "*":
            return 0
        if a and ua.startswith(a):
            return len(a)
        return None

    best_score: int | None = None
    for agents, _rules, _allow, _delay in groups:
        for a in agents:
            s = _score(a)
            if s is not None and (best_score is None or s > best_score):
                best_score = s
    if best_score is None:
        return {"disallow": [], "allow": [], "crawl_delay_ms": None}
    # RFC 9309 §2.2.1: ALL groups at the winning specificity combine —
    # sites routinely ship two 'User-agent: *' sections and taking only
    # the first silently dropped the later one's Disallow rules
    out_rules: list[str] = []
    out_allow: list[str] = []
    out_delay: float | None = None
    for agents, rules, allow, delay in groups:
        if any(_score(a) == best_score for a in agents):
            out_rules.extend(rules)
            out_allow.extend(allow)
            if out_delay is None and delay is not None:
                out_delay = delay  # first declared delay wins
    return {
        "disallow": out_rules,
        "allow": out_allow,
        "crawl_delay_ms": (
            int(out_delay * 1000) if out_delay is not None else None
        ),
    }


ROBOTS_POLITENESS_SCHEMA = (
    "host string, crawl_delay_ms long, budget_per_round int, "
    "disallow array<string>"
)


def politeness_from_robots(
    robots_pages: DataFrame,
    user_agent: str = "crawler-spark",
    default_delay_ms: int = 0,
    default_budget: int = 1000,
) -> DataFrame:
    """(url, html) rows of fetched ``/robots.txt`` files → politeness rows.

    One row per host; hosts without a robots file simply don't appear
    (engine default budget applies). Batch-vectorized parse.
    """
    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"host": [], "crawl_delay_ms": [], "budget_per_round": [],
                   "disallow": []}
            for url, body in zip(pdf["url"], pdf["html"]):
                host = host_of(url)
                if not host:
                    continue
                # parse_robots accepts str OR bytes — a bytes() wrapper
                # here crashed on pages tables carrying html as string
                parsed = parse_robots(body, user_agent)
                out["host"].append(host)
                out["crawl_delay_ms"].append(
                    parsed["crawl_delay_ms"]
                    if parsed["crawl_delay_ms"] is not None
                    else default_delay_ms
                )
                out["budget_per_round"].append(default_budget)
                out["disallow"].append(
                    parsed["disallow"]
                    + ["!" + a for a in parsed["allow"]]
                )
            yield pd.DataFrame(out)

    return (
        robots_pages.where(F.col("url").endswith("/robots.txt"))
        .select("url", "html")
        .mapInPandas(_parse, ROBOTS_POLITENESS_SCHEMA)
        .dropDuplicates(["host"])
    )


def robots_wave(
    host_urls: DataFrame,
    timeout_s: float = 20.0,
    user_agent: str = "crawler-spark/0.1",
    default_delay_ms: int = 0,
    default_budget: int = 1000,
    probed_round: int = 0,
) -> DataFrame:
    """Live robots.txt acquisition: one GET per host, distributed.

    ``host_urls``: (host, url) rows — one REPRESENTATIVE full URL per host
    (the scheme+netloc, ports included, come from it; the bare host column
    has no port). Each host's ``<scheme>://<netloc>/robots.txt`` is fetched
    through the same live fetch stage the crawl uses (per-host openers,
    politeness-ready), then parsed with ``parse_robots``.

    Every probed host gets a row, per RFC 9309 §2.3.1:

    * **200** — parsed rules;
    * **4xx / missing** (»unavailable«, §2.3.1.3) — explicit allow-all;
    * **5xx / network error / timeout** (»unreachable«, §2.3.1.4) —
      complete DISALLOW (``disallow=["/"]``), and the row's
      ``probe_status`` marks it TRANSIENT: the engine excludes transient
      rows from its probed-host anti-join, so the host is re-probed on
      the next wave instead of being blocked (or worse, allowed) forever
      on one flaky response.

    The extra ``probe_status`` / ``probed_round`` columns are engine
    bookkeeping (transient-retry + TTL re-probe) — drop them before
    joining with user-supplied politeness rows.
    """
    from crawler_spark.operators.fetch import live_fetch

    batch = host_urls.select(
        F.concat(
            F.regexp_extract("url", r"^([a-z][a-z0-9+.\-]*://[^/]+)", 1),
            F.lit("/robots.txt"),
        ).alias("url"),
        "host",
        F.lit(0).alias("attempts"),
    )
    fetched = live_fetch(batch, timeout_s=timeout_s, user_agent=user_agent)

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"host": [], "crawl_delay_ms": [], "budget_per_round": [],
                   "disallow": [], "probe_status": []}
            for host, body, status in zip(
                pdf["host"], pdf["body"], pdf["status"]
            ):
                status = int(status)
                if status == 200 and body is not None:
                    parsed = parse_robots(bytes(body), user_agent)
                elif 400 <= status < 500:
                    parsed = {"disallow": [], "allow": [],
                              "crawl_delay_ms": None}
                else:  # 5xx / -1 network / timeout: unreachable ⇒ disallow
                    parsed = {"disallow": ["/"], "allow": [],
                              "crawl_delay_ms": None}
                out["host"].append(host)
                out["crawl_delay_ms"].append(
                    parsed["crawl_delay_ms"]
                    if parsed["crawl_delay_ms"] is not None
                    else default_delay_ms
                )
                out["budget_per_round"].append(default_budget)
                out["disallow"].append(
                    parsed["disallow"]
                    + ["!" + a for a in parsed["allow"]]
                )
                out["probe_status"].append(status)
            yield pd.DataFrame(out)

    return (
        fetched.select("host", "body", "status")
        .mapInPandas(_parse, ROBOTS_POLITENESS_SCHEMA + ", probe_status int")
        .withColumn("probed_round", F.lit(int(probed_round)))
        .dropDuplicates(["host"])
    )
