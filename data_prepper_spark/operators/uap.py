"""uap-core-semantics user-agent parsing, compiled to Catalyst.

The reference wraps uap-java's CachingParser
(user-agent-processor/.../UserAgentProcessor.java:29,43-60) over the
public ua-parser/uap-core database (build.gradle:
com.github.ua-parser:uap-java:1.5.4).  This module implements the SAME
rule semantics — ordered first-match-wins rule lists with replacement
templates, exactly uap-java's match algorithm — as pure Catalyst
CASE-WHEN chains (the branch short-circuit means one rlike per rule
until the first hit, then one regexp_extract per output field; zero
per-row Python).

Rule schema mirrors uap-core regexes.yaml verbatim, so a full uap-core
database can be dropped in via ``load_regexes_yaml``:

  user_agent_parsers: regex, family_replacement, v1_replacement,
                      v2_replacement        (family $1-substituted;
                      major/minor/patch from groups 2/3/4 —
                      uap-java UserAgentParser semantics)
  os_parsers:         regex, os_replacement, os_v1..os_v3_replacement
                      (family/major/minor/patch from groups 1/2/3/4)
  device_parsers:     regex, regex_flag ('i'), device_replacement
                      ($1..$9 multi-substitution, trimmed —
                      uap-java DeviceParser semantics; the reference
                      only emits device.family, so brand/model are
                      intentionally not modeled)

The bundled ruleset below is a curated ~80-rule subset of the public
uap-core vocabulary covering the major browser/OS/device families and
crawler fleet — the same move as the bundled grok pattern vocabulary.
Output shape matches UserAgentProcessor.getParsedUserAgent
(UserAgentProcessor.java:85-118): {name, version, os{name, version,
full}, device{name}, original?} with versions joined
major[.minor[.patch]] (getFullVersion :96-105).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# ----------------------------------------------------------------- rules
# Curated subset of the public uap-core vocabulary (ua-parser/uap-core,
# Apache-2.0 data).  ORDER MATTERS — first match wins, so crawler rules
# precede browser rules (smartphone Googlebot embeds Chrome/), chromium
# shells precede Chrome, iOS browsers precede Safari.

UA_PARSERS: list[dict] = [
    # --- crawlers / bots (their UAs often embed real browser tokens) ---
    {"regex": r"(Googlebot)(?:-Image|-News|-Video|-Mobile)?/(\d+)\.(\d+)",
     "family_replacement": "Googlebot"},
    {"regex": r"(bingbot)/(\d+)\.(\d+)"},
    {"regex": r"(DuckDuckBot)[-/](\d+)\.(\d+)"},
    {"regex": r"(YandexBot)/(\d+)\.(\d+)"},
    {"regex": r"(Baiduspider)(?:[-/](\d+)\.(\d+))?"},
    {"regex": r"(Applebot)/(\d+)\.(\d+)"},
    {"regex": r"(Slackbot)(?:-LinkExpanding)?[ /](\d+)\.(\d+)"},
    {"regex": r"(Twitterbot)/(\d+)\.(\d+)"},
    {"regex": r"(facebookexternalhit)/(\d+)\.(\d+)",
     "family_replacement": "FacebookBot"},
    {"regex": r"(AhrefsBot)/(\d+)\.(\d+)"},
    {"regex": r"(SemrushBot)(?:[~/](\d+)(?:\.(\d+))?)?"},
    {"regex": r"(PetalBot)"},
    {"regex": r"(GPTBot)/(\d+)\.(\d+)"},
    {"regex": r"(ClaudeBot)/(\d+)\.(\d+)"},
    {"regex": r"(Amazonbot)/(\d+)\.(\d+)"},
    {"regex": r"(Bytespider)"},
    {"regex": r"(CCBot)/(\d+)\.(\d+)"},
    {"regex": r"(MJ12bot)/v?(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(DotBot)/(\d+)\.(\d+)"},
    # --- http tools / SDKs ---
    {"regex": r"(curl)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"([Ww]get)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Wget"},
    {"regex": r"(python-requests)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Python Requests"},
    {"regex": r"(Python-urllib)/(\d+)\.(\d+)"},
    {"regex": r"(okhttp)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Apache-HttpClient)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Go-http-client)/(\d+)(?:\.(\d+))?"},
    {"regex": r"(PostmanRuntime)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(axios)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(node-fetch)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(aiohttp)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(libwww-perl)/(\d+)\.(\d+)"},
    {"regex": r"(Java)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Dart)/(\d+)\.(\d+)"},
    {"regex": r"(Lynx)/(\d+)\.(\d+)(?:\.(\d+))?"},
    # --- chromium shells BEFORE Chrome (their UAs carry Chrome/) ---
    {"regex": r"(Electron)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(EdgA)/(\d+)(?:\.(\d+))?(?:\.(\d+))?",
     "family_replacement": "Edge Mobile"},
    {"regex": r"(EdgiOS)/(\d+)(?:\.(\d+))?(?:\.(\d+))?",
     "family_replacement": "Edge Mobile"},
    {"regex": r"(Edge|Edg)/(\d+)(?:\.(\d+))?(?:\.(\d+))?",
     "family_replacement": "Edge"},
    {"regex": r"(OPR)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Opera"},
    {"regex": r"(Opera Mini)/(\d+)\.(\d+)"},
    {"regex": r"(Opera)[ /](\d+)\.(\d+)"},
    {"regex": r"(SamsungBrowser)/(\d+)(?:\.(\d+))?",
     "family_replacement": "Samsung Internet"},
    {"regex": r"(YaBrowser)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Yandex Browser"},
    {"regex": r"(UCBrowser)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "UC Browser"},
    {"regex": r"(Vivaldi)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Brave Chrome)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Brave"},
    {"regex": r"(DuckDuckGo)/(\d+)"},
    {"regex": r"(HeadlessChrome)(?:/(\d+)\.(\d+)(?:\.(\d+))?)?"},
    {"regex": r"(OPX)/(\d+)\.(\d+)", "family_replacement": "Opera GX"},
    {"regex": r"(OPT)/(\d+)(?:\.(\d+))?", "family_replacement": "Opera Touch"},
    {"regex": r"(QQBrowser)/(\d+)(?:\.(\d+))?",
     "family_replacement": "QQ Browser"},
    {"regex": r"(MiuiBrowser)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Mi Browser"},
    {"regex": r"(HuaweiBrowser)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Huawei Browser"},
    {"regex": r"(Whale)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Silk)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Amazon Silk"},
    {"regex": r"(Konqueror)/(\d+)(?:\.(\d+))?"},
    # --- gecko shells BEFORE Firefox (their UAs carry Firefox/) ---
    {"regex": r"(SeaMonkey)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(PaleMoon)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Pale Moon"},
    {"regex": r"(Thunderbird)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Focus)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Firefox Focus"},
    # --- mobile browsers before their desktop kin ---
    {"regex": r"(CriOS)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Chrome Mobile iOS"},
    {"regex": r"(FxiOS)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Firefox iOS"},
    {"regex": r"(Chrome)/(\d+)\.(\d+)(?:\.(\d+))?[\d.]* Mobile(?:[ /]|$)",
     "family_replacement": "Chrome Mobile"},
    {"regex": r"Android[^)]*\).*(Firefox)/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Firefox Mobile"},
    {"regex": r"(Firefox)/(\d+)\.(\d+)(?:\.(\d+))?.*(?:Mobile|Tablet)",
     "family_replacement": "Firefox Mobile"},
    # --- the big four ---
    {"regex": r"(Chromium|Chrome)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(Firefox)/(\d+)\.(\d+)(?:\.(\d+))?"},
    {"regex": r"(MSIE) (\d+)\.(\d+)", "family_replacement": "IE"},
    {"regex": r"(Trident)/.*rv:(\d+)\.(\d+)", "family_replacement": "IE"},
    {"regex": r"(iPod touch|iPod|iPhone|iPad).+Version/(\d+)\.(\d+)(?:\.(\d+))?.*[ +]Safari",
     "family_replacement": "Mobile Safari"},
    {"regex": r"(iPod touch|iPod|iPhone|iPad).+Version/(\d+)\.(\d+)(?:\.(\d+))?",
     "family_replacement": "Mobile Safari UI/WKWebView"},
    {"regex": r"(Version)/(\d+)\.(\d+)(?:\.(\d+))?.*Safari/",
     "family_replacement": "Safari"},
    {"regex": r"(iPod touch|iPod|iPhone|iPad);.*CPU.*OS[ +](\d+)_(\d+)(?:_(\d+))?.*Mobile.*[ +]Safari",
     "family_replacement": "Mobile Safari"},
    {"regex": r"(Android)[ \d.]*[;)].*(?:Mobile )?Safari",
     "family_replacement": "Android"},
]

OS_PARSERS: list[dict] = [
    {"regex": r"(Windows Phone)(?: OS)? (\d+)\.(\d+)"},
    {"regex": r"(Windows NT) 10\.0", "os_replacement": "Windows",
     "os_v1_replacement": "10"},
    {"regex": r"(Windows NT) 6\.3", "os_replacement": "Windows",
     "os_v1_replacement": "8", "os_v2_replacement": "1"},
    {"regex": r"(Windows NT) 6\.2", "os_replacement": "Windows",
     "os_v1_replacement": "8"},
    {"regex": r"(Windows NT) 6\.1", "os_replacement": "Windows",
     "os_v1_replacement": "7"},
    {"regex": r"(Windows NT) 6\.0", "os_replacement": "Windows",
     "os_v1_replacement": "Vista"},
    {"regex": r"(Windows NT) 5\.1", "os_replacement": "Windows",
     "os_v1_replacement": "XP"},
    {"regex": r"(Windows NT)", "os_replacement": "Windows"},
    {"regex": r"(CrOS) [A-Za-z0-9_]+ (\d+)\.(\d+)(?:\.(\d+))?",
     "os_replacement": "Chrome OS"},
    {"regex": r"(Android)[ -](\d+)(?:\.(\d+))?(?:\.(\d+))?"},
    {"regex": r"(Android)"},
    # iOS BEFORE Mac OS X — iOS UAs say 'like Mac OS X'
    {"regex": r"(?:(iPhone|iPad|iPod touch|iPod)).*OS[ +](\d+)[_.](\d+)(?:[_.](\d+))?",
     "os_replacement": "iOS"},
    {"regex": r"(iPhone|iPad|iPod touch|iPod)", "os_replacement": "iOS"},
    {"regex": r"(Mac OS X) (\d+)[_.](\d+)(?:[_.](\d+))?"},
    {"regex": r"(Mac OS X)"},
    {"regex": r"(Windows Phone)"},
    {"regex": r"(Tizen)[ /](\d+)\.(\d+)"},
    {"regex": r"(KAIOS|KaiOS)/(\d+)\.(\d+)", "os_replacement": "KaiOS"},
    {"regex": r"(FreeBSD)"},
    {"regex": r"(OpenBSD)"},
    {"regex": r"(NetBSD)"},
    # named distros BEFORE generic Linux
    {"regex": r"(Ubuntu)"},
    {"regex": r"(Fedora)"},
    {"regex": r"(Debian)"},
    {"regex": r"(CentOS)"},
    {"regex": r"(Linux)"},
]

DEVICE_PARSERS: list[dict] = [
    {"regex": r"googlebot|bingbot|yandexbot|duckduckbot|baiduspider|"
              r"slackbot|twitterbot|facebookexternalhit|ahrefsbot|"
              r"semrushbot|applebot|petalbot|gptbot|mediapartners-google|"
              r"adsbot-google|crawler|spider|"
              r"[a-z0-9_.-]*bot(?:[/ ;)]|$)",
     "regex_flag": "i", "device_replacement": "Spider"},
    {"regex": r"(SM-[A-Za-z0-9]+)", "device_replacement": "Samsung $1"},
    {"regex": r"(iPhone)", "device_replacement": "iPhone"},
    {"regex": r"(iPad)", "device_replacement": "iPad"},
    {"regex": r"(iPod touch|iPod)", "device_replacement": "iPod"},
    {"regex": r"Android[ \d.]*; (?:Mobile|Tablet); rv:",
     "device_replacement": "Generic Smartphone"},
    {"regex": r"Android[ \d.]*; ?([^;/)]+?)(?: Build[^)]*)?\)",
     "device_replacement": "$1"},
    {"regex": r"(Kindle)/(?:\d+\.\d+)", "device_replacement": "Kindle"},
    {"regex": r"(PlayStation \d+)", "device_replacement": "$1"},
    {"regex": r"(Xbox)", "device_replacement": "Xbox"},
    {"regex": r"(Macintosh)", "device_replacement": "Mac"},
    {"regex": r"(Windows Phone)", "device_replacement": "Lumia"},
]


def load_regexes_yaml(path: str) -> tuple[list[dict], list[dict], list[dict]]:
    """Load a full uap-core regexes.yaml (same schema as the bundled
    subset).  Gated on PyYAML being importable."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "load_regexes_yaml requires PyYAML; the bundled uap-core "
            "subset is used by default"
        ) from e
    with open(path) as f:
        db = yaml.safe_load(f)
    return (
        db.get("user_agent_parsers", []),
        db.get("os_parsers", []),
        db.get("device_parsers", []),
    )


# ---------------------------------------------------------------- engine

def _group_count(pattern: str) -> int:
    """Count capturing groups (paren-scanner — patterns stay in the
    Java/Python-common regex subset)."""
    n, i, in_class = 0, 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(" and not pattern[i + 1 : i + 2] == "?":
            n += 1
        i += 1
    return n


def _template(src: Column, pattern: str, tmpl: str, trim: bool = False) -> Column:
    """$1..$9 substitution into a literal template (uap-java's
    replacement semantics; Device results are trimmed)."""
    parts = re.split(r"\$(\d)", tmpl)
    cols: list[Column] = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                cols.append(F.lit(p))
        else:
            cols.append(F.regexp_extract(src, pattern, int(p)))
    if not cols:
        return F.lit("")
    out = cols[0] if len(cols) == 1 else F.concat(*cols)
    return F.trim(out) if trim else out


def _field(src: Column, pattern: str, repl: str | None, group: int,
           n_groups: int, trim: bool = False) -> Column:
    if repl is not None:
        return _template(src, pattern, repl, trim)
    if n_groups >= group:
        return F.regexp_extract(src, pattern, group)
    return F.lit("")


def _flag_pattern(rule: dict) -> str:
    pat = rule["regex"]
    return "(?i)" + pat if rule.get("regex_flag") == "i" else pat


def _chain(src: Column, rules: list[dict], extract) -> list[Column]:
    """First-match-wins CASE-WHEN chain over `rules`; `extract(rule,
    pattern)` yields the per-rule output columns.  Returns one chained
    Column per output position (no otherwise — caller adds defaults)."""
    chains: list[Column | None] = None
    for rule in rules:
        pat = _flag_pattern(rule)
        cond = src.rlike(pat)
        vals = extract(rule, pat)
        if chains is None:
            chains = [F.when(cond, v) for v in vals]
        else:
            chains = [c.when(cond, v) for c, v in zip(chains, vals)]
    return chains or []


def _join_version(major: Column, minor: Column, patch: Column) -> Column:
    """getFullVersion (UserAgentProcessor.java:96-105) with '' as the
    schema-world null."""
    return F.when(major == "", F.lit("")).otherwise(
        F.concat(
            major,
            F.when(minor == "", F.lit("")).otherwise(
                F.concat(
                    F.lit("."), minor,
                    F.when(patch == "", F.lit("")).otherwise(
                        F.concat(F.lit("."), patch)
                    ),
                )
            ),
        )
    )


def parse_user_agent(
    df: DataFrame,
    source: str,
    target: str = "user_agent",
    exclude_original: bool = False,
    ua_rules: list[dict] | None = None,
    os_rules: list[dict] | None = None,
    device_rules: list[dict] | None = None,
) -> DataFrame:
    """uap-semantics parse of a UA string column → the reference's
    output struct (UserAgentProcessor.getParsedUserAgent :85-118):
    {name, version, os{name, version, full}, device{name}[, original]}."""
    src = F.col(source)
    uas = ua_rules if ua_rules is not None else UA_PARSERS
    oss = os_rules if os_rules is not None else OS_PARSERS
    devs = device_rules if device_rules is not None else DEVICE_PARSERS

    def ua_extract(rule: dict, pat: str):
        n = _group_count(rule["regex"])
        fam = rule.get("family_replacement")
        return (
            _field(src, pat, fam, 1, n),
            _field(src, pat, rule.get("v1_replacement"), 2, n),
            _field(src, pat, rule.get("v2_replacement"), 3, n),
            _field(src, pat, None, 4, n),
        )

    def os_extract(rule: dict, pat: str):
        n = _group_count(rule["regex"])
        return (
            _field(src, pat, rule.get("os_replacement"), 1, n),
            _field(src, pat, rule.get("os_v1_replacement"), 2, n),
            _field(src, pat, rule.get("os_v2_replacement"), 3, n),
            _field(src, pat, rule.get("os_v3_replacement"), 4, n),
        )

    def dev_extract(rule: dict, pat: str):
        n = _group_count(rule["regex"])
        return (_field(src, pat, rule.get("device_replacement"), 1, n, trim=True),)

    ua_f, ua_1, ua_2, ua_3 = [
        c.otherwise(F.lit(d))
        for c, d in zip(_chain(src, uas, ua_extract), ["Other", "", "", ""])
    ]
    os_f, os_1, os_2, os_3 = [
        c.otherwise(F.lit(d))
        for c, d in zip(_chain(src, oss, os_extract), ["Other", "", "", ""])
    ]
    (dev_f,) = [
        c.otherwise(F.lit("Other")) for c in _chain(src, devs, dev_extract)
    ]

    version = _join_version(ua_1, ua_2, ua_3)
    os_version = _join_version(os_1, os_2, os_3)
    os_full = F.when(os_version == "", os_f).otherwise(
        F.concat(os_f, F.lit(" "), os_version)
    )
    fields = [
        ua_f.alias("name"),
        version.alias("version"),
        F.struct(
            os_f.alias("name"), os_version.alias("version"), os_full.alias("full")
        ).alias("os"),
        F.struct(dev_f.alias("name")).alias("device"),
    ]
    if not exclude_original:
        fields.append(src.alias("original"))
    return df.withColumn(target, F.struct(*fields))
