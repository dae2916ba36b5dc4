"""Public-Suffix-List registered domains (eTLD+1).

Why the frontier needs this: politeness grouping, hot-domain salting
and DOMAIN-match index queries (reference F1 semantics,
/root/reference/cmoncrawl/aggregator/utils/athena_query_maker.py:10-33,
which matches on the index's url_host_registered_domain column) must
treat ``a.foo.co.uk`` and ``b.foo.co.uk`` as ONE domain (foo.co.uk) —
a last-two-labels heuristic wrongly groups every ``*.co.uk`` site
under ``co.uk``, merging thousands of distinct owners into one
politeness bucket / one salting key.

The snapshot below is a CURATED SUBSET of the public-knowledge rule
set published at publicsuffix.org (same format: one rule per line,
``*.`` wildcards, ``!`` exceptions, ``//`` comments). It covers the
multi-label ccTLD registrations that dominate web-crawl traffic plus
common private-section suffixes; the implicit PSL default rule ``*``
(any unlisted TLD is a public suffix) handles everything else. A
deployment swaps in the full publicsuffix.org snapshot — same format,
same loader, zero code change.

Scale design: the rule table is tiny (hundreds of rows; the full list
is ~10k), so registered-domain derivation is K left BROADCAST hash
joins (one per candidate suffix length) — all JVM-side, no shuffle,
no UDF, whole-stage codegen. ``registered_domain_py`` is the plain-
Python twin used for golden vectors and differential tests.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Curated subset of the publicsuffix.org rules (public knowledge; see
# module docstring). Format identical to the published list.
PSL_SNAPSHOT = """
// ---- ICANN section (curated) ----
// uk
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
ac.uk
gov.uk
nhs.uk
police.uk
// au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
act.au
nsw.au
nt.au
qld.au
sa.au
tas.au
vic.au
wa.au
// nz
ac.nz
co.nz
geek.nz
gen.nz
govt.nz
health.nz
iwi.nz
kiwi.nz
maori.nz
mil.nz
net.nz
org.nz
school.nz
// jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// br
com.br
net.br
org.br
gov.br
edu.br
art.br
blog.br
eco.br
emp.br
ind.br
inf.br
jus.br
leg.br
mil.br
tv.br
wiki.br
// cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
mil.cn
ac.cn
bj.cn
sh.cn
gd.cn
zj.cn
// in
co.in
net.in
org.in
firm.in
gen.in
ind.in
nic.in
ac.in
edu.in
res.in
gov.in
mil.in
// za
ac.za
co.za
edu.za
gov.za
law.za
mil.za
net.za
nom.za
org.za
school.za
web.za
// mx
com.mx
net.mx
org.mx
edu.mx
gob.mx
// ar
com.ar
edu.ar
gob.ar
gov.ar
int.ar
mil.ar
net.ar
org.ar
tur.ar
// tr
com.tr
net.tr
org.tr
info.tr
biz.tr
av.tr
bel.tr
dr.tr
edu.tr
gen.tr
gov.tr
k12.tr
name.tr
pol.tr
tel.tr
tv.tr
web.tr
// sg
com.sg
net.sg
org.sg
gov.sg
edu.sg
per.sg
// hk
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// tw
edu.tw
gov.tw
mil.tw
com.tw
net.tw
org.tw
idv.tw
club.tw
// kr
co.kr
ne.kr
or.kr
re.kr
pe.kr
go.kr
mil.kr
ac.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
seoul.kr
busan.kr
// il
ac.il
co.il
gov.il
idf.il
k12.il
muni.il
net.il
org.il
// id
ac.id
biz.id
co.id
desa.id
go.id
mil.id
my.id
net.id
or.id
sch.id
web.id
// th
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// my
biz.my
com.my
edu.my
gov.my
mil.my
name.my
net.my
org.my
// ph
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
// vn
com.vn
net.vn
org.vn
edu.vn
gov.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
// ua
com.ua
edu.ua
gov.ua
in.ua
net.ua
org.ua
kiev.ua
lviv.ua
// ru (second-level conventions)
com.ru
net.ru
org.ru
msk.ru
spb.ru
// pl
com.pl
net.pl
org.pl
biz.pl
edu.pl
gov.pl
info.pl
mail.pl
mil.pl
waw.pl
warszawa.pl
wroc.pl
krakow.pl
// eg
com.eg
edu.eg
eun.eg
gov.eg
mil.eg
name.eg
net.eg
org.eg
sci.eg
// sa
com.sa
net.sa
org.sa
gov.sa
med.sa
pub.sa
edu.sa
sch.sa
// ke
ac.ke
co.ke
go.ke
info.ke
me.ke
mobi.ke
ne.ke
or.ke
sc.ke
// ng
com.ng
edu.ng
gov.ng
i.ng
mil.ng
mobi.ng
name.ng
net.ng
org.ng
sch.ng
// wildcard-only ccTLDs
*.bd
*.ck
!www.ck
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
// ---- PRIVATE section (curated): platform suffixes whose subdomains
// ---- are DIFFERENT owners — exactly what politeness must separate
github.io
gitlab.io
blogspot.com
appspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
cloudfront.net
s3.amazonaws.com
azurewebsites.net
pages.dev
workers.dev
repl.co
"""

#: longest rule length we resolve (labels). The curated snapshot's max
#: is 3 (city.kawasaki.jp / s3.amazonaws.com); the full PSL has a few
#: 4-label rules, which this covers too.
MAX_RULE_LABELS = 4

_KIND_NORMAL = "normal"
_KIND_WILDCARD = "wildcard"  # stored WITHOUT the '*.' (the base)
_KIND_EXCEPTION = "exception"  # stored WITHOUT the '!'


#: Bundled FULL publicsuffix.org snapshot (MPL-2.0 public data,
#: ~9.5k rules) — the engine's default rule source. The curated
#: PSL_SNAPSHOT above remains the fallback when the data file is
#: absent (e.g. a --py-files zip that shipped only .py sources).
FULL_PSL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "data", "public_suffix_list.dat",
)


def _resolve_psl_path() -> str | None:
    """THE single resolution of which rule file is in force, priority:
    ``$CMONCRAWL_PSL_FILE`` (deployment override) > the bundled full
    publicsuffix.org list > ``None`` (curated in-module snapshot).
    Every path-sensitive consumer (source text, parsed-rule cache,
    cache fingerprints) MUST call this — a second inline copy of the
    priority chain would silently drift if a layer is ever added."""
    return os.environ.get("CMONCRAWL_PSL_FILE") or (
        FULL_PSL_PATH if os.path.exists(FULL_PSL_PATH) else None
    )


def default_psl_source() -> tuple[str | None, str]:
    """(path, text) of the default rule source (see
    :func:`_resolve_psl_path` for the priority order). Every
    default-rules consumer — the broadcast ladder, the Python twin,
    the DuckDB oracles — resolves through here, so they can never
    disagree about which rule set is in force."""
    path = _resolve_psl_path()
    if path:
        with open(path, encoding="utf-8") as f:
            return os.path.abspath(path), f.read()
    return None, PSL_SNAPSHOT


def psl_source_fingerprint() -> str:
    """Stable identity of the rule source in force — ``path|mtime_ns``
    for a file source, a constant for the in-module snapshot. Any
    on-disk cache derived from PSL-dependent computation (e.g.
    domain-keyed politeness tables) must fold this into its key, or a
    rule-set swap silently serves entries computed under the old
    rules."""
    path = _resolve_psl_path()
    if path is None:
        return "snapshot"
    return f"{os.path.abspath(path)}|{os.stat(path).st_mtime_ns}"


_DEFAULT_RULES: tuple[str | None, list] | None = None


def default_psl_rules() -> list[tuple[str, str]]:
    """Parsed default rules, cached per process.

    Keyed on :func:`psl_source_fingerprint` (path|mtime), NOT on the
    path alone: an in-place rewrite of the rule file (same path, new
    mtime) must invalidate this cache too, or the oracle's CTE —
    which re-reads the file — and the engine's broadcast ladder —
    which reads this cache — would judge against different rule sets
    (ADVICE r5)."""
    global _DEFAULT_RULES
    fp = psl_source_fingerprint()
    if _DEFAULT_RULES is None or _DEFAULT_RULES[0] != fp:
        _, text = default_psl_source()
        _DEFAULT_RULES = (fp, parse_psl(text))
    return _DEFAULT_RULES[1]


def _local_rule_frame(spark: SparkSession, rows: list) -> DataFrame:
    """(rule, fl) rows as a JVM LocalRelation via pandas/Arrow (see
    the call-site comment in :func:`with_registered_domain`)."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["rule", "fl"])
    return spark.createDataFrame(pdf, schema="rule string, fl int")


def parse_psl(text: str = PSL_SNAPSHOT) -> list[tuple[str, str]]:
    """(rule, kind) tuples from publicsuffix.org-format text."""
    rules: list[tuple[str, str]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            rules.append((line[1:], _KIND_EXCEPTION))
        elif line.startswith("*."):
            rules.append((line[2:], _KIND_WILDCARD))
        else:
            rules.append((line, _KIND_NORMAL))
    return rules


def rule_max_labels(rules) -> int:
    """Deepest rule in a parsed rule set, in labels (wildcard bases
    count their stored labels; the '+1' a wildcard adds to the public
    suffix does not widen the JOIN depth — only the base must match)."""
    items = rules.keys() if isinstance(rules, dict) else [r for r, _ in rules]
    return max((r.count(".") + 1 for r in items), default=1)


def psl_table(
    spark: SparkSession,
    text: str | None = None,
    path: str | None = None,
) -> DataFrame:
    """The broadcastable rule table: (rule string, kind string).

    With no arguments this loads the DEFAULT source — the bundled
    full publicsuffix.org snapshot (~9.5k rules), or
    ``$CMONCRAWL_PSL_FILE`` when set (:func:`default_psl_source`).
    Any publicsuffix.org-format ``text`` or file ``path`` also loads;
    arbitrarily deep rules are handled because
    :func:`with_registered_domain` sizes its join ladder from the
    rule table itself.
    """
    if path is not None:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    elif text is None:
        _, text = default_psl_source()
    import pandas as pd

    pdf = pd.DataFrame(parse_psl(text), columns=["rule", "kind"])
    # pandas/Arrow -> JVM LocalRelation: no pickled-RDD scan, no
    # Python-worker stage when this table feeds a broadcast build
    return spark.createDataFrame(pdf, schema="rule string, kind string")


def _kind_map(rules) -> dict[str, set]:
    """rule -> SET of kinds. The same base string can carry several
    kinds (a full PSL can list both ``foo.bar`` and ``*.foo.bar``) —
    a plain dict silently drops all but one, which both twins used to
    do; every consumer must consider all kinds of a matched rule."""
    items = rules.items() if isinstance(rules, dict) else rules
    out: dict[str, set] = {}
    for r, k in items:
        s = out.setdefault(r, set())
        if isinstance(k, str):
            s.add(k)
        else:
            s.update(k)
    return out


def _suffix_len_py(labels: list[str], rules, max_labels: int | None = None) -> int:
    """Public-suffix length in labels per the PSL algorithm.

    ``rules``: dict rule->kind, dict rule->set-of-kinds, or the
    (rule, kind) list from :func:`parse_psl`.
    """
    kinds = _kind_map(rules)
    ml = max_labels if max_labels is not None else rule_max_labels(kinds)
    n = len(labels)
    # exceptions win outright: ps = rule minus its leftmost label
    for k in range(min(n, ml), 0, -1):
        cand = ".".join(labels[n - k :])
        if _KIND_EXCEPTION in kinds.get(cand, ()):
            return k - 1
    best = 1  # implicit '*' rule: any TLD is a public suffix
    for k in range(1, min(n, ml) + 1):
        cand = ".".join(labels[n - k :])
        kk = kinds.get(cand, ())
        if _KIND_NORMAL in kk:
            best = max(best, k)
        if _KIND_WILDCARD in kk and n >= k + 1:
            best = max(best, k + 1)
    return best


def registered_domain_py(host: str | None, rules=None) -> str | None:
    """Plain-Python twin of :func:`with_registered_domain` (tests /
    golden vectors). None when the host IS a public suffix (or empty).
    ``rules`` as in :func:`_suffix_len_py`; default = bundled snapshot.
    """
    if not host:
        return None
    if rules is None:
        rules = default_psl_rules()
    labels = [l for l in host.lower().rstrip(".").split(".") if l]
    ps = _suffix_len_py(labels, rules)
    if len(labels) <= ps:
        return None
    return ".".join(labels[len(labels) - ps - 1 :])


def with_registered_domain(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "registered_domain",
    psl: DataFrame | None = None,
    max_rule_labels: int | None = None,
) -> DataFrame:
    """Attach the PSL registered domain (eTLD+1) of ``host_col``.

    Plan: K left BROADCAST hash joins (one per candidate suffix
    length, K = deepest rule in the rule set) against the tiny rule
    table + pure expressions — no shuffle, no UDF; survives any data
    scale because the only state is the broadcast PSL. Output is NULL
    when the host is itself a public suffix. Hosts are lowercased and
    trailing dots stripped before matching (PSL canonical form).

    K sizes itself from the rules: the bundled snapshot plans K=3;
    a full public-suffix-list file with 5-label rules plans K=5. For
    a custom ``psl`` DataFrame, K comes from one tiny driver-side agg
    over the rule table (O(rules), runs once at plan construction) —
    pass ``max_rule_labels`` to skip it.
    """
    if psl is None:
        rules_list = default_psl_rules()
    else:
        # the rule table is tiny broadcast state (~10k rows for the
        # full list); pulling it to the driver once at plan
        # construction keeps the flag prep shuffle-free
        rules_list = [(r["rule"], r["kind"]) for r in psl.collect()]
    kinds = _kind_map(rules_list)
    ml = (
        max_rule_labels
        if max_rule_labels is not None
        else rule_max_labels(kinds)
    )
    # Normalize WITHOUT an array: lowercase, strip leading/trailing
    # dots, collapse runs of dots — exactly equivalent to the Python
    # twin's "filter empty labels" (registered_domain_py), but the
    # row stays ONE string. The round-4 plan built a label ARRAY per
    # row (split + lambda filter) and then K sliced-concat strings —
    # measured at ~0.5 µs/URL extra per scheduling round at 19.2M
    # URLs (domain_ab_bench). substring_index over the cleaned string
    # is a single backward scan per rung, no allocs.
    cleaned = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(host_col)), r"^\.+|\.+$", ""),
        r"\.{2,}",
        ".",
    )
    tmp = df.withColumn("_psl_host", cleaned).withColumn(
        "_psl_n",
        F.when(F.col("_psl_host") == "", F.lit(0)).otherwise(
            F.length("_psl_host")
            - F.length(F.translate(F.col("_psl_host"), ".", ""))
            + F.lit(1)
        ),
    )
    n = F.col("_psl_n")
    # ONE row per rule string with kind flags: the same base can carry
    # several kinds (e.g. 'foo.bar' + '*.foo.bar' in a full list) and
    # a per-kind row table would DUPLICATE every matching host row in
    # the join. Flags fold driver-side (tiny), so the broadcast side
    # stays exchange-free. The three kind flags pack into ONE bitmask
    # column (1=normal, 2=wildcard, 4=exception).
    #
    # Rung k probes a DEPTH-FILTERED broadcast: a k-label suffix can
    # only ever equal a rule with exactly k labels (dot counts must
    # agree), so each rung's build side holds only that depth's rules.
    # Round 4 shared ONE BroadcastExchange across all rungs (K-1
    # ReusedExchange); with the full ~9.5k-rule list that meant every
    # rung hashing into one ~MB map — measured +2.6 s per 19.2M-URL
    # scheduling round vs the 192-rule curated list (domain_profile,
    # round 5). K per-depth builds are each trivial (largest depth
    # ~7k rows, depths 3-5 a few hundred) and the hot rungs probe
    # L1/L2-resident maps; identical output by the dot-count argument.
    by_depth: dict[int, list[tuple[str, int]]] = {}
    for r, s in kinds.items():
        fl = (
            int(_KIND_NORMAL in s)
            + 2 * int(_KIND_WILDCARD in s)
            + 4 * int(_KIND_EXCEPTION in s)
        )
        by_depth.setdefault(r.count(".") + 1, []).append((r, fl))
    for k in range(1, ml + 1):
        if k not in by_depth:
            # no rule at this depth: the rung's flag column is NULL
            # everywhere — same fall-through the CASE already takes
            tmp = tmp.withColumn(
                f"_psl_fl{k}", F.lit(None).cast("int")
            )
            continue
        suffix_k = F.when(
            n >= k, F.substring_index(F.col("_psl_host"), ".", -k)
        )
        # Build the rule relation from PANDAS (Arrow) — it lands as a
        # JVM LocalRelation, so each rung's broadcast materializes
        # driver-side with NO job and NO Python worker. A plain-list
        # createDataFrame becomes a pickled-RDD scan whose broadcast
        # build spawns a Python-runner stage PER RUNG PER EXECUTION —
        # measured ~1 s each, ~5 s/execution of a K=5 full-list
        # ladder before any data was touched.
        fk = _local_rule_frame(
            df.sparkSession, by_depth[k]
        ).alias(f"_pslr{k}")
        # Projection with QUALIFIED refs above the join — never a
        # rename: withColumnsRenamed would hijack any input column the
        # user happens to call rule/fl. (Each rung deliberately builds
        # its OWN depth-filtered relation — K small cache-resident
        # broadcasts beat one shared full-list broadcast by ~2.6 s per
        # 19.2M-URL round; plan-pinned in
        # tests/test_psl.py::test_with_registered_domain_depth_filtered_broadcasts.)
        lk = tmp.withColumn(f"_psl_sfx{k}", suffix_k).alias(f"_psll{k}")
        tmp = lk.join(
            F.broadcast(fk),
            F.col(f"_psll{k}._psl_sfx{k}") == F.col(f"_pslr{k}.rule"),
            "left",
        ).select(
            lk["*"],
            F.col(f"_pslr{k}.fl").alias(f"_psl_fl{k}"),
        )

    # public-suffix length: exceptions (longest first) beat all; then
    # the longest normal/wildcard match; then the implicit '*' rule.
    cases: list[tuple[Column, int]] = []

    def _bit(k: int, mask: int) -> Column:
        # NULL fl (no rule matched) stays NULL -> CASE falls through,
        # same as the per-column flags did
        return F.col(f"_psl_fl{k}").bitwiseAND(F.lit(mask)) != 0

    for k in range(ml, 1, -1):  # exception at k -> ps k-1
        cases.append((_bit(k, 4), k - 1))
    for k in range(ml, 0, -1):  # longest effective match
        # a wildcard base of length k acts as a rule of length k+1
        cases.append((_bit(k, 2) & (n >= k + 1), k + 1))
        cases.append((_bit(k, 1), k))
    expr = F.lit(1)  # implicit '*'
    for cond, val in reversed(cases):
        expr = F.when(cond, F.lit(val)).otherwise(expr)
    tmp = tmp.withColumn("_psl_ps", expr)
    reg = F.when(
        n > F.col("_psl_ps"),
        # count is a COLUMN (ps+1), which the substring_index builtin
        # only takes via SQL — same expression, codegen either way
        F.expr("substring_index(_psl_host, '.', -(_psl_ps + 1))"),
    )
    drop = ["_psl_host", "_psl_n", "_psl_ps"] + [
        c for k in range(1, ml + 1)
        for c in (f"_psl_sfx{k}", f"_psl_fl{k}")
    ]
    return tmp.withColumn(out_col, reg).drop(*drop)
