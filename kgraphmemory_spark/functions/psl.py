"""Compact public-suffix snapshot for ``registrable_domain``.

The Public Suffix List (publicsuffix.org, Mozilla-maintained, public
data) is what separates "the label a user can register" from the
registry-controlled suffix: ``shop.co.uk`` is a registrable domain,
``co.uk`` is not.  Round 4 shipped the last-two-labels approximation
with a documented seam (functions/urls.py); this module fills the seam
with a SNAPSHOT of the ICANN section's widely-used **two-level**
suffixes — the rules that actually change grouping for mainstream web
corpora (ccTLD second-level registries: ``co.uk``, ``com.au``,
``co.jp``, …).

Scope, intentionally conservative:

- ICANN section only; the PRIVATE section (``github.io``,
  ``blogspot.com``, …) is hosting-provider policy, not registry
  delegation — a corpus pipeline usually wants those grouped by the
  provider anyway.
- Two-level rules only.  Three-level rules (``pref.aichi.jp`` geo
  names, ``k12.ma.us`` US locality) and wildcard/exception rules
  (``*.ck`` / ``!www.ck``) are a vanishing share of web hosts and need
  the full list; ``registrable_domain(..., psl=...)`` accepts a larger
  snapshot when one is provisioned.
- A few hundred entries ⇒ Catalyst compiles the membership test to an
  ``InSet`` inside whole-stage codegen — cheaper than a broadcast join
  and exactly as distributable.

The snapshot is data, not behavior: updating it is replacing this set
with a newer export of the same public list.
"""

from __future__ import annotations


def _expand(tld: str, labels: str) -> list[str]:
    return [f"{sld}.{tld}" for sld in labels.split()]


# ICANN-section two-level public suffixes, grouped by ccTLD.  Sources:
# the Public Suffix List (publicsuffix.org); each line is the ccTLD
# registry's second-level namespace.
PSL2_SNAPSHOT: frozenset[str] = frozenset(
    _expand("uk", "ac co gov judiciary ltd me net nhs org plc police sch")
    + _expand("au", "asn com edu gov id net org")
    + _expand("nz", "ac co cri geek gen govt health iwi kiwi maori mil "
                    "net org parliament school")
    + _expand("za", "ac agric alt co edu gov grondar law mil net ngo nic "
                    "nis nom org school tm web")
    + _expand("jp", "ac ad co ed go gr lg ne or")
    + _expand("kr", "ac co es go hs kg mil ms ne or pe re sc")
    + _expand("cn", "ac ah bj com cq edu fj gd gov gs gx gz ha hb he hi "
                    "hk hl hn jl js jx ln mil mo net nm nx org qh sc sd "
                    "sh sn sx tj tw xj xz yn zj")
    + _expand("tw", "club com ebiz edu game gov idv mil net org")
    + _expand("hk", "com edu gov idv net org")
    + _expand("sg", "com edu gov net org per")
    + _expand("my", "com edu gov mil name net org")
    + _expand("id", "ac biz co desa go mil my net or ponpes sch web")
    + _expand("th", "ac co go in mi net or")
    + _expand("vn", "ac biz com edu gov health info int name net org pro")
    + _expand("ph", "com edu gov i mil net ngo org")
    + _expand("in", "ac co edu firm gen gov ind mil net nic org res")
    + _expand("pk", "ac biz com edu fam gkp gob gog gok gop gos gov net "
                    "org web")
    + _expand("bd", "ac com edu gov mil net org")
    + _expand("lk", "ac assn com edu gov grp hotel int ltd net ngo org "
                    "sch soc web")
    + _expand("il", "ac co gov idf k12 muni net org")
    + _expand("sa", "com edu gov med net org pub sch")
    + _expand("ae", "ac co gov mil net org sch")
    + _expand("eg", "ac com edu eun gov mil name net org sci")
    + _expand("tr", "av bbs bel biz com dr edu gen gov info k12 kep "
                    "name net org pol tel tsk tv web")
    + _expand("ua", "com edu gov in net org")
    + _expand("br", "adm adv agr am app arq art ato b bhz bio blog bmd "
                    "cim cng cnt com coop dev ecn eco edu emp eng esp "
                    "etc eti far flog fm fnd fot fst g12 ggf gov imb "
                    "ind inf jor jus leg lel log mat med mil mp mus net "
                    "not ntr odo org ppg pro psc psi qsl radio rec seg "
                    "slg srv taxi tec teo tmp trd tur tv vet vlog wiki "
                    "zlg")
    + _expand("mx", "com edu gob net org")
    + _expand("ar", "bet com coop edu gob gov int mil musica net org "
                    "senasa tur")
    + _expand("co", "arts com edu firm gov info int mil net nom org rec "
                    "web")
    + _expand("pe", "com edu gob mil net nom org sld")
    + _expand("ve", "arts bib co com e12 edu firm gob gov info int mil "
                    "net nom org rar rec store tec web")
    + _expand("uy", "com edu gub mil net org")
    + _expand("py", "com coop edu gov mil net org")
    + _expand("bo", "com edu gob int mil net org tv web")
    + _expand("ec", "com edu fin gob gov info k12 med mil net org pro")
    + _expand("gt", "com edu gob ind mil net org")
    + _expand("ke", "ac co go info me mobi ne or sc")
    + _expand("tz", "ac co go hotel info me mil mobi ne or sc tv")
    + _expand("ug", "ac co com go ne or org sc")
    + _expand("ng", "com edu gov i mil mobi name net org sch")
    + _expand("gh", "com edu gov mil org")
    + _expand("zw", "ac co gov mil org")
    + _expand("ma", "ac co gov net org press")
    + _expand("tn", "com ens fin gov ind info intl mincom nat net org "
                    "perso tourism")
    + _expand("ru", "ac edu gov int mil test")
    + _expand("pl", "art biz com edu gov info net ngo org")
    + _expand("hu", "2000 agrar bolt casino city co erotica erotika film "
                    "forum games hotel info ingatlan jogasz konyvelo "
                    "lakas media news org priv reklam sex shop sport "
                    "suli szex tm tozsde utazas video")
    + _expand("at", "ac co gv or")
    + _expand("es", "com edu gob nom org")
    + _expand("pt", "com edu gov int net nome org publ")
    + _expand("gr", "com edu gov net org")
    + _expand("cy", "ac biz com ekloges gov ltd mil net org press pro tm")
    + _expand("rs", "ac co edu gov in org")
)


def render_sql_in_list(suffixes: frozenset[str] | None = None) -> str:
    """The snapshot as a SQL ``IN (...)`` body (sorted, quoted) — lets a
    DuckDB oracle twin apply the same public data with independently
    written logic."""
    return ", ".join(f"'{s}'" for s in sorted(suffixes or PSL2_SNAPSHOT))
