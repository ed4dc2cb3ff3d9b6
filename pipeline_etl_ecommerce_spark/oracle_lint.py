"""Lint for the oracle-SQL binary-tie rounding hazard (r6 verdict item 3).

The hazard class, caught twice by advisors (try_divide_return_rate r5,
event_type_transitions r6): ``ROUND(x, d)`` where ``x`` is a quotient of
exact integers. Such a quotient can land EXACTLY on a decimal half — the
value ``odd / 2^(d+1)`` is a dyadic rational, representable bit-exactly in
a double (e.g. ``3/8 = 0.375`` at d=2, ``5/128 = 0.0390625`` at d=6) — and
on an exact tie Spark's ROUND (HALF_UP on the double's exact decimal
expansion) and DuckDB's (round-half-even) DISAGREE. Non-dyadic values are
never exact ties (the nearest double is strictly above or below the half),
so quotients with an irrational factor (sqrt/ln/exp/power upstream) or
exact-DECIMAL arithmetic are structurally safe.

The lint extracts every ``ROUND(...)`` site from every registered oracle,
flags sites that contain a division and no structural-safety token, and
requires each flagged site to carry an ALLOWLIST entry with a written
adjudication. It runs at the top of ``scripts/selfcheck.py`` (so the
driver-shaped gate refuses to even start on an unadjudicated site) and in
pytest. Stale allowlist entries (text no longer present in any oracle)
fail too, so the list can only shrink when the catalog does.
"""

from __future__ import annotations

import re

__all__ = [
    "ROUND_TIE_ALLOWLIST",
    "round_sites",
    "round_tie_findings",
    "stale_allowlist_entries",
]

# Tokens that make an exact decimal tie structurally impossible inside the
# rounded expression: an irrational factor (sqrt/ln/exp/power of data-driven
# input) keeps the value off every dyadic rational; DECIMAL arithmetic is
# exact base-10 so .5 ties round identically (HALF_UP) on both engines.
_STRUCTURALLY_SAFE = re.compile(
    r"sqrt\s*\(|\bln\s*\(|\bexp\s*\(|\bpow(?:er)?\s*\(|DECIMAL", re.I
)

# Adjudicated integer-ratio (or ratio-shaped) ROUND sites, keyed by the
# whitespace-normalized text INSIDE the ROUND(...) parens. Two reason
# classes appear below:
#  - "structural": the tie is impossible by arithmetic argument;
#  - "monitored": a tie is possible in principle; the adjudication is that
#    the 3-SF value-hash gate (selfcheck + driver CORRECTNESS) is itself
#    the tie detector — a tie arriving in new data fails the hash LOUDLY
#    (engine-vs-engine mismatch), never silently. New sites must pick one:
#    prefer emitting the raw quotient (the event_type_transitions fix) or
#    DECIMAL arithmetic; allowlist only with a written adjudication.
ROUND_TIE_ALLOWLIST: dict[str, str] = {
    # --- money-allocation family (flagship W1/W2, freight W6, region A3):
    # cent-exact DECIMAL sums cast to double, ratio times a money value,
    # re-rounded at 2dp/0dp. Integer-ratio class -> monitored: hash-green
    # at sf0.001/0.01/0.1 since r1; the published mart shape (rounded
    # allocation, reference parity `tarefa_consolidar_dados.php` rateio)
    # is the reason it is not converted to a raw quotient.
    "CASE WHEN br.brand_gross > 0 THEN br.brand_value * (b.gross_revenue / br.brand_gross) WHEN b.p_partkey = br.brand_main_part THEN br.brand_value ELSE 0 END, 2": "monitored: money allocation ratio, mart contract requires 2dp; hash gate detects any tie",
    "CASE WHEN br.brand_gross > 0 THEN LEAST(br.brand_lines * (b.gross_revenue / br.brand_gross), CAST(b.sum_qty AS DOUBLE)) WHEN b.p_partkey = br.brand_main_part THEN br.brand_lines ELSE 0 END, 0": "monitored: allocation line-count cap, 0dp mart contract; hash gate detects any tie",
    "CASE WHEN SUM(l.l_extendedprice) OVER (PARTITION BY l.l_orderkey) > 0 THEN o.o_totalprice * l.l_extendedprice / SUM(l.l_extendedprice) OVER (PARTITION BY l.l_orderkey) ELSE 0 END, 2": "monitored: freight rateio 2dp mart contract; hash gate detects any tie",
    "CASE WHEN rg.region_balance > 0 THEN rg.region_customers * (COALESCE(n.nation_balance, 0.0) / rg.region_balance) WHEN n.n_nationkey = rg.main_nation THEN rg.region_customers ELSE 0 END, 0": "monitored: rollup allocation 0dp mart contract; hash gate detects any tie",
    # --- text-statistics ratios (counts / counts at 4-6dp): monitored.
    "CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE) / length(text), 4": "monitored: vowel ratio; tie needs n_chars ~ odd/2^5 cancellation; hash gate detects",
    "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / len(list_distinct(list_concat(a.grams, b.grams))), 6": "monitored: jaccard count ratio; hash gate detects any tie",
    "CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE) / len(list_distinct(list_concat(ga.g, gb.g))), 6": "monitored: jaccard count ratio; hash gate detects any tie",
    "alpha / n, 6": "monitored: char-class count ratio; hash gate detects any tie",
    "digits / n, 6": "monitored: char-class count ratio; hash gate detects any tie",
    "spaces / n, 6": "monitored: char-class count ratio; hash gate detects any tie",
    "(n - spaces) / greatest(CAST(toks AS DOUBLE), 1.0), 6": "monitored: mean-word-length count ratio; hash gate detects any tie",
    "stop / greatest(CAST(toks AS DOUBLE), 1.0), 6": "monitored: stopword count ratio; hash gate detects any tie",
    "CAST(u.n_distinct_tokens AS DOUBLE) / u.n_tokens, 6": "monitored: repetition count ratio; hash gate detects any tie",
    "CAST(u.top_c AS DOUBLE) / u.n_tokens, 6": "monitored: repetition count ratio; hash gate detects any tie",
    "CAST(b.top_b AS DOUBLE) / b.n_bigrams, 6": "monitored: repetition count ratio; hash gate detects any tie",
    "CAST(h.n_contaminated_grams AS DOUBLE) / p.n_grams, 6": "monitored: decontamination count ratio; hash gate detects any tie",
    "CAST(sx AS DOUBLE) / n, 6": "monitored: mean of integer cents over count; hash gate detects any tie",
    "CAST(SUM(v) OVER w7 AS DOUBLE) / COUNT(*) OVER w7, 6": "monitored: rolling mean of integer values; hash gate detects any tie",
    "CAST(SUM(CASE WHEN gram_df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6": "monitored: duplicate-gram fraction; hash gate detects any tie",
    "LEAST(1.0, 120 * (CAST(_p AS DOUBLE) / CAST(_tp AS DOUBLE)) / _n), 6": "monitored: temperature-sampling keep rate; hash gate detects any tie",
    "(CAST(n_pair AS DOUBLE) * t.t * t.t) / (btot.b * a.c * z.c), 6": "monitored: collocation lift count ratio; hash gate detects any tie",
    "(CAST(target_count + 1 AS DOUBLE) * (CAST(nr AS DOUBLE) + 64.0)) / (CAST(raw_count + 1 AS DOUBLE) * (CAST(nt AS DOUBLE) + 64.0)), 8": "monitored: DSIR smoothed count ratio at 8dp; hash gate detects any tie",
    "1.0 - CAST(SUM(n * n) AS DOUBLE) / CAST(SUM(n) * SUM(n) AS DOUBLE), 6": "monitored: Simpson diversity count ratio; hash gate detects any tie",
    "CAST(SUM(w) AS DOUBLE) / COUNT(*), 6": "monitored: winsorized mean of integer cents; hash gate detects any tie",
    "CAST(SUM(length(ap.s) - length(replace(ap.s, '|', ''))) AS DOUBLE) / COUNT(*), 6": "monitored: BPE fertility count ratio; hash gate detects any tie",
    "CAST(p.pair_count AS DOUBLE) * n.n_orders / (fa.c * fb.c), 6": "monitored: co-purchase lift count ratio; hash gate detects any tie",
    # --- structurally safe despite no token in the site text itself:
    "list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]), 'sum') / (a.nv * b.nv), 6": "structural: denominator nv is sqrt(sum of squares) computed upstream - irrational for the float corpus, no dyadic tie",
    "list_aggregate(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]), 'sum') / (a.nrm * b.nrm), 6": "structural: denominator nrm is sqrt(sum of squares) computed upstream - irrational, no dyadic tie",
    "SUM(logp) / count(*), 6": "structural: numerator sums ln() values computed upstream - transcendental, no dyadic tie",
    "CAST(count(a.cand_id) AS DOUBLE) / 3.0, 6": "structural: n/3 with n in 0..3 - values 0, 1/3, 2/3, 1; thirds are non-dyadic, integers are exact",
    "CAST(count(a.cand_id) AS DOUBLE) / 4.0, 6": "structural: n/4 with n in 0..4 - exact dyadics with <= 2 decimals (0, .25, .5, .75, 1), ROUND at 6dp is the identity on all of them",
    "list_aggregate(list_transform(list_zip(p.qvec, l.cvec2), pr -> pr[1] * pr[2]), 'sum') / (p.qnorm * l.cnorm), 6": "structural: denominators qnorm/cnorm are sqrt(sum of squares) computed upstream (bitext indexed-kNN legs) - irrational for the float corpus, no dyadic tie",
    "2 * fk.cos_sim / (ax.ax + ay.ay), 6": "monitored: bitext margin ratio of 6dp-rounded cosines over their neighborhood averages; both engines compute the identical double algebra and the 3-SF hash gate detects any boundary tie",
}


def round_sites(sql: str) -> list[str]:
    """Every balanced ``ROUND(...)`` call in ``sql`` (full text incl. the
    ROUND keyword), found by paren matching — nested calls yield both the
    outer and inner sites."""
    sites: list[str] = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        i, depth = m.end(), 1
        while depth and i < len(sql):
            c = sql[i]
            if c == "'":
                # skip single-quoted SQL literals ('' = escaped quote) so a
                # quoted '(' / ')' can't unbalance the walk (advice r7)
                i += 1
                while i < len(sql):
                    if sql[i] == "'":
                        if i + 1 < len(sql) and sql[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        if depth == 0:
            sites.append(sql[m.start() : i])
    return sites


def _inner(site: str) -> str:
    return " ".join(site[site.index("(") + 1 : -1].split())


def round_tie_findings(oracle: dict[str, str]) -> list[tuple[str, str]]:
    """(query, normalized site) for every ROUND site that contains a
    division, has no structural-safety token, and is not allowlisted."""
    out = []
    for name, sql in oracle.items():
        for site in round_sites(sql):
            inner = _inner(site)
            if (
                "/" in inner
                and not _STRUCTURALLY_SAFE.search(inner)
                and inner not in ROUND_TIE_ALLOWLIST
            ):
                out.append((name, inner))
    return out


def stale_allowlist_entries(oracle: dict[str, str]) -> list[str]:
    """Allowlist keys no longer present in any oracle — dead adjudications
    that would silently grandfather a future re-introduction."""
    live: set[str] = set()
    for sql in oracle.values():
        for site in round_sites(sql):
            live.add(_inner(site))
    return [k for k in ROUND_TIE_ALLOWLIST if k not in live]
