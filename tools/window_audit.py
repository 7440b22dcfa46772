"""Mechanical partition-less-window audit over the FULL registry.

customer_rfm shipped three certified-green ntile(4) windows with no
partition key — correct at every tested SF, a one-task bottleneck at
10⁸ rows — and sat that way for five rounds until a manual plan audit
caught it (VERDICT r13 #4). The class of defect is mechanically
detectable: a WindowExec whose spec has no partition column moves its
ENTIRE input through one task, so the only acceptable ones are those
whose input relation is bounded by construction (a value histogram, a
band spectrum, a calendar of days — never a corpus/row-grain
relation).

This tool explains every registry query at sf0.01 and reports each
partition-less window spec it finds. tests/test_plans.py pins the
result against a JUSTIFIED allowlist: a new query that sneaks in a
global sort fails CI with the spec in the message, and the allowlist
entry it would need is a forced code-review conversation about why
its window input is bounded.

    python tools/window_audit.py              # audit all, print findings
    python tools/window_audit.py q1 q2 ...    # audit a subset
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def _split_top_level(s: str) -> list[str]:
    """Split a windowspecdefinition argument list on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def partitionless_specs(plan: str) -> list[str]:
    """Return every windowspecdefinition(...) in `plan` that declares
    NO partition column. In Spark's spec string the partition columns
    come first with no sort direction; sort columns carry ASC/DESC;
    the frame is the trailing specifiedwindowframe(...). A spec whose
    first argument already carries a direction marker (or is the
    frame itself) is partition-less."""
    found = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth = 1
        i = start
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        args = _split_top_level(plan[start : i - 1])
        if not args:
            continue
        first = args[0]
        if first.startswith("specifiedwindowframe") or re.search(
            r"\b(ASC|DESC)\b", first
        ):
            found.append("windowspecdefinition(" + ", ".join(args) + ")")
    return found


def _queued_r17_plus() -> dict:
    """Runners for the R17-R19 queued ops (scale_rehearsal._library
    carries only the R16-and-earlier queue), with the registry
    (spark, sf_dir) signature."""
    from edu_online_spark.operators import pii
    from edu_online_spark.operators.analytics import (
        ab_conversion_ztest,
        ab_fdr_bh,
        ab_quantile_uplift,
        ab_srm_check,
        ab_value_effect_size,
        ab_value_ks_test,
        ab_value_mannwhitney,
        activation_survival,
        cusum_level_shift,
        price_qty_ols,
    )
    from edu_online_spark.operators.dedup import pair_transitivity
    from edu_online_spark.operators.similarity import label_mrr, label_ndcg
    from edu_online_spark.operators.textops import (
        lang_kappa,
        quality_length_spearman,
        source_token_tvd,
        token_heavy_hitters,
    )
    from edu_online_spark.sources import load_table

    def one(fn, table):
        return lambda s, d: fn(load_table(s, d, table))

    return {
        "events_cusum_level_shift": one(cusum_level_shift, "events"),
        "events_ab_conversion_ztest": one(ab_conversion_ztest, "events"),
        "corpus_token_heavy_hitters": one(token_heavy_hitters, "documents"),
        "text_lang_kappa": one(lang_kappa, "documents"),
        "docs_quality_spearman": one(quality_length_spearman, "documents"),
        "dedup_pair_transitivity": one(pair_transitivity, "documents"),
        "ann_label_ndcg": one(label_ndcg, "embeddings"),
        "events_l_diversity": pii._q_events_ldiv,
        "lineitem_price_qty_ols": one(price_qty_ols, "lineitem"),
        "users_activation_survival": one(activation_survival, "events"),
        "events_ab_mannwhitney": one(ab_value_mannwhitney, "events"),
        "events_ab_srm_check": one(ab_srm_check, "events"),
        "source_token_tvd": one(source_token_tvd, "documents"),
        "events_ab_ks_test": one(ab_value_ks_test, "events"),
        "events_ab_effect_size": one(ab_value_effect_size, "events"),
        "events_ab_quantile_uplift": one(ab_quantile_uplift, "events"),
        # round-16 session additions to the R19 queue
        "events_t_closeness": pii._q_events_tclose,
        "ann_label_mrr": one(label_mrr, "embeddings"),
        "events_ab_fdr_bh": one(ab_fdr_bh, "events"),
    }


def audit(
    names: list[str] | None = None,
) -> tuple[dict[str, list[str]], dict[str, str]]:
    """Audit registered queries AND the queued-promotion library (the
    spearman global-sort finding lived in a QUEUED op — auditing only
    the registry would miss the next one).

    Returns (findings, unplannable): a query whose runner raises
    (guard refusal, missing data, import error) lands in the second
    dict with its diagnostic — NEVER in the findings dict as an empty
    spec list, which would print as '0 partition-less window spec(s)'
    and mask the very failure the audit exists to surface (ADVICE
    r14 #1)."""
    from edu_online_spark import registry
    from edu_online_spark.session import get_spark
    from tools.scale_rehearsal import _library

    spark = get_spark()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = dict(registry.queries())
    for name, fn in _library().items():
        qs.setdefault(f"queued:{name}", fn)
    for name, fn in _queued_r17_plus().items():
        qs.setdefault(f"queued:{name}", fn)
    sf_dir = "/root/testdata/sf0.01"
    return _audit_queries(qs, spark, sf_dir, names or list(qs))


def _audit_queries(
    qs: dict, spark, sf_dir: str, targets: list[str]
) -> tuple[dict[str, list[str]], dict[str, str]]:
    from edu_online_spark.plans import explain_str

    out: dict[str, list[str]] = {}
    unplannable: dict[str, str] = {}
    for name in targets:
        try:
            plan = explain_str(qs[name](spark, sf_dir), "simple")
        except Exception as exc:  # guarded baselines refuse big inputs etc.
            unplannable[name] = f"{type(exc).__name__}: {exc}"
            continue
        specs = partitionless_specs(plan)
        if specs:
            out[name] = specs
    return out, unplannable


def main() -> None:
    findings, unplannable = audit(sys.argv[1:] or None)
    for name, specs in sorted(findings.items()):
        print(f"{name}: {len(specs)} partition-less window spec(s)")
        for s in specs:
            print(f"    {s[:160]}")
    for name, diag in sorted(unplannable.items()):
        print(f"UNPLANNABLE {name}: {diag[:200]}", file=sys.stderr)
    print(f"# {len(findings)} queries carry partition-less windows")
    if unplannable:
        print(
            f"# {len(unplannable)} queries could NOT be planned — "
            "audit coverage is incomplete for them",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
