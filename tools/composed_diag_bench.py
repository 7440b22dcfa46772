"""§4-r12: composed dedup-diagnostics cost at scale (VERDICT r11 #6).

The production claim for the pair-derived diagnostics is "pairs are
computed ONCE; each diagnostic consumes the materialized pairs/cluster
relation and costs only its own output-grain aggregates". The r11
BASELINE row measured that sharing at sf0.1 (composed trio 0.61× the
standalone pair); this tool takes the claim to the second decade:
at sf1 and sf10 (tools/gen_scale.py rehearsal corpora) it measures

  1. the shared `minhash_lsh_pairs` pass (eagerly checkpointed),
  2. the MARGINAL cost of each consumer on top of it
     (threshold_yield_curve, cluster_size_profile via the shared
     pairs; near_dup_clusters + savings_by_source +
     cluster_lang_purity via the shared clusters),

and prints per-scale rows plus the 10× growth ratio of the marginal
(diagnostics-only) cost — the number the production guidance rides
on. The pairs pass itself tracks the rehearsal corpus's planted
quadratic pair mass (§4-r11f, honestly attributed); the claim under
test here is that the CONSUMERS do not add a second copy of that
cost.

    python tools/gen_scale.py /tmp/scale_rehearsal/sf1 10
    python tools/gen_scale.py /tmp/scale_rehearsal/sf10 100
    python tools/composed_diag_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from edu_online_spark.session import get_spark  # noqa: E402


def main() -> None:
    from edu_online_spark.operators.dedup import (
        cluster_lang_purity,
        cluster_size_profile,
        minhash_lsh_pairs,
        near_dup_clusters,
        pair_degree_spectrum,
        pair_transitivity,
        savings_by_source,
        threshold_yield_curve,
    )

    spark = get_spark()
    dirs = sys.argv[1:] or [
        "/tmp/scale_rehearsal/sf1",
        "/tmp/scale_rehearsal/sf10",
    ]
    out: dict[str, dict[str, float]] = {}
    for sf_dir in dirs:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        row: dict[str, float] = {"n_docs": docs.count()}

        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(docs).localCheckpoint(eager=True)
        row["pairs_pass_sec"] = round(time.perf_counter() - t0, 2)
        row["n_pairs"] = pairs.count()

        t0 = time.perf_counter()
        threshold_yield_curve(docs, pairs=pairs).write.format(
            "noop"
        ).mode("overwrite").save()
        row["yield_curve_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        cluster_size_profile(docs, pairs=pairs).write.format(
            "noop"
        ).mode("overwrite").save()
        row["size_profile_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        clusters = near_dup_clusters(pairs).localCheckpoint(eager=True)
        row["clusters_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        savings_by_source(docs, clusters=clusters).write.format(
            "noop"
        ).mode("overwrite").save()
        row["savings_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        cluster_lang_purity(docs, clusters=clusters).write.format(
            "noop"
        ).mode("overwrite").save()
        row["lang_purity_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        pair_degree_spectrum(docs, pairs=pairs).write.format(
            "noop"
        ).mode("overwrite").save()
        row["degree_spectrum_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        pair_transitivity(docs, pairs=pairs).write.format(
            "noop"
        ).mode("overwrite").save()
        row["transitivity_sec"] = round(time.perf_counter() - t0, 2)

        row["marginal_sec"] = round(
            row["yield_curve_sec"]
            + row["size_profile_sec"]
            + row["clusters_sec"]
            + row["savings_sec"]
            + row["lang_purity_sec"]
            + row["degree_spectrum_sec"]
            + row["transitivity_sec"],
            2,
        )
        row["composed_total_sec"] = round(
            row["pairs_pass_sec"] + row["marginal_sec"], 2
        )
        out[sf_dir] = row
        print(json.dumps({sf_dir: row}))
    if len(dirs) == 2:
        a, b = (out[d] for d in dirs)
        print(
            json.dumps(
                {
                    "pairs_growth_per_10x": round(
                        b["pairs_pass_sec"] / a["pairs_pass_sec"], 2
                    ),
                    "marginal_growth_per_10x": round(
                        b["marginal_sec"] / a["marginal_sec"], 2
                    ),
                    "pair_mass_growth": round(
                        b["n_pairs"] / max(a["n_pairs"], 1), 2
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
