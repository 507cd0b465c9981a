"""Distributed-statistics tour. Run: python examples/statistics_tour.py

The round-8 exact-statistics stack end-to-end on real data — every
number here is also pinned bit-exact by the oracle gate:

  1. uncertainty  — Poisson-bootstrap CI for the mean purchase value
                    (poisson_bootstrap_ci): map-only resampling, the
                    form that scales to streams (Chamandy et al.)
  2. testing      — Welch t², one-way ANOVA F, Mann-Whitney U with the
                    common-language effect size, Kruskal-Wallis H:
                    parametric two-group, parametric k-group,
                    nonparametric two-sample, nonparametric k-group
  3. calibration  — the NB quality score's reliability diagram, raw vs
                    the exact PAV isotonic fit (isotonic_calibration_pav)
  4. agreement    — how the three weak quality raters relate: Fleiss' κ
                    (categorical), Spearman ρ (rank-level), and the
                    binary confusion audit
  5. funnel       — absorbing-Markov analytics: P(purchase before
                    error) and expected steps per starting state

All statistics are integer/fixed-point by construction (the engine's
division-last discipline), so every figure below is reproducible at
any parallelism and hash-matches the DuckDB oracle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("statistics-tour")
    spark.sparkContext.setLogLevel("ERROR")
    q = lambda name: SPARK_QUERIES[name](spark, SF_DIR)  # noqa: E731

    print(f"== statistics tour over {SF_DIR}\n")

    ci = q("poisson_bootstrap_ci").collect()[0]
    print("1. Poisson-bootstrap CI for mean purchase value")
    print(
        f"   n={ci.n_rows}  point=${ci.point_micro / 1e8:,.2f}"
        f"  ~90% CI [${ci.lo_micro / 1e8:,.2f}, ${ci.hi_micro / 1e8:,.2f}]"
        f"  ({ci.b_reps} replicates)\n"
    )

    w = q("welch_t_value").collect()[0]
    print("2a. Welch t-test: purchase vs error values")
    print(
        f"   means ${w.mean1_micro / 1e8:,.2f} vs ${w.mean2_micro / 1e8:,.2f}"
        f"  t² = {w.t2_milli / 1000:.3f}  df = {w.df_milli / 1000:,.0f}"
    )
    a = q("anova_f_value").collect()[0]
    print(
        f"2b. One-way ANOVA across {a.k_groups} event types:"
        f"  F = {a.f_milli / 1000:.3f} over n = {a.n_rows}"
    )
    m = q("mann_whitney_u").collect()[0]
    print(
        f"2c. Mann-Whitney U: CLES = {m.cles_ppm / 1e6:.3f}"
        f"  (P(purchase value > error value)),  z² = {m.z2_milli / 1000:.3f}"
    )
    kw = q("kruskal_wallis_values").collect()[0]
    print(
        f"2d. Kruskal-Wallis across {kw.k_groups} event types:"
        f"  H = {kw.h_milli / 1000:.3f} over n = {kw.n_rows}"
        f"  (χ²₄ ref: 9.49 at α=.05)\n"
    )

    print("3. Isotonic (PAV) calibration of the NB quality score")
    print("   bin    n   raw_rate  iso_rate")
    for r in q("isotonic_calibration_pav").collect():
        bar = "#" * max(1, r.iso_ppm // 50000)
        print(
            f"   {r.bin:3d} {r.n:5d}   {r.raw_ppm / 1e6:7.3f}"
            f"   {r.iso_ppm / 1e6:7.3f}  {bar}"
        )
    print()

    k = q("fleiss_kappa_raters").collect()[0]
    s = q("model_rank_spearman").collect()[0]
    print("4. Weak-supervision rater agreement (label / NB / ridge)")
    print(
        f"   Fleiss κ = {k.kappa_ppm / 1e6:.3f}"
        f"  (P̄ = {k.pbar_ppm / 1e6:.3f}, Pe = {k.pe_ppm / 1e6:.3f})"
    )
    print(
        f"   Spearman ρ (NB vs ridge score ranks, held-out)"
        f" = {s.spearman_ppm / 1e6:.3f} over {s.n_docs} docs"
    )
    mc = q("mcnemar_raters").collect()[0]
    print(
        f"   McNemar (NB vs ridge decisions): NB-only {mc.nb_only},"
        f" ridge-only {mc.ridge_only},"
        f" χ² = {mc.mcnemar_milli / 1000:.3f}  (χ²₁ ref: 3.84)\n"
    )

    print("5. Absorbing-Markov funnel (purchase vs error as sinks)")
    for r in q("markov_absorption_funnel").collect():
        print(
            f"   from {r.state:7s}: P(purchase first) ="
            f" {r.win_ppm / 1e6:.3f},  E[steps] = {r.steps_milli / 1000:.2f}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
