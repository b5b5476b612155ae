"""Mass / cleavage scalar functions (SURVEY §2.10 C11–C12).

Both stay JVM-side: the theoretical-mass sum is an ``aggregate`` over the
residue array against a broadcast-folded literal mass map, and missed
cleavages is a regexp count — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Monoisotopic residue masses (public CODATA/Unimod values, as used by the
#: reference's MoleculeUtilities at PrideAnalysisAssayService.java:646-652).
MONOISOTOPIC_MASS = {
    "G": 57.02146, "A": 71.03711, "S": 87.03203, "P": 97.05276,
    "V": 99.06841, "T": 101.04768, "C": 103.00919, "L": 113.08406,
    "I": 113.08406, "N": 114.04293, "D": 115.02694, "Q": 128.05858,
    "K": 128.09496, "E": 129.04259, "M": 131.04049, "H": 137.05891,
    "F": 147.06841, "R": 156.10111, "Y": 163.06333, "W": 186.07931,
}
WATER_MONO = 18.010565
PROTON_MONO = 1.007276

#: Integer micro-Dalton residue masses: the per-residue sum is folded in
#: exact long arithmetic (order-independent, bit-identical across engines),
#: divided back to Daltons once at the end.
MONO_MICRO = {aa: int(round(m * 1e6)) for aa, m in MONOISOTOPIC_MASS.items()}
WATER_MICRO = int(round(WATER_MONO * 1e6))


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _residue_micro(ch: Column) -> Column:
    """Map one residue character to its micro-Dalton mass (0 if unknown)."""
    expr: Column = F.lit(0).cast("long")
    for aa, m in MONO_MICRO.items():
        expr = F.when(ch == aa, F.lit(m).cast("long")).otherwise(expr)
    return expr


def theoretical_mass(sequence: Column | str, mod_mass_sum: Column | str | None = None) -> Column:
    """Theoretical neutral monoisotopic peptide mass: Σ residues + mods + water.

    Integer micro-Dalton accumulation keeps the fold exact regardless of
    summation order (float folds differ in the last ulp between engines).
    """
    from pride_spark.functions.strings import chars

    seq = _c(sequence)
    micro = F.aggregate(
        chars(seq),
        F.lit(0).cast("long"),
        lambda acc, ch: acc + _residue_micro(ch),
    ) + F.lit(WATER_MICRO).cast("long")
    total = micro / F.lit(1000000.0)
    if mod_mass_sum is not None:
        total = total + F.coalesce(_c(mod_mass_sum), F.lit(0.0))
    return total


def delta_mz(
    observed_mz: Column | str,
    charge: Column | str,
    sequence: Column | str,
    mod_mass_sum: Column | str | None = None,
) -> Column:
    """C11 — |observed m/z − theoretical m/z| for a PSM.

    Ref: PrideAnalysisAssayService.java:646-652 (calculateDeltaMz);
    validation buckets at :646-660 (>10 hard error, >0.9 counted) are
    applied by :func:`pride_spark.operators.filters.delta_mass_validation`.
    """
    z = _c(charge).cast("double")
    theo_mz = (theoretical_mass(sequence, mod_mass_sum) + z * F.lit(PROTON_MONO)) / z
    return F.abs(_c(observed_mz) - theo_mz)


def missed_cleavages(sequence: Column | str) -> Column:
    """C12 — count K/R residues not followed by P (trypsin rule).

    Ref: PrideAnalysisAssayService.java:702-705 (recomputed when the search
    engine reports −1).  Uses a JVM regexp count, not a UDF.
    """
    seq = _c(sequence)
    # Trailing K/R is the cleavage site itself, not a missed cleavage.
    inner = F.regexp_replace(seq, "[KR]$", "")
    return F.regexp_count(inner, F.lit("[KR](?!P)"))
