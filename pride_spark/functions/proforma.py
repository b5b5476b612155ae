"""ProForma peptidoform encoding (SURVEY §2.10 C6–C7).

Ref: ``utility/SubmissionPipelineUtils.java:307-340`` (encodePeptide /
encodePSM): interleave ``[UNIMOD:n]`` tags at modification positions —
position 0 = N-term prefix, position len+1 = C-term ``-[...]`` suffix —
then append ``/charge``.

Position-interleaving over a variable-length mod list is genuinely awkward
in pure SQL, but it IS expressible with higher-order array functions, so we
keep it JVM-side: for each residue index, concatenate the residue with the
tags of all mods anchored at that index.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def encode_peptidoform(
    sequence: Column | str,
    modifications: Column | str,
    charge: Column | str | None = None,
) -> Column:
    """Build a ProForma-ish peptidoform string from a mod array.

    ``modifications`` must be ``array<struct<position:int, accession:string,
    ...>>`` (position 0 = N-term, 1-based residues, len+1 = C-term).
    Output: ``[Nterm]-?SEQ[tags...]…(-[Cterm])?(/charge)?``.
    """
    seq, mods = _c(sequence), _c(modifications)
    # normalize to the minimal (position, accession) struct BEFORE the
    # null-fallback so any input struct shape (with/without name/mass
    # fields) type-checks against the canonical empty array
    mods = F.transform(
        mods,
        lambda x: F.struct(
            x["position"].alias("position"), x["accession"].alias("accession")
        ),
    )
    mods = F.coalesce(mods, F.array().cast("array<struct<position:int,accession:string>>"))

    def tags_at(pos: Column) -> Column:
        matching = F.filter(mods, lambda m: m["position"] == pos)
        return F.array_join(
            F.transform(matching, lambda m: F.concat(F.lit("["), m["accession"], F.lit("]"))), ""
        )

    n_term = tags_at(F.lit(0))
    c_term = tags_at(F.length(seq) + F.lit(1))
    from pride_spark.functions.strings import chars

    body = F.array_join(
        F.transform(
            chars(seq),  # 1 element per residue, no trailing empty
            lambda ch, i: F.concat(ch, tags_at(i + F.lit(1))),
        ),
        "",
    )
    out = F.concat(
        F.when(n_term != "", F.concat(n_term, F.lit("-"))).otherwise(F.lit("")),
        body,
        F.when(c_term != "", F.concat(F.lit("-"), c_term)).otherwise(F.lit("")),
    )
    if charge is not None:
        out = F.concat(out, F.lit("/"), _c(charge).cast("string"))
    return out
