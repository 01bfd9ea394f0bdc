"""Record linkage: fuzzy string matching at corpus scale.

The classic entity-resolution primitive — "which of these names are
the same thing, modulo a typo" — is an edit-distance self-join, which
is O(n²·L²) done naively.  The scalable exact form for small edit
radii is SYMMETRIC-DELETE blocking (the SymSpell construction): every
string emits itself plus its single-character deletions; two strings
within Damerau-free edit distance 1 (one substitution, insertion, or
deletion) necessarily SHARE a variant:

* equal strings share the string itself,
* a substitution at position i shares the deletion-at-i variant,
* an insertion/deletion shares the shorter string itself.

So an equi-join on the variant finds every qualifying pair (no recall
loss — this is a complete cover, not an LSH gamble), and a final
``levenshtein`` verify removes false candidates (strings that share a
deletion but differ by 2 edits, e.g. "ab"/"ba" share "a"... and are
then kept or dropped by the exact check).

Scale shape: |corpus|·(L+1) variant rows, one equi-join keyed by
variant, candidate-bounded verify with JVM ``levenshtein`` — never a
cross join.  Degenerate hot variants (huge families of strings one
deletion apart — short strings over small alphabets) are the usual
skew caveat; real name/title corpora are long enough that variant
buckets stay small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: Column) -> Column:
    """The string plus each single-deletion, as an array (index 0 is
    the string itself)."""
    L = F.length(col)
    return F.transform(
        F.sequence(F.lit(0), L),
        lambda i: F.when(i == 0, col).otherwise(
            F.concat(
                F.substr(col, F.lit(1), i - 1),
                F.substr(col, i + 1, L),
            )
        ),
    )


def fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_edit: int = 1,
) -> DataFrame:
    """Pairs ``(a_id, b_id, edit_dist)`` with
    ``levenshtein(a, b) <= max_edit`` — EXACT for ``max_edit=1`` by the
    symmetric-delete cover (the only supported radius; wider radii
    need multi-deletion neighborhoods, which grow as L^k)."""
    if max_edit != 1:
        raise ValueError(
            "fuzzy_pairs implements the exact single-edit cover; "
            f"max_edit={max_edit} is not supported"
        )
    v = df.select(
        F.col(id_col).alias("_fid"),
        F.col(name_col).alias("_fname"),
        F.explode(F.array_distinct(_deletion_variants(F.col(name_col)))).alias(
            "_var"
        ),
    ).localCheckpoint(eager=False)
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._var") == F.col("b._var"))
            & (F.col("a._fid") < F.col("b._fid")),
        )
        .select(
            F.col("a._fid").alias("a_id"),
            F.col("b._fid").alias("b_id"),
            F.col("a._fname").alias("_na"),
            F.col("b._fname").alias("_nb"),
        )
        .distinct()
    )
    dist = F.levenshtein("_na", "_nb")
    return (
        cand.withColumn("edit_dist", dist.cast("long"))
        .filter(F.col("edit_dist") <= max_edit)
        .select("a_id", "b_id", "edit_dist")
    )
