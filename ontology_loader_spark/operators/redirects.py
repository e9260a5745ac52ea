"""Alt-id / obsolete-term redirect map.

The reference's data model carries obsolescence (``is_obsolete``,
``ontology_processor.py:109,141-148``) and the store-side purge
(``mongodb_loader.py:19-44``); the north rule adds the redirect map:
each obsolete term resolves to a live replacement by following
``replaced_by`` chains to a fixpoint.

Chains are short (ontology curation rarely nests redirects more than a
few hops) — the loop is O(max chain length) broadcast self-joins over a
tiny table (obsolete terms only), never touching the fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redirect_map(term_dict: DataFrame, max_iterations: int = 16) -> DataFrame:
    """(src, dst): src = obsolete term id, dst = the live end of its
    ``replaced_by`` chain."""
    hops = (
        term_dict.filter(F.col("is_obsolete") & F.col("replaced_by").isNotNull())
        .select(F.col("id").alias("hop_src"), F.col("replaced_by").alias("hop_dst"))
        .localCheckpoint(eager=True)
    )
    redirect = hops.select(
        F.col("hop_src").alias("src"), F.col("hop_dst").alias("dst")
    )
    for _ in range(max_iterations):
        stepped = (
            redirect.join(hops, redirect["dst"] == hops["hop_src"], "inner")
            .select("src", F.col("hop_dst").alias("dst"))
        )
        if stepped.isEmpty():
            break
        # keep only fully-resolved ends: rows whose dst is still a
        # redirect source get replaced by the stepped row
        unresolved_src = stepped.select("src").distinct()
        redirect = (
            redirect.join(unresolved_src, "src", "left_anti")
            .unionByName(stepped)
            .localCheckpoint(eager=True)
        )
    return redirect
