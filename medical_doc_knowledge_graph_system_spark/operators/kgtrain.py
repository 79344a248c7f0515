"""KG-embedding training-data preparation: deterministic filtered negative
sampling over a triple set (the TransE/DistMult/RotatE corrupt-tail recipe,
Bordes et al. 2013 §3 "corrupted triplets", with the Bernoulli 'filtered'
setting of Wang et al. 2014 — negatives that happen to be TRUE triples are
removed rather than scored as false).

Reference scope: the reference materializes a Neo4j graph for RAG
(`app/graph/graph_builder.py`); training-set preparation for KG-embedding
models is the canonical downstream consumer of that graph at web scale,
and needs to run INSIDE the engine (the negative pool is the full entity
vocabulary and the filter is an anti-join against the full triple set —
both cluster-resident).

Scale shape:
- the entity dimension (distinct nodes with dense ids) is VOCABULARY-sized
  — gazetteer-bounded here, dictionary-bounded in any entity-linked KG —
  so its global row_number window and its broadcast are both bounded
  regardless of corpus size;
- candidate generation is a pure column expression per (triple, k): the
  md5-derived index depends only on the triple key and k, never on
  partitioning, cluster size or input order (the property a rand()-based
  sampler does NOT have — and what makes the op oracle-able);
- the 'filtered' step is ONE anti-join on (subj, pred, neg_obj) against
  the true-triple set: broadcast when the triple set fits (statistics
  decide), shuffle otherwise. Nothing else shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def negative_samples(
    triples: DataFrame, k: int = 5, subj="subj", pred="pred", obj="obj"
) -> DataFrame:
    """(subj, pred, obj, neg_k, neg_obj): k deterministic corrupt-tail
    negatives per true triple, filtered.

    The candidate tail for (t, i) is the entity whose dense id equals
    md5(subj|pred|obj|i) % n_entities (dense ids = row_number over the
    name-sorted distinct node set — vocabulary-sized, see module doc).
    A candidate is dropped when it equals the triple's own subject or
    tail, or when (subj, pred, candidate) is itself a true triple
    (the standard 'filtered' setting) — so surviving rows are guaranteed
    genuinely-false training negatives.
    """
    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    ).localCheckpoint()  # referenced 3x (base, entity dim, filter) — Catalyst
    # gives zero exchange reuse across self-join branches, so an unpinned
    # frame would re-run the whole upstream lineage per reference

    ents = (
        t.select(F.col("subj").alias("name"))
        .union(t.select("obj"))
        .distinct()
        # vocabulary-sized frame: the single-partition window is bounded by
        # the entity dictionary, not the corpus (same documented bound as
        # the name-map / global-rank offset frames)
        .withColumn(
            "ent_id", F.row_number().over(Window.orderBy("name")) - F.lit(1)
        )
    )
    n_ents = ents.groupBy().agg(F.count(F.lit(1)).alias("n_ents"))

    cand = (
        t.crossJoin(F.broadcast(n_ents))
        .select(
            "subj",
            "pred",
            "obj",
            F.explode(F.array(*[F.lit(i).cast("long") for i in range(k)])).alias(
                "neg_k"
            ),
            F.col("n_ents"),
        )
        .withColumn(
            "ent_id",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", "subj", "pred", "obj", F.col("neg_k").cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % F.col("n_ents"),
        )
        .join(F.broadcast(ents), "ent_id")
        .select("subj", "pred", "obj", "neg_k", F.col("name").alias("neg_obj"))
        .where((F.col("neg_obj") != F.col("obj")) & (F.col("neg_obj") != F.col("subj")))
    )
    true_keys = t.select(
        F.col("subj").alias("tk_s"), F.col("pred").alias("tk_p"), F.col("obj").alias("tk_o")
    )
    return cand.join(
        true_keys,
        (cand.subj == true_keys.tk_s)
        & (cand.pred == true_keys.tk_p)
        & (cand.neg_obj == true_keys.tk_o),
        "left_anti",
    )
