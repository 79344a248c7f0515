"""r6 focused tests for optimization-changed internals.

1. The vectorized embed batch kernel must be BIT-identical to corelib
   embed_name (the optimization's whole contract).
2. prefix_filter_pairs' dense (bitmask) and general (sparse intersection
   join) paths must produce identical rows — the adaptive switch must be
   invisible.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest


def test_embed_batch_bit_identical_to_embed_name():
    from medical_doc_knowledge_graph_system_spark.corelib.similarity import (
        embed_name,
    )
    from medical_doc_knowledge_graph_system_spark.operators.embed import (
        _embed_batch,
    )

    rng = random.Random(7)
    vocab = "join scan filter sort merge agg window group hash table row κλμ".split()
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(1, 200))) for _ in range(500)
    ] + ["", " ", "  ", "a", "ab", None]
    got = list(_embed_batch(pd.Series(texts)))
    want = [embed_name(t or "") for t in texts]
    assert all(a == b for a, b in zip(got, want))
    assert len(got) == len(want)


@pytest.mark.usefixtures("spark")
def test_prefix_filter_dense_and_general_paths_agree(spark):
    import medical_doc_knowledge_graph_system_spark.functions.dedup as dd

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 25)))) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run():
        return sorted(
            (r.doc_a, r.doc_b, r.n_inter, r.n_a, r.n_b, r.jaccard)
            for r in dd.prefix_filter_pairs(df, t_num=3, t_den=5).collect()
        )

    dense = run()
    old = dd.DENSE_SETS_MAX
    try:
        dd.DENSE_SETS_MAX = 0  # force the general path
        general = run()
    finally:
        dd.DENSE_SETS_MAX = old
    assert dense == general
    assert len(dense) > 0  # the fixture must actually exercise pairs
