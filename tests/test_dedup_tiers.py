"""Tier attribution (pipelines.dedup.dedup_tiers) on a hand-built
corpus exercising all four tiers; the sf oracle corpus only produces
substring/survivor rows, so the exact/near branches are pinned here."""

import pandas as pd
import pytest
import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.pipelines.dedup import dedup_tiers

def _para(seed: str) -> str:
    # each group needs its own LONG body: groups must not co-cluster,
    # and within-group edits must flip <= hamming_budget SimHash bits
    # (the engine's dup definition is hd <= p, p=3 CONSULT-faithful),
    # which needs the edit to be a tiny fraction of the shingle set
    return " ".join(f"{seed} sentence {i} token{i * 7 % 13}{seed}" for i in range(150))


def _corpus() -> pd.DataFrame:
    a = _para("alpha") + " alpha block unique tail content one"
    b = _para("beta") + " beta block with its own distinctive ending two"
    c = _para("gamma") + " gamma block closing sentence marker three"
    rows = [
        (0, a),                # survivor of the exact pair
        (1, a),                # exact duplicate of 0
        (2, b),                # proper prefix of 3 -> substring drop
        (3, b + " qq"),        # contains 2 (hd=0, texts differ)
        (4, c),                # survivor of the near pair
        (5, c.replace("three", "four")),  # near-dup of 4 (hd=2), no containment
        (6, "totally unrelated short-ish document about zebras qq " * 8),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_dedup_tiers_hand_labels(ray_session):
    out = (
        dedup_tiers(rd.from_pandas(_corpus()), PipelineConfig())
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    tiers = out["tier"].to_dict()
    assert tiers[0] == "survivor"
    assert tiers[1] == "exact"
    assert tiers[2] == "substring"
    assert tiers[3] == "survivor"
    assert tiers[4] == "survivor"
    assert tiers[5] == "near"
    assert tiers[6] == "survivor"
    # exact pair and near pair co-cluster; the unique doc is a singleton
    cl = out["cluster_id"].to_dict()
    assert cl[0] == cl[1] and cl[2] == cl[3] and cl[4] == cl[5]
    assert cl[6] not in {cl[0], cl[2], cl[4]}


def test_dedup_tiers_all_unique(ray_session):
    docs = pd.DataFrame({
        "doc_id": range(5),
        "text": [f"entirely distinct document {i} body text zz{i} " * 10
                 for i in range(5)],
    })
    out = dedup_tiers(rd.from_pandas(docs), PipelineConfig()).to_pandas()
    assert len(out) == 5
    assert set(out["tier"]) == {"survivor"}
