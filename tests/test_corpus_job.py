"""corpus_job CLI: the tier-extraction funnel end to end — tiered
partitioned output, signal export, zero-data-page tier counts."""

from __future__ import annotations

import json
import os

import pandas as pd

import corpus_job
from tests.test_quality_ops import GOOD, HIGH_DOC


#: another ≥50-word all-distinct passing doc, sharing NO word 5-gram
#: with HIGH_DOC (different sequences) — stays "high" when HIGH_DOC is
#: the eval set.
HIGH_DOC2 = (
    "ocean the breaker a lagoon of coral and reef to shore in swell is"
    " tide it foam for surf on spray with current as wake at drift by"
    " shoal an atoll island harbor beacon sailor voyage compass rudder"
    " anchor galley cargo sextant horizon monsoon trade gull pelican"
    " dolphin whale mast keel bow stern deck cabin"
)


def test_corpus_job_writes_tiered_partitions(spark, tmp_path, capsys):
    # doc 0 is always in the bench set (0 % n == 0): eval docs
    # self-contaminate and are discarded from the training corpus
    texts = [HIGH_DOC, GOOD, GOOD, " ".join(["loop"] * 80), "tiny doc", HIGH_DOC2]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    inp = str(tmp_path / "docs.parquet")
    pdf.to_parquet(inp, index=False)
    out = str(tmp_path / "tiered")
    sig = str(tmp_path / "signals.parquet")
    rc = corpus_job.main(
        ["--input", inp, "--output", out, "--signals", sig, "--bench-mod", "9999"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 6
    assert summary["tiers"] == {"discard": 2, "high": 1, "low": 2, "medium": 1}
    assert summary["kept"] == 4 and summary["kept_frac"] == 0.6667
    # partitioned-by-tier layout: each tier is its own directory
    assert os.path.isdir(os.path.join(out, "tier=discard"))
    assert os.path.isdir(os.path.join(out, "tier=high"))
    # tier pruning works and text rides with its tier
    high = spark.read.parquet(out).filter("tier = 'high'").toPandas()
    assert list(high["doc_id"]) == [5] and high.loc[0, "text"] == HIGH_DOC2
    # signals parquet carries the per-doc columns
    sigs = pd.read_parquet(sig).set_index("doc_id").sort_index()
    assert bool(sigs.loc[2, "is_dup"]) and sigs.loc[3, "is_repetitive"]
    assert bool(sigs.loc[0, "contaminated"])  # the eval doc itself
