"""Online admission pipeline (streaming counterpart of pipeline.curate):
blocklist scrub + quality gate + incremental exact dedup vs the cumulative
admitted sink, exactly-once per epoch via StagedWriter batch ids.
"""

from __future__ import annotations

import hashlib
import json

from shifts_etl_spark.sinks.staged import StagedWriter
from shifts_etl_spark.streaming.micro_batch import streaming_curation_admit

GOOD = (
    "the quick brown fox jumps over the lazy dog while many other common "
    "words keep the quality score of this document comfortably high today"
)
GOOD2 = (
    "another perfectly reasonable document with plenty of ordinary words "
    "and the usual stopwords that any quality heuristic should accept"
)
BOILER = "COPYRIGHT NOTICE ALL RIGHTS RESERVED FORBIDDEN TO COPY OK! " * 3


def _windows_md5(text: str, span_len: int = 40) -> list[str]:
    return sorted(
        {
            hashlib.md5(text[i : i + span_len].encode()).hexdigest()
            for i in range(len(text) - span_len + 1)
        }
    )


def _drop(input_dir, name, rows):
    with open(f"{input_dir}/{name}", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_admission_end_to_end(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    hashes = _windows_md5(BOILER + BOILER)

    def run():
        q = streaming_curation_admit(
            spark,
            input_dir,
            ckpt,
            out,
            gram_hashes=hashes,
            max_blocked_frac=0.5,
            min_quality=0.5,
        )
        q.awaitTermination()

    # epoch 1: one good doc, a junk-quality doc, a blocklisted doc, and
    # an in-batch duplicate of the good doc
    _drop(input_dir, "e1.json", [
        {"doc_id": 1, "source": "s0", "text": GOOD},
        {"doc_id": 2, "source": "s0", "text": "9" * 400},
        {"doc_id": 3, "source": "s0", "text": BOILER + BOILER},
        {"doc_id": 4, "source": "s1", "text": GOOD},
    ])
    run()
    w = StagedWriter(out)
    ids = {r.doc_id for r in w.read_table(spark, "admitted").collect()}
    assert ids == {1}

    # epoch 2: a cross-epoch duplicate of doc 1 (rejected against the
    # admitted sink) and a fresh good doc (admitted)
    _drop(input_dir, "e2.json", [
        {"doc_id": 5, "source": "s2", "text": GOOD},
        {"doc_id": 6, "source": "s2", "text": GOOD2},
    ])
    run()
    ids = {r.doc_id for r in w.read_table(spark, "admitted").collect()}
    assert ids == {1, 6}

    # restart with nothing new: checkpoint replays nothing, sink unchanged
    run()
    ids = {r.doc_id for r in w.read_table(spark, "admitted").collect()}
    assert ids == {1, 6}
    # two commits, one per epoch — replay never duplicated a batch
    assert len(w.commits()) == 2
