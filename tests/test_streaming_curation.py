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


def test_pii_bearing_boilerplate_is_blocked(spark, tmp_path):
    """Blocklist matching must run on RAW text: boilerplate containing an
    email would hash differently after the PII scrub and slip through if
    matching ran post-scrub."""
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    pii_boiler = (
        "FOR PERMISSIONS CONTACT legal@example.com ALL RIGHTS RESERVED "
        "AND FORBIDDEN TO REPRODUCE WITHOUT WRITTEN CONSENT TODAY OK "
    ) * 2
    hashes = _windows_md5(pii_boiler)
    _drop(input_dir, "e1.json", [
        {"doc_id": 1, "source": "s0", "text": pii_boiler},
        {"doc_id": 2, "source": "s0", "text": GOOD},
    ])
    q = streaming_curation_admit(
        spark, input_dir, tmp_path / "ckpt", tmp_path / "out",
        gram_hashes=hashes, max_blocked_frac=0.5,
    )
    q.awaitTermination()
    ids = {
        r.doc_id
        for r in StagedWriter(tmp_path / "out")
        .read_table(spark, "admitted")
        .collect()
    }
    assert ids == {2}


def test_fresh_checkpoint_does_not_swallow_epochs(spark, tmp_path):
    """A new checkpoint restarts epoch numbering at 0; its batches must
    land in the existing output dir rather than being skipped as replays
    of the first stream's epoch 0."""
    out = tmp_path / "out"
    in1 = tmp_path / "in1"
    in1.mkdir()
    _drop(in1, "e1.json", [{"doc_id": 1, "source": "s0", "text": GOOD}])
    q = streaming_curation_admit(spark, in1, tmp_path / "ckpt1", out)
    q.awaitTermination()

    in2 = tmp_path / "in2"
    in2.mkdir()
    _drop(in2, "e1.json", [{"doc_id": 2, "source": "s1", "text": GOOD2}])
    q = streaming_curation_admit(spark, in2, tmp_path / "ckpt2", out)
    q.awaitTermination()

    w = StagedWriter(out)
    ids = {r.doc_id for r in w.read_table(spark, "admitted").collect()}
    assert ids == {1, 2}
    assert len(w.commits()) == 2  # one commit per stream, none swallowed
