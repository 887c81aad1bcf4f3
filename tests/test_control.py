"""HTTP control surface (control.py): real POSTs against a live
EtlControlServer that ingests from a live ShiftsApiServer — both ends of
the reference's deployment (api + etl services, reference
etl/app/main.py:31-67) in-process."""

import json
import urllib.error
import urllib.request

import pytest

from shifts_etl_spark.control import EtlControlServer
from shifts_etl_spark.sources.generator import generate_shift_docs
from shifts_etl_spark.sources.http_service import ShiftsApiServer


def post(url: str):
    try:
        with urllib.request.urlopen(
            urllib.request.Request(url, method="POST")
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def stack(spark, tmp_path):
    api = ShiftsApiServer(generate_shift_docs(60))
    api_url = api.start()
    ctl = EtlControlServer(spark, api_url, str(tmp_path / "out"))
    ctl_url = ctl.start()
    yield api, ctl_url, ctl
    ctl.stop()
    api.stop()


def test_run_etl_and_clear_endpoints(spark, stack):
    _, ctl_url, ctl = stack
    code, body = post(f"{ctl_url}/run-etl?batch_size=13")
    assert code == 200
    assert body["status"] == "ETL process completed successfully"
    assert body["counts"]["shifts"] == 60 and body["counts"]["kpis"] == 6

    # a re-run is a NEW batch: the staged sink appends (each run commits
    # its own batch dir, like consecutive reference runs INSERTing again)
    code, body = post(f"{ctl_url}/run-etl")
    assert code == 200 and body["counts"]["shifts"] == 120

    code, body = post(f"{ctl_url}/clear-data")
    assert code == 200 and body["status"] == "Data cleared successfully"
    import os

    assert not any(
        os.path.isdir(os.path.join(ctl.output_dir, t))
        for t in ["shifts", "breaks", "allowances", "award_interpretations", "kpis"]
    )


def test_bad_batch_size_is_400(stack):
    _, ctl_url, _ = stack
    for bad in ("0", "31", "abc"):
        code, body = post(f"{ctl_url}/run-etl?batch_size={bad}")
        assert code == 400, bad
        assert "detail" in body


def test_integrity_error_is_400_and_persists_nothing(spark, tmp_path):
    """The reference maps its processing ValueError branch to 400; the
    engine's analog is IntegrityError on a duplicate break PK — and the
    staged sink must leave zero rows behind."""
    docs = generate_shift_docs(20)
    donors = [d for d in docs if d["breaks"]]
    donors[1]["breaks"][0]["id"] = donors[0]["breaks"][0]["id"]
    api = ShiftsApiServer(docs)
    ctl = EtlControlServer(spark, api.start(), str(tmp_path / "out"))
    ctl_url = ctl.start()
    try:
        code, body = post(f"{ctl_url}/run-etl")
        assert code == 400 and "detail" in body
        import os

        assert not os.path.isdir(tmp_path / "out" / "shifts")
    finally:
        ctl.stop()
        api.stop()


def test_unknown_route_is_404(stack):
    _, ctl_url, _ = stack
    code, _ = post(f"{ctl_url}/nope")
    assert code == 404
