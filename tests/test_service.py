"""Service-surface tests: the REST lifecycle (status machine
PENDING→RUNNING→COMPLETED/FAILED and the 400/404/409 error model,
README.md:819-837 parity) driven through the Flask app end-to-end over
a real Spark batch job on synthetic transactions."""

from __future__ import annotations

import time

import pytest

from streamandbatchprocessing_spark.service.api import create_app
from streamandbatchprocessing_spark.service.batch_job import BatchJobRunner, new_batch_id
from streamandbatchprocessing_spark.service.registry import (
    BatchJobRecord,
    BatchRegistry,
    BatchStatus,
)

from .factories import transactions_df


@pytest.fixture(scope="module")
def runner(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("batches")
    source = transactions_df(spark, 1500)
    source.cache().count()
    registry = BatchRegistry()
    yield BatchJobRunner(
        spark, registry, str(base), fmt="parquet", source_loader=lambda: source
    )
    source.unpersist()


@pytest.fixture(scope="module")
def client(runner):
    app = create_app(runner)
    app.config.update(TESTING=True)
    return app.test_client()


def _wait_done(client, batch_id, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        record = client.get(f"/batch/status/{batch_id}").get_json()
        if record["status"] in ("COMPLETED", "FAILED"):
            return record
        time.sleep(0.5)
    raise TimeoutError(batch_id)


def test_batch_run_lifecycle(client):
    resp = client.post(
        "/batch/run",
        json={
            "analysisType": "revenue_by_category",
            "startDate": "2024-03-01",
            "endDate": "2024-03-31",
            "filters": {"region": "west"},
        },
    )
    assert resp.status_code == 202
    batch_id = resp.get_json()["batchId"]
    assert batch_id.startswith("batch-")

    record = _wait_done(client, batch_id)
    assert record["status"] == "COMPLETED", record.get("error")
    assert record["row_count"] > 0

    data = client.get(f"/batch/data/{batch_id}?limit=10").get_json()
    assert data["total"] == record["row_count"]
    assert len(data["rows"]) == 10
    assert data["hasMore"] is True
    assert all(r["region"] == "west" for r in data["rows"])
    assert all(r["batch_id"] == batch_id for r in data["rows"])

    agg = client.get(f"/batch/data/{batch_id}/aggregated").get_json()
    assert agg["total"] > 0
    assert "total_revenue" in agg["rows"][0]

    listing = client.get("/batch/list").get_json()
    assert any(b["batch_id"] == batch_id for b in listing["batches"])


def test_full_report_fanout(client, runner):
    resp = client.post(
        "/batch/run",
        json={
            "analysisType": "full_report",
            "startDate": "2024-03-01",
            "endDate": "2024-03-31",
        },
    )
    batch_id = resp.get_json()["batchId"]
    record = _wait_done(client, batch_id)
    assert record["status"] == "COMPLETED", record.get("error")
    import os

    subdirs = sorted(os.listdir(runner.agg_path(batch_id)))
    assert "revenue_by_category" in subdirs
    assert len(subdirs) == 8


def test_error_model(client):
    assert client.post("/batch/run", json={"analysisType": "nope"}).status_code == 400
    assert (
        client.post(
            "/batch/run", json={"analysisType": "fraud_analysis"}
        ).status_code
        == 400
    )
    assert client.get("/batch/status/batch-00000000-dead").status_code == 404
    assert client.get("/batch/data/batch-00000000-dead").status_code == 404
    assert client.get("/health").status_code == 200


def test_negative_paging_params_are_rejected_400(client, runner):
    """Spark's in-plan offset/limit raise AnalysisException on
    negatives — the endpoint must map that to the error model's 400,
    never a generic 500."""
    done = [
        r for r in runner.registry.list_all()
        if r.status.value == "COMPLETED" and r.agg_path
    ]
    assert done, "lifecycle test should have left a COMPLETED batch"
    batch_id = done[0].batch_id
    for qs in ("offset=-1", "limit=-5"):
        resp = client.get(f"/batch/data/{batch_id}?{qs}")
        assert resp.status_code == 400
        assert resp.get_json()["error"] == "INVALID_REQUEST"


def test_list_negative_limit_returns_empty_not_tail(client):
    """records[:-n] would silently return the END of the listing."""
    resp = client.get("/batch/list?limit=-3")
    assert resp.status_code == 200
    assert resp.get_json()["batches"] == []


def test_submit_after_pool_shutdown_is_503_and_fails_record(runner):
    """A /batch/run racing /stop's pool shutdown must surface the error
    model's 503 and fail the just-registered record — never leave it
    PENDING with no thread to run it."""
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    pool.shutdown(wait=True)
    app = create_app(runner, pool=pool)
    resp = app.test_client().post(
        "/batch/run",
        json={
            "analysisType": "revenue_by_category",
            "startDate": "2024-03-01",
            "endDate": "2024-03-31",
        },
    )
    assert resp.status_code == 503
    assert resp.get_json()["error"] == "SERVICE_UNAVAILABLE"
    failed = [
        r for r in runner.registry.list_all()
        if r.error == "service shutting down; batch pool closed"
    ]
    assert len(failed) == 1
    assert failed[0].status.value == "FAILED"


def test_not_ready_conflict(client, runner):
    batch_id = new_batch_id()
    runner.registry.register(
        BatchJobRecord(
            batch_id=batch_id,
            analysis_type="revenue_by_category",
            start_date="2024-03-01",
            end_date="2024-03-31",
        )
    )
    resp = client.get(f"/batch/data/{batch_id}")
    assert resp.status_code == 409
    assert resp.get_json()["error"] == "BATCH_NOT_READY"


def test_failed_job_records_error(client, runner):
    resp = client.post(
        "/batch/run",
        json={
            "analysisType": "revenue_by_category",
            "startDate": "2024-03-01",
            "endDate": "2024-03-31",
            "filters": {"no_such_column": "x"},
        },
    )
    batch_id = resp.get_json()["batchId"]
    record = _wait_done(client, batch_id)
    assert record["status"] == "FAILED"
    assert "no_such_column" in record["error"]


def test_registry_status_machine(runner):
    registry = runner.registry
    batch_id = new_batch_id()
    registry.register(
        BatchJobRecord(
            batch_id=batch_id, analysis_type="x", start_date="a", end_date="b"
        )
    )
    registry.update(batch_id, status=BatchStatus.RUNNING)
    assert registry.get(batch_id).status is BatchStatus.RUNNING
    assert any(r.batch_id == batch_id for r in registry.list_by_status(BatchStatus.RUNNING))
    with pytest.raises(ValueError, match="duplicate"):
        registry.register(
            BatchJobRecord(
                batch_id=batch_id, analysis_type="x", start_date="a", end_date="b"
            )
        )


def test_three_concurrent_batches_during_streaming(client, runner, spark, sf_dir):
    """The reference's concurrency success criterion (AGENTS.md:1698):
    3 simultaneous batch jobs all COMPLETE while a streaming query keeps
    processing — one SparkSession, FAIR-pool thread-local scoping."""
    from streamandbatchprocessing_spark.streaming.pipeline import (
        dashboard_plan,
        events_stream,
        run_to_memory,
    )

    ids = []
    for _ in range(3):
        resp = client.post(
            "/batch/run",
            json={
                "analysisType": "revenue_by_category",
                "startDate": "2024-01-01",
                "endDate": "2024-12-31",
            },
        )
        assert resp.status_code == 202
        ids.append(resp.get_json()["batchId"])

    # streaming work overlapping the in-flight batches
    stream_result = run_to_memory(
        dashboard_plan(events_stream(spark, sf_dir)), name_prefix="conc"
    )
    assert stream_result.count() > 0

    records = [_wait_done(client, batch_id) for batch_id in ids]
    assert all(r["status"] == "COMPLETED" for r in records), records
    assert all(r["row_count"] > 0 for r in records)


def test_list_status_filter_and_validation(client):
    ok = client.get("/batch/list?status=COMPLETED")
    assert ok.status_code == 200
    assert all(
        r["status"] == "COMPLETED" for r in ok.get_json()["batches"]
    )
    bad = client.get("/batch/list?status=BOGUS")
    assert bad.status_code == 400
    assert bad.get_json()["error"] == "INVALID_REQUEST"
