"""Wait-condition tests (ValidationWaitImplicits.scala:21-95 parity)."""

from __future__ import annotations

import http.server
import threading
import time

from data_caterer_spark.operators.waits import (
    DataExistsWaitCondition,
    FileExistsWaitCondition,
    PauseWaitCondition,
    WebhookWaitCondition,
    wait_for_all,
)


def test_pause_wait(spark):
    t0 = time.time()
    assert PauseWaitCondition(pause_in_seconds=0.3).wait(spark)
    assert time.time() - t0 >= 0.3


def test_file_exists_retries_until_created(spark, tmp_path):
    target = tmp_path / "ready.flag"
    cond = FileExistsWaitCondition(
        path=str(target), max_retries=20, wait_before_retry_seconds=0.05
    )
    threading.Timer(0.3, target.touch).start()
    assert cond.wait(spark)


def test_file_exists_gives_up(spark, tmp_path):
    cond = FileExistsWaitCondition(
        path=str(tmp_path / "never"), max_retries=2,
        wait_before_retry_seconds=0.01,
    )
    assert not cond.wait(spark)


def test_data_exists_probe(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    cond = DataExistsWaitCondition(
        fmt="parquet", path=path, expr="v > 5",
        max_retries=1, wait_before_retry_seconds=0.01,
    )
    # source missing entirely -> not ready
    assert not cond.wait(spark)
    spark.range(10).selectExpr("id AS v").write.parquet(path)
    assert cond.wait(spark)
    # present but predicate unsatisfied -> not ready
    strict = DataExistsWaitCondition(
        fmt="parquet", path=path, expr="v > 100",
        max_retries=1, wait_before_retry_seconds=0.01,
    )
    assert not strict.wait(spark)


def test_webhook_wait(spark):
    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200 if self.path == "/ok" else 503)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ok = WebhookWaitCondition(
            url=f"http://127.0.0.1:{port}/ok",
            max_retries=1, wait_before_retry_seconds=0.01,
        )
        assert ok.wait(spark)
        not_ready = WebhookWaitCondition(
            url=f"http://127.0.0.1:{port}/nope",
            max_retries=2, wait_before_retry_seconds=0.01,
        )
        assert not not_ready.wait(spark)
        # 503 accepted when listed (statusCodes contract)
        tolerant = WebhookWaitCondition(
            url=f"http://127.0.0.1:{port}/nope", status_codes=(200, 503),
            max_retries=1, wait_before_retry_seconds=0.01,
        )
        assert tolerant.wait(spark)
    finally:
        srv.shutdown()


def test_wait_for_all(spark, tmp_path):
    f = tmp_path / "x"
    f.touch()
    conds = [
        PauseWaitCondition(pause_in_seconds=0.05),
        FileExistsWaitCondition(path=str(f)),
    ]
    assert wait_for_all(conds, spark)


def test_generator_driven_count(spark):
    from data_caterer_spark.operators.generator import (
        FieldSpec,
        draw_count,
        generate,
        per_column_count,
    )

    n = draw_count(100, 200, seed=5)
    assert 100 <= n <= 200
    assert draw_count(100, 200, seed=5) == n  # deterministic
    df = generate(
        spark, [FieldSpec("x", "int", min=0, max=9, seed=1)],
        count=(100, 200), count_seed=5,
    )
    assert df.count() == n
    base = generate(spark, [FieldSpec("k", "int", min=0, max=9, seed=1)], 50)
    varied = per_column_count(base, 4, rand_seed=2, vary=True, records_min=2)
    # every source row fans out to between 2 and 4 records
    assert 100 <= varied.count() <= 200
