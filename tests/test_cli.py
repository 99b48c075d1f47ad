"""CLI parity surface: init writes config, run drives the file-source
pipeline end-to-end, sync-from-block filters by height.

Runs in-process via cli.main() (a subprocess would spin a second JVM);
the subprocess contract itself is exercised by the driver-facing smoke
in bench/verify flows.
"""

import shutil

from near_event_streams_spark.cli import main


def _prep(tmp_path, fixture_messages_path):
    home = tmp_path / "home"
    src = tmp_path / "blocks"
    src.mkdir()
    shutil.copy(fixture_messages_path, src / "blocks.jsonl")
    assert main(["--home-dir", str(home), "init"]) == 0
    return home, src


def test_init_writes_and_refuses_overwrite(tmp_path):
    home = tmp_path / "h"
    assert main(["--home-dir", str(home), "init"]) == 0
    assert (home / "nes.toml").exists()
    assert main(["--home-dir", str(home), "init"]) == 1  # refuses


def test_run_file_to_parquet(spark, tmp_path, fixture_messages_path):
    home, src = _prep(tmp_path, fixture_messages_path)
    out = tmp_path / "out"
    rc = main(
        [
            "--home-dir", str(home),
            "run",
            "--source-dir", str(src),
            "--out-dir", str(out),
            "--timeout", "120",
            "sync-from-interruption",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(str(out))
    # 4 valid events x 2 topics (same fixture as test_streaming)
    assert got.count() == 8


def test_run_sync_from_block_filters_height(
    spark, tmp_path, fixture_messages_path
):
    home, src = _prep(tmp_path, fixture_messages_path)
    out = tmp_path / "out"
    rc = main(
        [
            "--home-dir", str(home),
            "run",
            "--source-dir", str(src),
            "--out-dir", str(out),
            "--timeout", "120",
            "sync-from-block", "--height", "1000000",
        ]
    )
    assert rc == 0
    # all fixture blocks are below height 1000000 -> nothing routed
    try:
        n = spark.read.parquet(str(out)).count()
    except Exception:
        n = 0  # no files written at all
    assert n == 0


def test_kafka_sink_argument_binding(
    tmp_path, fixture_messages_path, monkeypatch
):
    """The Kafka sink must receive (checkpoint_dir, bootstrap_servers) in
    that keyword binding — a positional swap would point the producer at
    the checkpoint path (untestable live: no broker in the container)."""
    from near_event_streams_spark.streaming import job

    home, src = _prep(tmp_path, fixture_messages_path)
    seen = {}

    def fake_start_to_kafka(messages, config, checkpoint_dir, bootstrap_servers):
        seen["checkpoint_dir"] = checkpoint_dir
        seen["bootstrap_servers"] = bootstrap_servers

        class _Q:
            def awaitTermination(self, timeout=None):
                return True

            def stop(self):
                pass

        return _Q()

    monkeypatch.setattr(job, "start_to_kafka", fake_start_to_kafka)
    rc = main(
        [
            "--home-dir", str(home),
            "run",
            "--source-dir", str(src),
            "--sink", "kafka",
            "--timeout", "1",
            "sync-from-interruption",
        ]
    )
    assert rc == 0
    assert seen["checkpoint_dir"] == str(home / "checkpoint")
    # home's nes.toml has no bootstrap.servers -> default applies
    assert seen["bootstrap_servers"] == "localhost:9092"


def test_run_requires_source_dir(tmp_path):
    home = tmp_path / "h"
    main(["--home-dir", str(home), "init"])
    rc = main(
        ["--home-dir", str(home), "run", "sync-from-latest"]
    )
    assert rc == 2


def test_scratch_dir_steady_state_is_three_dirs():
    """r13 advisory: the reap ran BEFORE appending the new dir, so the
    steady state retained 4 dirs per prefix while the docstring
    promises a 3-call grace window. Exactly 3 must survive."""
    import os

    from near_event_streams_spark.plans import _common

    kind = "reaptest"
    sfd = "/nonexistent/sf-reap-test"
    handed = [_common.scratch_dir(kind, sfd, keep_dir=True) for _ in range(6)]
    prefix = [p for p in _common._SCRATCH_DIRS if kind in p][0]
    live = _common._SCRATCH_DIRS[prefix]
    assert len(live) == 3
    assert live == handed[-3:]
    for p in handed[:3]:
        assert not os.path.exists(p), p
    for p in handed[-3:]:
        assert os.path.exists(p), p
    # cleanup
    import shutil

    for p in handed[-3:]:
        shutil.rmtree(p, ignore_errors=True)
    del _common._SCRATCH_DIRS[prefix]


def test_bench_unknown_flag_errors_fast():
    """r13 advisory: any mistyped flag (--band, --solos, --ivfpq) fell
    through to main() and silently ran the ~40-min full suite. Unknown
    args must exit non-zero immediately without touching Spark."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for argv in (["--band"], ["--solos", "q1"], ["--band-for", "q1"], ["extra"]):
        proc = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py"), *argv],
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode != 0, argv
        assert "usage:" in (proc.stderr + proc.stdout), argv


def test_bench_non_integer_count_errors_with_usage():
    """r14 advisory: `--bands q1` / `--band-for NAME x` died with a
    bare int() ValueError traceback instead of the usage message the
    strict-arg handling otherwise guarantees."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for argv in (["--bands", "q1"], ["--band-for", "q1", "nope"]):
        proc = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py"), *argv],
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode != 0, argv
        assert "usage:" in (proc.stderr + proc.stdout), argv
        assert "Traceback" not in proc.stderr, argv
