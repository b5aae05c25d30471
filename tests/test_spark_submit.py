"""Live ``spark-submit --py-files`` packaging test.

North-rule evidence (BASELINE.json: "run via spark-submit --py-files on a
multi-executor cluster"): the packaged zip built by
``app.make_pyfiles_zip`` must actually run under a REAL ``spark-submit``
subprocess — not just list the right members. The job script below runs
the full quality-filter pipeline (langid + perplexity + rules + scrub +
checkpointed sink with per-partition lineage) importing the library ONLY
from the ``--py-files`` zip: cwd is a temp dir and PYTHONPATH is
scrubbed, so a successful import proves the zip is self-contained the
way a cluster submit requires.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "transcripts_oracle.parquet")

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

JOB = """\
import json
import sys

# the ONLY import path to the library is the --py-files zip
from data_quality_automated_evaluator_spark.app import main

sys.exit(main([sys.argv[1], "--quality-filter", "--master", sys.argv[2]]))
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
@pytest.mark.parametrize(
    "master",
    [
        "local[4]",
        # the north rule verbatim: spark-submit --py-files on a
        # MULTI-EXECUTOR cluster — two separate executor JVMs fetch the
        # zip from the driver's file server and their Python workers
        # import the package from it alone
        "local-cluster[2,2,1024]",
    ],
)
def test_spark_submit_pyfiles_live(tmp_path, master):
    sys.path.insert(0, REPO)
    from data_quality_automated_evaluator_spark.app import make_pyfiles_zip

    zip_path = make_pyfiles_zip(str(tmp_path / "pkg.zip"))
    job_path = tmp_path / "job.py"
    job_path.write_text(JOB)
    out_root = tmp_path / "out"
    config = {
        "source": {"file_path": FIXTURE, "file_format": "parquet"},
        "output_root": str(out_root),
        "time_interval": "1d",
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    env = dict(os.environ)
    # scrub every path back into the repo: the zip must stand alone
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_CPUS", None)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            master,
            "--driver-memory",
            "4g",
            "--py-files",
            zip_path,
            str(job_path),
            str(cfg_path),
            master,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the driver prints the run summary as its last JSON stdout line
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                summary = json.loads(line)
            except json.JSONDecodeError:
                continue
    assert summary is not None, proc.stdout[-2000:]
    assert summary["n_turns"] > 0
    assert 0 < summary["n_keep"] <= summary["n_turns"]
    assert summary["processed_partitions"] > 0

    # sink artifacts landed: scrubbed turns + per-partition lineage ledger
    assert (out_root / "turns").is_dir()
    ledger_files = list((out_root / "ledger").glob("*.json")) or list(
        out_root.rglob("ledger*")
    )
    assert ledger_files, sorted(str(p) for p in out_root.rglob("*"))[:20]
