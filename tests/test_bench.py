"""Structural test of the driver benchmark ladder (bench.py).

Round 3's driver bench timed out with nothing emitted (BENCH_r03.json
rc=124) — the single most expensive failure a round can have — so the
restructured ladder's contract is pinned here: run as a real subprocess
on CPU with tiny shapes, it must emit EXACTLY one valid JSON line on
stdout (whatever happens on stderr), with the schema the driver records.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout=600):
    env = dict(
        os.environ,
        VQA_BENCH_PLATFORM="cpu",
        VQA_BENCH_BATCH="64",
        VQA_BENCH_ITERS="2",
        VQA_BENCH_REPS="2",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    env.update(env_extra)
    return subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=timeout)


def test_bench_ladder_emits_one_json_line():
    proc = _run_bench({})
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    result = json.loads(lines[0])
    assert result["metric"] == \
        "vqa_updown_batch_inference_questions_per_sec_per_chip"
    assert result["unit"] == "questions/s"
    assert result["value"] > 0
    assert result["vs_baseline"] > 0
    # the ladder must lead with the reliable rung (stderr phase log)
    assert "attempting config 'medium'" in proc.stderr


def test_bench_fast32_shaped_staging_lands():
    """The r4 driver fast32 rung OOMed HBM because the staging producer
    held two dense f32 feature temps live at once (BENCH_r04 tail);
    above the HBM guard the producer now generates the int8 feed
    directly in its final dtype (no f32 temps). Pin the B=32768-shaped
    fast-config child end-to-end on CPU with tiny model dims: the batch
    axis is exactly the driver's fast32 shape."""
    proc = _run_bench({
        "VQA_BENCH_CONFIG": "fast",
        "VQA_BENCH_BATCH": "32768",
        "VQA_BENCH_NTOKEN": "50", "VQA_BENCH_ANS": "16",
        "VQA_BENCH_OBJS": "4", "VQA_BENCH_VDIM": "16",
        "VQA_BENCH_QLEN": "3", "VQA_BENCH_EMBED": "8",
        "VQA_BENCH_HIDDEN": "16",
        "VQA_BENCH_ITERS": "1",
        # force the direct-dtype staging branch despite the tiny dims (on
        # the chip it engages by size: two dense f32 temps > the HBM limit)
        "VQA_BENCH_DENSE_LIMIT": "1",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    qps_lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("QPS ")]
    assert len(qps_lines) == 1 and float(qps_lines[0].split()[1]) > 0
    assert "on-device staging" in proc.stderr


def test_bench_overtime_quick_crash_bailout():
    """ADVICE r4 (medium): overtime must NOT respawn back-to-back when
    children die instantly without a QPS line (import/connect crash) —
    it backs off and bails after 4 consecutive quick failures instead of
    spinning for the whole overtime window. Children are poisoned with a
    negative batch size (trace-time shape error, crashes in seconds)."""
    proc = _run_bench({
        "VQA_BENCH_BATCH": "-7",          # every child dies at trace time
        "VQA_BENCH_DEADLINE_S": "40",     # rungs exhaust fast
        "VQA_BENCH_OVERTIME_S": "600",    # overtime window is open...
        "VQA_BENCH_BACKOFF_S": "1",       # ...but don't sleep real minutes
        # any failure counts as quick, however slow this machine is
        "VQA_BENCH_QUICKFAIL_S": "600",
    }, timeout=580)
    assert proc.returncode == 1           # no number is obtainable
    assert "quick-failure rounds" in proc.stderr
    assert "backing off" in proc.stderr
    # bounded: at most 4 quick-fail overtime rounds, then bail
    assert proc.stderr.count("re-rolling bounded attempts") <= 4
    # the safe config got its separate-failure-surface try each round
    assert "attempting config 'safe'" in proc.stderr
    assert "FAILED: no config produced a number" in proc.stderr


def test_bench_tiny_deadline_still_lands():
    """Even with an exhausted deadline the safe rung gets its MIN_ATTEMPT
    floor and a number is emitted — the r3 nothing-emitted failure mode
    must be impossible as long as one safe run can complete."""
    proc = _run_bench({"VQA_BENCH_DEADLINE_S": "1"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1 and json.loads(lines[0])["value"] > 0
    assert "skipping" in proc.stderr  # later rungs were correctly skipped
