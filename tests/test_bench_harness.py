"""bench.py parent-harness regression tests.

Round-2 driver artifact showed bench exiting rc=1 AFTER emitting a valid
measurement: Child.kill() closed the stderr handle and a subsequent poll()
called seek() on the closed file (BENCH_r02.json tail).  The contract is
"exit 0 iff at least one stage produced a measurement" — these tests pin the
kill→poll sequence and the JSON line shape without touching a device.
"""

import json
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import bench  # noqa: E402


def _fake_child(tmp_path, cmd):
    c = bench.Child.__new__(bench.Child)
    c.stage = c.name = "fake"
    c.err = open(tmp_path / "err", "w+")
    c.proc = subprocess.Popen(
        [sys.executable, "-c", cmd], stdout=subprocess.PIPE, text=True,
        stderr=c.err)
    c.result = None
    c.done = False
    return c


def test_child_kill_then_poll(tmp_path):
    # the r2 crash: kill() closes err, then the final poll() seeks it
    c = _fake_child(tmp_path, "import time; time.sleep(60)")
    c.kill()
    c.poll()  # must not raise on the closed handle
    assert c.done and c.result is None


def test_child_normal_result(tmp_path):
    c = _fake_child(
        tmp_path,
        "print('RESULT ' + '{\"stage\": \"fake\", \"sec\": 0.5, \"n\": 128}')")
    c.proc.wait()
    c.poll()
    c.kill()  # idempotent after completion
    assert c.result == {"stage": "fake", "sec": 0.5, "n": 128}


def test_emit_line_shape(capsys):
    bench.emit({"sec": 0.0128, "backend": "tpu"},
               extra={"prove_s": 0.7}, n=128)
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == "bn254_pairings_aggregated_per_sec_n128"
    assert line["unit"] == "pairings/s"
    assert abs(line["value"] - 10000.0) < 1
    assert line["prove_s"] == 0.7
    assert line["vs_baseline"] > 11000
