"""Native-LCS kernel cluster-shipping seam under real spark-submit
(VERDICT round-4 item 6).

The kernel docstring promises two deployment paths beyond
shared-filesystem local mode: ship the prebuilt .so via ``--files`` (no
recompile on executors) and the TWINSPECT_LCS_NATIVE=0 pure-Python
fallback. Both are exercised here through an actual spark-submit
subprocess with the package zip, a fresh XDG cache dir, and an
executor-side pandas-UDF probe (tools/submit_kernel_probe.py).
"""

import json
import os
import shutil
import subprocess

import pytest

from twinspect_spark.functions import lcs_native

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "tools", "submit_kernel_probe.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on host"
)


def _submit(tmp_path, extra_env, files=None):
    from twinspect_spark.session import package_zip

    env = dict(os.environ)
    # a FRESH per-run cache dir: if the shipped-kernel lookup failed,
    # the worker would compile here and the test would see it
    cache = str(tmp_path / "xdg_cache")
    os.makedirs(cache, exist_ok=True)
    env["XDG_CACHE_HOME"] = cache
    env.update(extra_env)
    cmd = [
        SPARK_SUBMIT, "--master", "local[2]",
        "--py-files", package_zip(),
    ]
    if files:
        cmd += ["--files", files]
    cmd.append(PROBE)
    p = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=300,
        cwd=str(tmp_path),
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("PROBE:")]
    assert lines, p.stdout[-2000:] + p.stderr[-2000:]
    recs = [json.loads(r) for r in json.loads(lines[-1][len("PROBE:"):])]
    return recs, cache


def test_files_shipped_kernel_loads_without_recompile(tmp_path):
    so = lcs_native._build()
    if so is None:
        pytest.skip("no C compiler on host")
    shipped = tmp_path / os.path.basename(so)
    shutil.copy2(so, shipped)
    recs, cache = _submit(tmp_path, {}, files=str(shipped))
    for r in recs:
        assert r["avail"] is True
        assert r["val"] == 4  # LCS("abcdefgh","xxcdefyy") = "cdef"
        # loaded the shipped copy, not a path under the fresh cache
        assert r["so"] is not None and not r["so"].startswith(cache), r
    # and nothing was compiled into the fresh cache dir
    compiled = [
        f for _, _, fs in os.walk(cache) for f in fs if f.endswith(".so")
    ]
    assert compiled == []


def test_native_disabled_fallback_under_submit(tmp_path):
    recs, _ = _submit(tmp_path, {"TWINSPECT_LCS_NATIVE": "0"})
    for r in recs:
        assert r["avail"] is False
        # lcs_len_native declines (None) and the caller's Python
        # automaton serves the value — parity is property-tested in
        # tests/test_hashing.py::TestNativeLcs
        assert r["val"] is None
