"""C ABI end-to-end test: compile native/test_capi.c against libnmftpu.so
and run it — a pure-C host driving the engine through the embedded
interpreter (the reference's dlopen binding model, SURVEY.md C1/C19)."""

import os
import subprocess

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE = os.path.join(_REPO, "native")
_BUILD = os.path.join(_NATIVE, "build")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


pytestmark = pytest.mark.skipif(
    not (os.path.exists(os.path.join(_BUILD, "libnmftpu.so")) or _build()),
    reason="C ABI library could not be built",
)


@pytest.mark.slow
def test_c_host_drives_engine(tmp_path):
    exe = str(tmp_path / "test_capi")
    subprocess.run(
        ["gcc", os.path.join(_NATIVE, "test_capi.c"),
         "-I", _NATIVE, "-L", _BUILD, "-lnmftpu", "-lm", "-o", exe],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = (
        _BUILD + ":" + env.get("LD_LIBRARY_PATH", "")
    )
    # embedded interpreter must land on CPU in this test environment
    env["JAX_PLATFORMS"] = "cpu"
    env["NMFTPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [exe, _REPO], capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, (
        f"rc={r.returncode}\nstdout={r.stdout}\nstderr={r.stderr[-2000:]}"
    )
    assert "C ABI OK" in r.stdout
    # the per-check stats callback fired and its nonzero return
    # cancelled the run early (reference C17/§3.2, round 5)
    assert "callback records=" in r.stdout
    import re

    m = re.search(r"callback records=(\d+).*iters=(\d+)", r.stdout)
    assert m and int(m.group(1)) >= 3 and int(m.group(2)) < 400, \
        r.stdout
