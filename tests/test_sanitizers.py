"""Sanitizer coverage for the native layer (reference parity: the
reference's Debug build is globally ASan-instrumented, CMakeLists.txt:11).

Three layers:
- pure-C++ TSan stress over the epoll server + count fast path (all the
  lock-order / lifetime edges, no Python in the process),
- the same stress under ASan,
- the Python ctypes call sites driven against .asan.so builds with
  libasan preloaded (scripts/sanitize_drive.py).
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


def _gxx():
    return shutil.which("g++")


def _runtime(name):
    gxx = _gxx()
    if gxx is None:
        return None
    path = subprocess.run([gxx, f"-print-file-name={name}"],
                          capture_output=True, text=True).stdout.strip()
    return path if os.path.isabs(path) and os.path.exists(path) else None


@pytest.fixture(scope="module")
def stress_binaries():
    if _gxx() is None:
        pytest.skip("no C++ toolchain")
    subprocess.run(["make", "-C", NATIVE, "stress"], check=True,
                   capture_output=True, timeout=300)
    return (os.path.join(NATIVE, "http_stress_asan"),
            os.path.join(NATIVE, "http_stress_tsan"))


def _run_stress(binary, env_name, seconds="1.5"):
    proc = subprocess.run(
        [binary, seconds], capture_output=True, text=True, timeout=120,
        env={**os.environ, env_name: "halt_on_error=1:exitcode=66"},
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-4000:])
    assert "Sanitizer" not in proc.stderr, proc.stderr[-4000:]
    assert "served" in proc.stderr  # the stress actually did work


def test_http_stress_asan(stress_binaries):
    _run_stress(stress_binaries[0], "ASAN_OPTIONS")


def test_http_stress_tsan(stress_binaries):
    if _runtime("libtsan.so") is None and _runtime("libtsan.so.2") is None:
        pytest.skip("no TSan runtime")
    _run_stress(stress_binaries[1], "TSAN_OPTIONS")


def test_python_call_sites_under_asan():
    """NativeHTTPServer + NDJSON scanner + ingest scatter through their
    real ctypes wrappers, against .asan.so builds, libasan preloaded."""
    libasan = _runtime("libasan.so")
    if libasan is None:
        pytest.skip("no ASan runtime")
    subprocess.run(["make", "-C", NATIVE, "asan"], check=True,
                   capture_output=True, timeout=300)
    env = {**os.environ,
           "LD_PRELOAD": libasan,
           # Python itself "leaks" interned objects at exit — leak checking
           # would only report the interpreter, not our libraries
           "ASAN_OPTIONS": "detect_leaks=0:halt_on_error=1:exitcode=66",
           "SILO_NATIVE_SUFFIX": ".asan"}
    proc = subprocess.run(
        ["python", os.path.join(REPO, "scripts", "sanitize_drive.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-4000:])
    assert "SANITIZE_DRIVE_OK" in proc.stdout, proc.stdout[-2000:]
    assert "AddressSanitizer" not in proc.stderr, proc.stderr[-4000:]
