"""The committed spark-submit bundle must match the source tree.

A stale dist/origami_spark.zip ships outdated extraction rules that
silently diverge from the golden-tested source; this test fails until
`python jobs/make_bundle.py` is re-run after any package change.
No Spark needed — pure zip/file comparison.
"""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLE = os.path.join(ROOT, "dist", "origami_spark.zip")

sys.path.insert(0, os.path.join(ROOT, "jobs"))


def _source_files() -> dict:
    out = {}
    pkg = os.path.join(ROOT, "origami_spark")
    for dirpath, _dirs, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                with open(full, "rb") as fh:
                    out[os.path.relpath(full, ROOT)] = fh.read()
    return out


def test_bundle_matches_source_tree():
    assert os.path.exists(BUNDLE), (
        "dist/origami_spark.zip missing — run `python jobs/make_bundle.py`"
    )
    src = _source_files()
    with zipfile.ZipFile(BUNDLE) as z:
        names = set(z.namelist())
        assert names == set(src), (
            "bundle file set differs from source tree — rebuild via "
            f"`python jobs/make_bundle.py`; only-in-zip={sorted(names - set(src))} "
            f"only-in-src={sorted(set(src) - names)}"
        )
        for name, want in src.items():
            assert z.read(name) == want, (
                f"{name} is stale in dist/origami_spark.zip — rebuild via "
                "`python jobs/make_bundle.py`"
            )
