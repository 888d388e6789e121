"""The committed spark-submit artifact must match the source tree.

main.py ships dist/stac_to_geocore_spark.zip via --py-files (submit.sh); a
stale zip silently runs different code than the repo and its frozen oracles
(this bit round 3: the committed zip carried pre-optimization kernels and an
intermediate known_answers.py). Byte-parity here makes staleness a red test
instead of a production surprise. Fix: scripts/build_dist.sh.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "stac_to_geocore_spark.zip")
PKG = os.path.join(REPO, "stac_to_geocore_spark")


def _tree_files() -> dict[str, str]:
    out = {}
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in files:
            if fn.endswith(".pyc"):
                continue
            p = os.path.join(root, fn)
            out[os.path.relpath(p, REPO)] = p
    return out


def test_dist_zip_matches_package_tree():
    assert os.path.exists(ZIP), "dist zip missing — run scripts/build_dist.sh"
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
        zipped = set(names)
        missing = sorted(set(tree) - zipped)
        extra = sorted(zipped - set(tree))
        assert not missing, f"zip missing {missing} — run scripts/build_dist.sh"
        assert not extra, f"zip has stale entries {extra} — run scripts/build_dist.sh"
        for rel, path in sorted(tree.items()):
            with open(path, "rb") as f:
                on_disk = f.read()
            assert zf.read(rel) == on_disk, (
                f"{rel} in dist zip differs from source tree — run scripts/build_dist.sh"
            )
