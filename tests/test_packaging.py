"""Deployment packaging contract (BASELINE.json: spark-submit --py-files):
the library must import and run its pure-Python corelib from a zip alone —
no repo-root-relative file access at import time — because that zip is
exactly what executors unpack-less import when the pipeline ships as
`zip -r mdkgs.zip medical_doc_knowledge_graph_system_spark/` +
`spark-submit --py-files mdkgs.zip` (scripts/run_pipeline.py header).
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "medical_doc_knowledge_graph_system_spark"


def test_package_imports_from_zip_alone(tmp_path):
    zpath = str(tmp_path / "mdkgs.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    probe = f"""
import sys
sys.path = [p for p in sys.path if not p.startswith({REPO!r})]
sys.path.insert(0, {zpath!r})
import {PKG} as m
assert m.__file__.startswith({zpath!r}), m.__file__
from {PKG}.corelib import extract, gazetteer, oracle, textproc
from {PKG}.operators import chunk, extract as sx, resolve, graph_analytics
from {PKG}.functions import sketches, textfns, curate, corpusstats
from {PKG}.streaming import incremental, stateful
from {PKG}.sources import warehouse
chunks = textproc.chunk_page("u", "Hello world. " * 100)
assert chunks, "corelib must run from inside the zip"
mentions = extract.extract_mentions("Aspirin treats migraine.")
assert mentions, "extraction must run from inside the zip"
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().endswith("OK")
