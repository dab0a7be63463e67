#!/usr/bin/env python
"""Build gfs_to_prometheus_spark.zip for spark-submit --py-files."""
import os, sys, zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = os.path.join(REPO, "dist", "gfs_to_prometheus_spark.zip")
os.makedirs(os.path.dirname(out), exist_ok=True)
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk(os.path.join(REPO, "gfs_to_prometheus_spark")):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
print(out)
